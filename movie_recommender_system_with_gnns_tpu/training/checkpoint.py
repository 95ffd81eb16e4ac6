"""Checkpoint / resume: best-model saving, split-index persistence, full-state resume.

Reference mechanisms replicated (SURVEY §5 checkpoint row):
  1. best-val-recall model checkpoint (train_test.py:249-251) — here an .npz of
     the two embedding tables + config/metadata JSON;
  2. resume-if-exists before training and at serve time (train_test.py:279-280,
     recommend.py:131-132) — :func:`load_params_if_exists`;
  3. split-index persistence lives in ``data.movielens.split_edges``.

Beyond the reference: :func:`save_train_state` / :func:`load_train_state` persist
the FULL training state (params + Adam moments + step) so training resumes
bit-exactly, not just from the tables.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lightgcn import LightGCNParams


def save_params(path: str, params: LightGCNParams, meta: Optional[dict] = None) -> None:
    arrs = {
        "user_emb": np.asarray(params.user_emb),
        "item_emb": np.asarray(params.item_emb),
    }
    if meta is not None:
        arrs["_meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def load_params(path: str) -> Tuple[LightGCNParams, dict]:
    with np.load(path) as z:
        params = LightGCNParams(
            user_emb=jnp.asarray(z["user_emb"]),
            item_emb=jnp.asarray(z["item_emb"]),
        )
        meta = {}
        if "_meta" in z:
            meta = json.loads(bytes(z["_meta"]).decode())
    return params, meta


def load_params_if_exists(path: str, params: LightGCNParams) -> LightGCNParams:
    """Resume-if-exists (train_test.py:279-280): returns loaded params when the
    checkpoint exists AND matches shapes, else the given fresh params."""
    if not os.path.exists(path):
        return params
    loaded, _ = load_params(path)
    if (loaded.user_emb.shape != params.user_emb.shape
            or loaded.item_emb.shape != params.item_emb.shape):
        print(f"checkpoint {path} shape mismatch; starting fresh")
        return params
    print(f"resumed parameters from {path}")
    return loaded


# ---------------------------------------------------------------------------
# Orbax backend (production checkpointing: atomic, versioned, async-capable)
# ---------------------------------------------------------------------------


def save_params_orbax(directory: str, params: LightGCNParams, step: int = 0) -> None:
    """Orbax-backed checkpoint (atomic + versioned); .npz remains the default
    lightweight backend. Both are round-trip tested."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.CheckpointManager(path) as mngr:
        mngr.save(step, args=ocp.args.StandardSave({"user_emb": params.user_emb,
                                                    "item_emb": params.item_emb}))
        mngr.wait_until_finished()


def load_params_orbax(directory: str, step: Optional[int] = None) -> LightGCNParams:
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.CheckpointManager(path) as mngr:
        if step is None:
            step = mngr.latest_step()
        restored = mngr.restore(step)
    return LightGCNParams(jnp.asarray(restored["user_emb"]),
                          jnp.asarray(restored["item_emb"]))


def save_train_state(path: str, state, meta: Optional[dict] = None) -> None:
    """Full-state checkpoint: params + optimizer moments + step counter."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrs["_meta"] = np.frombuffer(
        json.dumps({"num_leaves": len(leaves), **(meta or {})}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def load_train_state(path: str, state_like):
    """Restore a full train state into the structure of ``state_like``."""
    leaves, treedef = jax.tree_util.tree_flatten(state_like)
    with np.load(path) as z:
        new_leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_state_meta(path: str) -> dict:
    """The meta dict stored next to a full-state checkpoint (e.g. the epoch it
    was taken after — the resume point for :mod:`training.recovery`)."""
    with np.load(path) as z:
        return json.loads(bytes(z["_meta"]).decode())
