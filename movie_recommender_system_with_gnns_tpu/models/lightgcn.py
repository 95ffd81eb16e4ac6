"""Functional LightGCN: explicit parameter pytree + pure propagation functions.

Capability parity with reference ``models/light_gcn.py`` (LightGCN nn.Module,
:13-64), redesigned as idiomatic JAX:

  * parameters are one NamedTuple ``(user_emb, item_emb)`` — init N(0, 0.01²)
    (light_gcn.py:25-26); no module state, so jit/grad/shard_map compose freely.
  * :func:`propagate` = K parameterless graph convolutions over the provided
    adjacency + layer-averaged readout. ``readout='reference'`` keeps the
    reference's double 1/(K+1) factor (light_gcn.py:36 applies 1/(K+1) ON TOP of
    a mean that already divides by K+1 — a faithful quirk); ``'standard'`` is the
    LightGCN-paper plain mean.
  * :func:`get_embeddings` returns **layer-0 table rows** (light_gcn.py:42-64) —
    serving scores are dot products of raw trained tables, NOT propagated
    embeddings (SURVEY §3.2); we preserve that contract.

The propagation backend is pluggable: any ``spmm(graph, emb) -> emb`` callable
(segment-sum COO, gathered ELL, or the Pallas kernel).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LightGCNParams(NamedTuple):
    user_emb: jax.Array   # (num_users, d)
    item_emb: jax.Array   # (num_items, d)


def init_params(
    key: jax.Array,
    num_users: int,
    num_items: int,
    dim: int = 64,
    init_std: float = 0.01,
    dtype=jnp.float32,
) -> LightGCNParams:
    """N(0, init_std²) init for both tables (light_gcn.py:25-26)."""
    ku, ki = jax.random.split(key)
    return LightGCNParams(
        user_emb=(jax.random.normal(ku, (num_users, dim)) * init_std).astype(dtype),
        item_emb=(jax.random.normal(ki, (num_items, dim)) * init_std).astype(dtype),
    )


def propagate(
    params: LightGCNParams,
    graph,
    spmm: Callable[[object, jax.Array], jax.Array],
    num_layers: int = 3,
    readout: str = "reference",
    compute_dtype=None,
) -> Tuple[jax.Array, jax.Array]:
    """K-layer LightGCN propagation + layer-averaged readout.

    Mirrors ``LightGCN.forward`` (light_gcn.py:28-40): concat tables, K× Â·emb,
    average the K+1 layer outputs, split back into user/item halves.
    """
    num_users = params.user_emb.shape[0]
    emb = jnp.concatenate([params.user_emb, params.item_emb], axis=0)
    if compute_dtype is not None:
        emb = emb.astype(compute_dtype)
    acc = emb
    cur = emb
    for _ in range(num_layers):
        cur = spmm(graph, cur)
        acc = acc + cur
    final = acc / jnp.asarray(num_layers + 1, acc.dtype)
    if readout == "reference":
        # light_gcn.py:36 — extra 1/(K+1) on top of the mean (faithful quirk)
        final = final / jnp.asarray(num_layers + 1, acc.dtype)
    elif readout != "standard":
        raise ValueError(f"unknown readout {readout!r}")
    final = final.astype(params.user_emb.dtype)
    return final[:num_users], final[num_users:]


def get_embeddings(
    params: LightGCNParams,
    user_indices: Optional[jax.Array] = None,
    item_indices: Optional[jax.Array] = None,
):
    """Layer-0 table rows for the given indices (light_gcn.py:42-64).

    Returns (user_rows | None, item_rows | None); warns via return of (None,
    None) when neither index set is given, matching the reference contract.
    """
    u = params.user_emb[user_indices] if user_indices is not None else None
    i = params.item_emb[item_indices] if item_indices is not None else None
    if u is None and i is None:
        import warnings

        warnings.warn("Both indices not provided", UserWarning)
    return u, i
