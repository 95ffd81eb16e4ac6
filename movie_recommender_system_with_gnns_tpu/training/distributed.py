"""Distributed training driver: multi-epoch loop over the mesh-sharded trainer.

Glues parallel/sharding.py's shard_map step into the same driver contract as
``training.train.train_model`` (histories, best-checkpoint callback, eval) so a
user moves from one chip to a pod slice by setting ``MeshConfig`` — no other
code changes. Regime: full-graph steps with row-sharded tables (BASELINE.json
milestone configs 3-4); every epoch is one pass over all train edges with fresh
negatives, matching the reference's semantics when ``num_clusters == 1``.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models.lightgcn import LightGCNParams, init_params
from ..ops.sampling import TripletBatch, sample_negative, triplets_from_edges
from ..parallel.mesh import distributed_init, make_mesh
from ..parallel.sharding import (
    ShardPlan, make_sharded_train_step, pad_batch, pad_params, shard_graph,
    unpad_params,
)
from .train import make_eval_step


def train_model_sharded(
    cfg: Config,
    num_users: int,
    num_items: int,
    train_edges: np.ndarray,
    val: Tuple,
    test: Tuple,
    mesh=None,
    save_checkpoint: Optional[Callable] = None,
    metrics_logger=None,
) -> Tuple[LightGCNParams, Dict[str, List[float]]]:
    """Multi-epoch sharded training; returns UNPADDED params + histories."""
    if mesh is None:
        # Multi-host bring-up must happen before the mesh enumerates devices:
        # jax.distributed.initialize() is what makes jax.devices() global. A
        # no-op single-process / when the caller already built a mesh.
        distributed_init()
        mesh = make_mesh(cfg.mesh.data_parallel, cfg.mesh.model_parallel)
    pm = mesh.shape["model"]
    pd = mesh.shape["data"]
    plan = ShardPlan.create(num_users, num_items, pm)

    key = jax.random.PRNGKey(cfg.train.seed)
    params = pad_params(
        init_params(key, num_users, num_items, cfg.model.dim, cfg.model.init_std),
        plan)
    adam = optax.adam(cfg.train.lr, b1=cfg.train.adam_b1, b2=cfg.train.adam_b2,
                      eps=cfg.train.adam_eps)
    state = (params, adam.init(params), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(cfg, mesh, plan, opt=adam)(state)

    graph = shard_graph(train_edges, plan)
    all_triplets = triplets_from_edges(train_edges, num_users)
    true_b = int(np.sum(np.asarray(all_triplets.mask)))
    bs = cfg.train.batch_size
    if bs is None or bs >= true_b:
        batch = pad_batch(all_triplets, pd)
        steps_per_epoch = 1
        sample_batch = None
    else:
        bs = (bs // pd) * pd or pd
        steps_per_epoch = max(1, true_b // bs)
        users_all = all_triplets.user[:true_b]
        pos_all = all_triplets.pos_item[:true_b]

        @jax.jit
        def sample_batch(k):
            idx = jax.random.randint(k, (bs,), 0, true_b)
            return TripletBatch(users_all[idx], pos_all[idx],
                                jnp.ones((bs,), bool))

    eval_step = make_eval_step(cfg)

    hist: Dict[str, List[float]] = {"train_loss": [], "val_loss": [],
                                    "val_recall": [], "epoch_time_s": []}
    best_recall = 0.0
    key = jax.random.PRNGKey(cfg.train.seed + 1)
    for epoch in range(cfg.train.epochs):
        key, vk = jax.random.split(key)
        t0 = time.perf_counter()
        losses = []
        for s in range(steps_per_epoch):
            key, nk, bk = jax.random.split(key, 3)
            if sample_batch is not None:
                b = sample_batch(bk)
            else:
                b = batch
            neg = sample_negative(nk, b.user.shape[0], num_items,
                                  cfg.train.num_negatives)
            state, loss = step(state, graph, b, neg)
            losses.append(loss)
        train_loss = float(jnp.mean(jnp.stack(losses)))
        up = unpad_params(state[0], plan)
        val_loss, val_recall = eval_step(up, val[0], val[1], vk)
        val_loss, val_recall = float(val_loss), float(val_recall)
        dt = time.perf_counter() - t0
        hist["train_loss"].append(train_loss)
        hist["val_loss"].append(val_loss)
        hist["val_recall"].append(val_recall)
        hist["epoch_time_s"].append(dt)
        print(f"[sharded {pd}x{pm}] Epoch: {epoch:03d}, Train Loss: "
              f"{train_loss:.4f}, Val Loss: {val_loss:.4f}, "
              f"Recall@k: {val_recall:.6f} ({dt:.2f}s)")
        if metrics_logger is not None:
            metrics_logger.log(epoch, train_loss=train_loss, val_loss=val_loss,
                               val_recall=val_recall, epoch_time_s=dt)
        if val_recall > best_recall:
            best_recall = val_recall
            if save_checkpoint is not None:
                save_checkpoint(up, val_recall)

    key, tk = jax.random.split(key)
    up = unpad_params(state[0], plan)
    test_loss, test_recall = eval_step(up, test[0], test[1], tk)
    print(f"[sharded] Test Loss: {float(test_loss):.4f}, "
          f"Recall@k: {float(test_recall):.6f}")
    hist["test_loss"] = [float(test_loss)]
    hist["test_recall"] = [float(test_recall)]
    return up, hist
