"""Full-ranking evaluation: standard Recall@k / NDCG@k over the whole catalog.

The reference only reports its Monte-Carlo sampled recall with an
all-positives denominator (utils/train_test.py:165-212; values ~1.6e-4 — kept
for parity in ops/metrics.py). The BASELINE.json north star asks for standard
recall@10/NDCG@10: rank ALL items per user, exclude train-seen interactions,
score the held-out edges. This module does that with the blocked MIPS kernel in
user batches so the (U, I) score matrix never materializes.

Scoring uses layer-0 tables (the reference's serving contract, SURVEY §3.2) by
default; propagated final embeddings are available via ``use_propagated=True``
(the LightGCN-paper protocol).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.lightgcn import LightGCNParams, propagate
from ..ops.bpr import normalize_embedding
from ..ops.spmm import DeviceCOO, spmm_segment


def _np_group_by_user(edges: np.ndarray, num_users: int) -> Tuple[np.ndarray, np.ndarray]:
    """CSR-ish (indptr, items) of user→item lists from an undirected edge set."""
    head, tail = edges[0], edges[1]
    fwd = (head < num_users) & (tail >= num_users)
    u = head[fwd].astype(np.int64)
    it = (tail[fwd] - num_users).astype(np.int64)
    order = np.argsort(u, kind="stable")
    u, it = u[order], it[order]
    counts = np.bincount(u, minlength=num_users)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    return indptr, it


def evaluate_full_ranking(
    params: LightGCNParams,
    train_edges: np.ndarray,
    eval_edges: np.ndarray,
    num_users: int,
    k: int = 10,
    batch_users: int = 1024,
    use_propagated: bool = False,
    cfg: Optional[Config] = None,
    max_users: Optional[int] = None,
) -> Tuple[float, float]:
    """Standard Recall@k and NDCG@k over users with ≥1 held-out edge."""
    num_items = params.item_emb.shape[0]
    if use_propagated:
        if cfg is None:
            raise ValueError("use_propagated=True requires cfg")
        n = num_users + num_items
        from ..data.graph import COOGraph

        graph = DeviceCOO.from_host(COOGraph.build(train_edges, n))
        user_table, item_table = propagate(
            params, graph, spmm_segment, cfg.model.num_layers, cfg.model.readout)
    else:
        user_table, item_table = params.user_emb, params.item_emb

    tr_ptr, tr_items = _np_group_by_user(train_edges, num_users)
    ev_ptr, ev_items = _np_group_by_user(eval_edges, num_users)

    eval_users = np.flatnonzero(np.diff(ev_ptr) > 0)
    if max_users is not None and eval_users.size > max_users:
        eval_users = eval_users[:max_users]

    item_table_n = normalize_embedding(item_table)

    total_recall, total_ndcg, total_cnt = 0.0, 0.0, 0
    discounts = 1.0 / np.log2(np.arange(2, k + 2))
    cumdisc = np.concatenate([[0.0], np.cumsum(discounts)])

    @partial(jax.jit, static_argnames=())
    def score_topk(rows, seen):
        q = normalize_embedding(rows)
        s = q @ item_table_n.T
        s = jnp.where(seen, -1e30, s)
        return jax.lax.top_k(s, k)

    for s in range(0, eval_users.size, batch_users):
        batch = eval_users[s: s + batch_users]
        b = batch.size
        if b < batch_users:  # pad to static shape
            batch = np.concatenate([batch, np.repeat(batch[-1:], batch_users - b)])
        rows = user_table[jnp.asarray(batch)]
        seen = np.zeros((batch_users, num_items), bool)
        rel = np.zeros((batch_users, num_items), bool)
        for r, uid in enumerate(batch):
            seen[r, tr_items[tr_ptr[uid]:tr_ptr[uid + 1]]] = True
            rel[r, ev_items[ev_ptr[uid]:ev_ptr[uid + 1]]] = True
        _, topk = score_topk(rows, jnp.asarray(seen))
        topk = np.asarray(topk)[:b]
        hits = np.take_along_axis(rel[:b], topk, axis=1)
        num_rel = rel[:b].sum(axis=1)
        recall = hits.sum(axis=1) / np.maximum(num_rel, 1)
        dcg = (hits * discounts[None, :]).sum(axis=1)
        idcg = cumdisc[np.minimum(num_rel, k)]
        ndcg = dcg / np.maximum(idcg, 1e-12)
        total_recall += recall.sum()
        total_ndcg += ndcg.sum()
        total_cnt += b
    if total_cnt == 0:
        return 0.0, 0.0
    return float(total_recall / total_cnt), float(total_ndcg / total_cnt)
