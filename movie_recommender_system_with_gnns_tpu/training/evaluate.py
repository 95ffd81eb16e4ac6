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
from ..models.lightgcn import LightGCNParams
from ..ops.bpr import normalize_embedding


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
    normalize: bool = True,
    sample_seed: int = 0,
    mesh=None,
) -> Tuple[float, float]:
    """Standard Recall@k and NDCG@k over users with ≥1 held-out edge.

    ``normalize=True`` ranks by cosine (the reference's serving contract);
    pass False to rank by raw inner products — the score a ``loss="standard"``
    model optimizes, and the LightGCN-paper protocol for propagated tables
    (norms carry popularity signal that cosine discards). ``max_users`` takes
    a seeded uniform SAMPLE of eval users (not the first N, which would bias
    toward low/most-active ids).

    With ``mesh`` (round-1 verdict item 7), both the propagation (if
    ``use_propagated``) and the per-batch catalog scoring run sharded: the
    item catalog is row-sharded over ALL mesh devices, each device scores +
    top-k's its shard, and candidates merge via :func:`ops.topk.merge_topk` —
    the retrieval pattern of :func:`parallel.sharding.make_sharded_mips`
    extended with the train-seen exclusion mask (sharded along items).

    Wall-clock breakdown (host mask build vs device scoring — the mask build
    is the known eval bottleneck at full 162K-user scale) is exposed as
    ``evaluate_full_ranking.last_timings`` after each call.
    """
    import time as _time

    t_start = _time.perf_counter()
    num_items = params.item_emb.shape[0]
    if use_propagated:
        if cfg is None:
            raise ValueError("use_propagated=True requires cfg")
        from ..serving.recommend import compute_serving_tables

        tables = compute_serving_tables(params, train_edges, cfg,
                                        mode="propagated", mesh=mesh)
        user_table, item_table = tables.user_emb, tables.item_emb
    else:
        user_table, item_table = params.user_emb, params.item_emb

    tr_ptr, tr_items = _np_group_by_user(train_edges, num_users)
    ev_ptr, ev_items = _np_group_by_user(eval_edges, num_users)

    eval_users = np.flatnonzero(np.diff(ev_ptr) > 0)
    if max_users is not None and eval_users.size > max_users:
        rng = np.random.default_rng(sample_seed)
        eval_users = np.sort(rng.choice(eval_users, size=max_users,
                                        replace=False))

    item_table_n = normalize_embedding(item_table) if normalize else item_table

    total_recall, total_ndcg, total_cnt = 0.0, 0.0, 0
    discounts = 1.0 / np.log2(np.arange(2, k + 2))
    cumdisc = np.concatenate([[0.0], np.cumsum(discounts)])

    items_pad = 0
    if mesh is None:
        @partial(jax.jit, static_argnames=("npairs",))
        def score_topk(rows, prows, pcols, *, npairs):
            # seen mask built ON DEVICE from (row, item) index pairs: shipping
            # the bool mask itself is (B, I) ~60 MB/batch over a ~90 MB/s
            # remote-PJRT tunnel (~0.7 s/batch); the pairs are ~B·avg_deg·8
            # bytes (~100x less). Padding pairs point at the extra row B.
            seen = jnp.zeros((batch_users + 1, num_items), jnp.bool_)
            seen = seen.at[prows, pcols].set(True)[:batch_users]
            q = normalize_embedding(rows) if normalize else rows
            s = q @ item_table_n.T
            s = jnp.where(seen, -1e30, s)
            return jax.lax.top_k(s, k)
    else:
        from jax.sharding import PartitionSpec as P

        from ..ops.topk import merge_topk

        axes = tuple(mesh.axis_names)        # catalog over the FULL mesh
        ndev = int(np.prod(mesh.devices.shape))
        items_pad = (-num_items) % ndev
        # pad AFTER normalization: padded rows are zero AND masked seen=True
        cat = jnp.pad(jnp.asarray(item_table_n), ((0, items_pad), (0, 0)))
        rows_per = cat.shape[0] // ndev
        kk = min(k, rows_per)
        if ndev * kk < k:
            raise ValueError(f"catalog shard of {rows_per} rows cannot "
                             f"produce global top-{k} over {ndev} devices")

        def _local(rows, cat_shard, seen_shard):
            q = normalize_embedding(rows) if normalize else rows
            s = q @ cat_shard.T
            s = jnp.where(seen_shard, -1e30, s)
            sc, ix = jax.lax.top_k(s, kk)
            ix = ix + jax.lax.axis_index(axes) * rows_per  # globalize
            return sc[None], ix[None]                      # (1, B, kk)/shard

        inner = jax.shard_map(
            _local, mesh=mesh,
            in_specs=(P(), P(axes, None), P(None, axes)),
            out_specs=(P(axes), P(axes)))

        @partial(jax.jit, static_argnames=("npairs",))
        def score_topk(rows, prows, pcols, *, npairs):
            # device-built seen mask (see the single-device path); the padded
            # catalog tail is never a candidate
            seen = jnp.zeros((batch_users + 1, num_items + items_pad),
                             jnp.bool_)
            seen = seen.at[prows, pcols].set(True)[:batch_users]
            if items_pad:
                seen = seen.at[:, num_items:].set(True)
            sc, ix = inner(rows, cat, seen)                # (ndev, B, kk)
            return merge_topk(sc, ix, k)

    def _batch_pairs(batch, ptr, items):
        """Flattened (row, item) int32 index pairs of the batch's CSR lists."""
        lens = (ptr[batch + 1] - ptr[batch]).astype(np.int64)
        rows = np.repeat(np.arange(batch.size), lens)
        starts = ptr[batch].astype(np.int64)
        # positions into `items`: per-row contiguous ranges, flattened
        pos = np.arange(lens.sum()) + np.repeat(
            starts - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        return rows.astype(np.int32), items[pos].astype(np.int32)

    def _batch_mask(batch, ptr, items):
        """(B, num_items) bool membership mask (host-side; rel stays on host)."""
        rows, cols = _batch_pairs(batch, ptr, items)
        m = np.zeros((batch.size, num_items), bool)
        m[rows, cols] = True
        return m

    t_mask, t_score = 0.0, 0.0
    for s in range(0, eval_users.size, batch_users):
        batch = eval_users[s: s + batch_users]
        b = batch.size
        if b < batch_users:  # pad to static shape
            batch = np.concatenate([batch, np.repeat(batch[-1:], batch_users - b)])
        rows = user_table[jnp.asarray(batch)]
        t0 = _time.perf_counter()
        prows, pcols = _batch_pairs(batch, tr_ptr, tr_items)
        # pad the pair list to a power-of-2 bucket (bounds recompiles to
        # O(log max_deg·B) widths); pad pairs land in the sliced-off row B
        npairs = max(1 << (int(prows.size - 1).bit_length()), 4096)
        prows = np.concatenate([prows, np.full(npairs - prows.size,
                                               batch_users, np.int32)])
        pcols = np.concatenate([pcols, np.zeros(npairs - pcols.size,
                                                np.int32)])
        rel = _batch_mask(batch, ev_ptr, ev_items)
        t_mask += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        _, topk = score_topk(rows, jnp.asarray(prows), jnp.asarray(pcols),
                             npairs=npairs)
        topk = np.asarray(topk)[:b]
        t_score += _time.perf_counter() - t0
        hits = np.take_along_axis(rel[:b], topk, axis=1)
        num_rel = rel[:b].sum(axis=1)
        recall = hits.sum(axis=1) / np.maximum(num_rel, 1)
        dcg = (hits * discounts[None, :]).sum(axis=1)
        idcg = cumdisc[np.minimum(num_rel, k)]
        ndcg = dcg / np.maximum(idcg, 1e-12)
        total_recall += recall.sum()
        total_ndcg += ndcg.sum()
        total_cnt += b
    evaluate_full_ranking.last_timings = {
        "eval_users": int(total_cnt),
        "mask_build_s": round(t_mask, 4),
        "score_topk_s": round(t_score, 4),
        "total_s": round(_time.perf_counter() - t_start, 4),
        "sharded": mesh is not None,
    }
    if total_cnt == 0:
        return 0.0, 0.0
    return float(total_recall / total_cnt), float(total_ndcg / total_cnt)
