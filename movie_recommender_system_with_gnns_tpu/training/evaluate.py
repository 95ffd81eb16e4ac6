"""Full-ranking evaluation: standard Recall@k / NDCG@k over the whole catalog.

The reference only reports its Monte-Carlo sampled recall with an
all-positives denominator (utils/train_test.py:165-212; values ~1.6e-4 — kept
for parity in ops/metrics.py). The BASELINE.json north star asks for standard
recall@10/NDCG@10: rank ALL items per user, exclude train-seen interactions,
score the held-out edges. This module does that with the same two-phase
chunk-maxima selection the serving path uses (ops/topk.py::twophase_select),
in multi-batch device dispatches so the host never touches a score matrix.

Scoring uses layer-0 tables (the reference's serving contract, SURVEY §3.2) by
default; propagated final embeddings are available via ``use_propagated=True``
(the LightGCN-paper protocol).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.lightgcn import LightGCNParams
from ..ops.bpr import normalize_embedding
from ..ops.topk import NEG_INF, twophase_select


#: bounded FIFO cache of group-by results keyed on a cheap content
#: fingerprint. The host group-by over the ML-25M train set costs ~10 s and a
#: training run evaluates against the SAME edge arrays dozens of times
#: (VERDICT r4 item 2: it burned 10.7 s per eval in the r8 bridge run). The
#: cache holds a strong reference to each keyed array so its id() stays valid.
_GROUP_CACHE: dict = {}
_GROUP_CACHE_MAX = 6


def _edges_key(edges: np.ndarray, num_users: int):
    """Cheap identity+content key: array id + shape + a strided sample hash.
    The sample (≤2048 columns) guards against id reuse and in-place edits
    without hashing the full multi-hundred-MB array."""
    step = max(1, edges.shape[1] // 1024)
    sample = np.ascontiguousarray(edges[:, ::step])
    return (id(edges), edges.shape, str(edges.dtype), num_users,
            hash(sample.tobytes()))


def _np_group_by_user(edges: np.ndarray, num_users: int) -> Tuple[np.ndarray, np.ndarray]:
    """CSR-ish (indptr, items) of DISTINCT user→item lists from an undirected
    edge set. Duplicate (user, item) pairs are collapsed: metrics count
    distinct relevant items (the reference's rel sets are Python sets,
    train_test.py:203-206), so a duplicated held-out edge must not inflate
    the recall denominator. Results are cached per edge array (see
    ``_GROUP_CACHE``)."""
    key = _edges_key(edges, num_users)
    hit = _GROUP_CACHE.get(key)
    if hit is not None:
        return hit[1]
    head, tail = edges[0], edges[1]
    fwd = (head < num_users) & (tail >= num_users)
    u = head[fwd].astype(np.int64)
    it = (tail[fwd] - num_users).astype(np.int64)
    num_items = int(it.max()) + 1 if it.size else 1
    keys = np.unique(u * num_items + it)
    u, it = keys // num_items, keys % num_items
    counts = np.bincount(u, minlength=num_users)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    if len(_GROUP_CACHE) >= _GROUP_CACHE_MAX:
        _GROUP_CACHE.pop(next(iter(_GROUP_CACHE)))
    _GROUP_CACHE[key] = (edges, (indptr, it))
    return indptr, it


@lru_cache(maxsize=64)
def _make_eval_all(gb: int, kk: int, num_items: int, normalize: bool,
                   ntr: int, nev: int, n_chunks: int):
    """Module-level cached builder of the one-dispatch eval program.

    The jit cache is keyed on function identity — defining this inside
    ``evaluate_full_ranking`` created a fresh cache (and a fresh ~40 s
    compile of the mapped program) on EVERY call. The lru_cache keys the
    compiled program on its static shape config instead.
    """

    def pairs(ptr, items, batch, n):
        # flattened (row, col) pairs of the batch's CSR lists, built on
        # device: padding rides a sentinel row gb whose scatter lands in
        # the sliced-off extra row
        if items.shape[0] == 0:          # empty edge set (static shape)
            return (jnp.full(n, gb, jnp.int32), jnp.zeros(n, jnp.int32))
        lens = ptr[batch + 1] - ptr[batch]
        starts = jnp.append(ptr[batch], 0)
        lens2 = jnp.append(lens, n)          # sentinel absorbs the tail
        rows = jnp.repeat(jnp.arange(gb + 1, dtype=jnp.int32), lens2,
                          total_repeat_length=n)
        cumb = jnp.concatenate(
            [jnp.zeros(1, lens2.dtype), jnp.cumsum(lens2)[:-1]])
        pos = jnp.arange(n, dtype=jnp.int32) - cumb[rows] + starts[rows]
        cols = items[jnp.clip(pos, 0, items.shape[0] - 1)]
        return rows, cols

    @jax.jit
    def eval_all(ut, cat, trp, tri, evp, evi, users):
        def chunk(batch):
            trr, trc = pairs(trp, tri, batch, ntr)
            evr, evc = pairs(evp, evi, batch, nev)
            rows = ut[batch]
            q = normalize_embedding(rows) if normalize else rows
            s = q.astype(cat.dtype) @ cat.T                # (GB, I) — MXU
            # train-seen exclusion: scatter −inf at (row, item) pairs; the
            # extra row gb absorbs sentinel padding
            s = jnp.concatenate(
                [s, jnp.zeros((1, num_items), s.dtype)], axis=0)
            s = s.at[trr, trc].set(jnp.asarray(NEG_INF, s.dtype))[:gb]
            _, ti = twophase_select(s, kk)                 # (GB, kk)
            # device-side hit test against the held-out items: only
            # (GB, kk) bits cross the tunnel, never a (GB, I) mask
            evm = jnp.zeros((gb + 1, num_items), jnp.bool_)
            evm = evm.at[evr, evc].set(True)[:gb]
            return jnp.take_along_axis(evm, ti, axis=1)

        return jax.lax.map(chunk, users.reshape(n_chunks, gb))

    return eval_all


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
    groups: int = 8,
    score_dtype: Optional[str] = None,
) -> Tuple[float, float]:
    """Standard Recall@k and NDCG@k over users with ≥1 held-out edge.

    ``normalize=True`` ranks by cosine (the reference's serving contract);
    pass False to rank by raw inner products — the score a ``loss="standard"``
    model optimizes, and the LightGCN-paper protocol for propagated tables
    (norms carry popularity signal that cosine discards). ``max_users`` takes
    a seeded uniform SAMPLE of eval users (not the first N, which would bias
    toward low/most-active ids).

    Single-device scoring (VERDICT r3 item 1 — eval was ~270× slower than the
    serving bench it sits next to): one dispatch ranks ``groups``×
    ``batch_users`` users — scores stay device-resident, train-seen exclusion
    is a scatter of −inf index pairs, selection is the serving path's exact
    :func:`ops.topk.twophase_select` (chunk maxima, not a full ``top_k``),
    and hit-testing against the held-out items happens on device too, so only
    (B, k) hit bits ever cross the PJRT tunnel. ``score_dtype="bfloat16"``
    halves score-matrix bandwidth (exact top-k of the bf16-rounded scores —
    near-ties may order differently than f32; default f32 keeps oracle
    parity). Exclusion + ranking semantics preserved from reference
    utils/recommend.py:39-50; metric from utils/train_test.py:165-212
    generalized to the standard all-item protocol.

    With ``mesh`` (round-1 verdict item 7), both the propagation (if
    ``use_propagated``) and the per-batch catalog scoring run sharded: the
    item catalog is row-sharded over ALL mesh devices, each device scores +
    top-k's its shard, and candidates merge via :func:`ops.topk.merge_topk`.

    Wall-clock breakdown (host pair build vs device scoring) is exposed as
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

    t0 = _time.perf_counter()
    groupby_cached = (_edges_key(train_edges, num_users) in _GROUP_CACHE
                      and _edges_key(eval_edges, num_users) in _GROUP_CACHE)
    tr_ptr, tr_items = _np_group_by_user(train_edges, num_users)
    ev_ptr, ev_items = _np_group_by_user(eval_edges, num_users)
    t_groupby = _time.perf_counter() - t0

    eval_users = np.flatnonzero(np.diff(ev_ptr) > 0)
    if max_users is not None and eval_users.size > max_users:
        rng = np.random.default_rng(sample_seed)
        eval_users = np.sort(rng.choice(eval_users, size=max_users,
                                        replace=False))

    item_table_n = normalize_embedding(item_table) if normalize else item_table

    total_recall, total_ndcg, total_cnt = 0.0, 0.0, 0
    discounts = 1.0 / np.log2(np.arange(2, k + 2))
    cumdisc = np.concatenate([[0.0], np.cumsum(discounts)])

    def _batch_pairs(batch, ptr, items):
        """Flattened (row, item) int32 index pairs of the batch's CSR lists."""
        lens = (ptr[batch + 1] - ptr[batch]).astype(np.int64)
        rows = np.repeat(np.arange(batch.size), lens)
        starts = ptr[batch].astype(np.int64)
        # positions into `items`: per-row contiguous ranges, flattened
        pos = np.arange(lens.sum()) + np.repeat(
            starts - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        return rows.astype(np.int32), items[pos].astype(np.int32)

    def _pad_pairs(rows, cols, pad_row):
        """Pad to a power-of-2 bucket (bounds recompiles to O(log) widths);
        pad pairs land in the sliced-off extra row ``pad_row``."""
        n = max(1 << (int(rows.size - 1).bit_length()), 4096)
        rows = np.concatenate([rows, np.full(n - rows.size, pad_row, np.int32)])
        cols = np.concatenate([cols, np.zeros(n - cols.size, np.int32)])
        return rows, cols, n

    t_pairs, t_score = t_groupby, 0.0
    if mesh is None:
        # don't over-pad tiny eval sets to groups×batch_users
        n_dispatch_users = min(
            groups * batch_users,
            -(-max(eval_users.size, 1) // batch_users) * batch_users)
        gb = int(n_dispatch_users)
        cat = jnp.asarray(item_table_n)
        if score_dtype is not None:
            cat = cat.astype(score_dtype)
        user_table_j = jnp.asarray(user_table)
        kk = min(k, num_items)

        # ONE dispatch evaluates every user. The remote-PJRT tunnel charges
        # ~70 ms latency per transfer and ~100 ms per dispatch, so the r3
        # design (106 host-driven dispatches, 5 transfers each) was pure
        # overhead: the CSRs ship once, (row, col) exclusion/relevance pairs
        # are rebuilt ON DEVICE per chunk, and a lax.map scans the user
        # chunks inside a single program. Tables enter as ARGUMENTS, not
        # closure constants (the tunnel serializes closure constants into
        # the program payload on every dispatch — ~100 MB/call here).
        t0 = _time.perf_counter()
        if tr_ptr[-1] >= 2**31 or ev_ptr[-1] >= 2**31:
            raise ValueError("CSR offsets exceed int32")
        n_chunks = max(1, -(-eval_users.size // gb))
        upad = n_chunks * gb
        users_p = np.concatenate(
            [eval_users,
             np.repeat(eval_users[-1:] if eval_users.size else np.zeros(1, np.int64),
                       upad - eval_users.size)]).astype(np.int32)
        # exact per-chunk pair budgets, bucketed to powers of 2 (bounds
        # recompiles across calls with different eval sets)
        lens_tr = np.diff(tr_ptr)[users_p].reshape(n_chunks, gb)
        lens_ev = np.diff(ev_ptr)[users_p].reshape(n_chunks, gb)
        bucket = lambda n: max(4096, 1 << int(max(int(n) - 1, 0)).bit_length())
        ntr = bucket(lens_tr.sum(1).max())
        nev = bucket(lens_ev.sum(1).max())
        trp = jnp.asarray(tr_ptr.astype(np.int32))
        tri = jnp.asarray(tr_items.astype(np.int32))
        evp = jnp.asarray(ev_ptr.astype(np.int32))
        evi = jnp.asarray(ev_items.astype(np.int32))
        users_d = jnp.asarray(users_p)
        t_pairs += _time.perf_counter() - t0

        eval_all = _make_eval_all(gb, kk, num_items, bool(normalize),
                                  ntr, nev, n_chunks)

        t0 = _time.perf_counter()
        hits_all = eval_all(user_table_j, cat, trp, tri, evp, evi, users_d)
        hits = np.asarray(hits_all).reshape(upad, kk)[:eval_users.size]
        t_score += _time.perf_counter() - t0
        hits = hits.astype(np.float64)
        if kk < k:
            hits = np.pad(hits, ((0, 0), (0, k - kk)))
        if eval_users.size:
            num_rel = np.diff(ev_ptr)[eval_users]
            recall = hits.sum(axis=1) / np.maximum(num_rel, 1)
            dcg = (hits * discounts[None, :]).sum(axis=1)
            idcg = cumdisc[np.minimum(num_rel, k)]
            ndcg = dcg / np.maximum(idcg, 1e-12)
            total_recall = recall.sum()
            total_ndcg = ndcg.sum()
            total_cnt = eval_users.size
        evaluate_full_ranking.last_timings = {
            "eval_users": int(total_cnt),
            "mask_build_s": round(t_pairs, 4),
            "score_topk_s": round(t_score, 4),
            "total_s": round(_time.perf_counter() - t_start, 4),
            "sharded": False,
            "dispatch_users": gb,
            "score_dtype": str(score_dtype or "float32"),
            "groupby_cached": groupby_cached,
        }
        if total_cnt == 0:
            return 0.0, 0.0
        return float(total_recall / total_cnt), float(total_ndcg / total_cnt)

    # ---- sharded (mesh) path: catalog row-sharded over all devices ----
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
        s = jnp.where(seen_shard, NEG_INF, s)
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

    def _batch_mask(batch, ptr, items):
        """(B, num_items) bool membership mask (host-side; rel stays on host)."""
        rows, cols = _batch_pairs(batch, ptr, items)
        m = np.zeros((batch.size, num_items), bool)
        m[rows, cols] = True
        return m

    for st in range(0, eval_users.size, batch_users):
        batch = eval_users[st: st + batch_users]
        b = batch.size
        if b < batch_users:  # pad to static shape
            batch = np.concatenate([batch, np.repeat(batch[-1:], batch_users - b)])
        rows = user_table[jnp.asarray(batch)]
        t0 = _time.perf_counter()
        prows, pcols = _batch_pairs(batch, tr_ptr, tr_items)
        prows, pcols, npairs = _pad_pairs(prows, pcols, batch_users)
        rel = _batch_mask(batch, ev_ptr, ev_items)
        t_pairs += _time.perf_counter() - t0
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
        "mask_build_s": round(t_pairs, 4),
        "score_topk_s": round(t_score, 4),
        "total_s": round(_time.perf_counter() - t_start, 4),
        "sharded": True,
        "groupby_cached": groupby_cached,
    }
    if total_cnt == 0:
        return 0.0, 0.0
    return float(total_recall / total_cnt), float(total_ndcg / total_cnt)
