"""Triplet construction + negative sampling, jit-safe with static shapes.

Capability parity with reference ``utils/helpers.py``:

  * :func:`triplets_from_edges` (host) — users/pos-items from an edge batch
    (helpers.py:84-103): users are edge heads with id < num_users, positives are
    edge tails ≥ num_users shifted down by num_users. For the undirected-doubled
    bipartite graph both masks select exactly the user→item half. We do this on
    host at graph-build time and pad to a static batch size.
  * :func:`sample_negative` — uniform random item ids, no positive-collision
    check, matching the reference's simplification (helpers.py:64-82, note :68),
    but driven by a ``jax.random`` key (deterministic across devices/mesh shapes).
  * :func:`sample_negative_feasible` — the exact variant the reference sketches
    but never wires in (cantor_hash_pair / is_in_feasible, helpers.py:11-62):
    rejection-resample against a user→item membership probe table.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class TripletBatch(NamedTuple):
    """Padded (static-shape) positive pairs for one training step."""

    user: jax.Array       # (B,) int32 dense user index
    pos_item: jax.Array   # (B,) int32 dense item index (0-based, no offset)
    mask: jax.Array       # (B,) bool — False on padding rows


def triplets_from_edges(
    edge_index: np.ndarray, num_users: int, pad_to: int | None = None
) -> TripletBatch:
    """Host-side positive-pair extraction (helpers.py:98-100) with padding."""
    head = edge_index[0]
    tail = edge_index[1]
    m = (head < num_users) & (tail >= num_users)
    users = head[m].astype(np.int32)
    pos = (tail[m] - num_users).astype(np.int32)
    b = users.shape[0]
    pad = b if pad_to is None else pad_to
    if pad < b:
        raise ValueError(f"pad_to={pad} < batch={b}")
    mask = np.zeros(pad, bool)
    mask[:b] = True
    users = np.concatenate([users, np.zeros(pad - b, np.int32)])
    pos = np.concatenate([pos, np.zeros(pad - b, np.int32)])
    return TripletBatch(jnp.asarray(users), jnp.asarray(pos), jnp.asarray(mask))


def sample_negative(key: jax.Array, batch: int, num_items: int,
                    num: int = 1) -> jax.Array:
    """Uniform negatives over the item catalog (helpers.py:79-80).

    ``num > 1`` draws K negatives per positive — shape (batch, num) — for the
    multi-negative BPR extension (ops/bpr.py accepts both shapes)."""
    shape = (batch,) if num <= 1 else (batch, num)
    return jax.random.randint(key, shape, 0, num_items, dtype=jnp.int32)


def cantor_hash_pair(x: jax.Array, y: jax.Array) -> jax.Array:
    """Cantor pairing (helpers.py:11-22) — used by the exact-feasibility sampler."""
    s = x.astype(jnp.int64) + y.astype(jnp.int64)
    return (s * (s + 1)) // 2 + y.astype(jnp.int64)


def build_membership_hash(
    user: np.ndarray, item: np.ndarray, num_slots: int
) -> np.ndarray:
    """Host-side sorted Cantor-hash table of observed (user, item) pairs.

    NOTE: int64 — host-side membership checks only (``is_in_feasible``). The
    DEVICE probe must NOT use this: JAX runs with x64 disabled, so the Cantor
    hash overflows int32 beyond ~46K nodes ((u+i)² > 2³¹). The device sampler
    uses :func:`build_member_table` + lexicographic binary search instead.
    """
    s = user.astype(np.int64) + item.astype(np.int64)
    h = (s * (s + 1)) // 2 + item.astype(np.int64)
    h = np.unique(h)
    pad = np.full(max(num_slots - h.shape[0], 0), np.iinfo(np.int64).max, np.int64)
    return np.concatenate([h, pad])


def build_member_table(user: np.ndarray, item: np.ndarray,
                       align: int = 128) -> np.ndarray:
    """Host-side (2, L) int32 table of observed (user, item) pairs, sorted
    lexicographically by (user, item) and deduplicated; padded with int32-max
    sentinels (greater than every real pair) to a lane multiple.

    This is the device-probe form of the reference's feasibility idea
    (helpers.py:11-62): int32-exact at ANY MovieLens scale, unlike a Cantor
    hash, which needs 35+ bits at 162K users (JAX x64 is disabled, so int64
    silently truncates on device — caught live on the first ML-25M run).
    """
    pairs = np.unique(np.stack([user.astype(np.int64),
                                item.astype(np.int64)]), axis=1)
    big = np.iinfo(np.int32).max
    pad = (-pairs.shape[1]) % align
    pairs = np.concatenate(
        [pairs, np.full((2, pad), big, np.int64)], axis=1)
    return pairs.astype(np.int32)


def _member_probe(member: jax.Array, u: jax.Array, i: jax.Array) -> jax.Array:
    """Vectorized lower-bound binary search of (u, i) in the sorted (2, L)
    member table; returns a bool array shaped like ``u``. Static unroll of
    ceil(log2(L)) compare/gather rounds — the same work jnp.searchsorted
    lowers to, but comparing (user, item) pairs so no 64-bit key is needed."""
    mu, mi = member[0], member[1]
    n = mu.shape[0]
    lo = jnp.zeros_like(u)
    hi = jnp.full_like(u, n)
    for _ in range(max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)):
        mid = (lo + hi) // 2
        c = jnp.clip(mid, 0, n - 1)
        m_u = mu[c]
        m_i = mi[c]
        less = (m_u < u) | ((m_u == u) & (m_i < i))
        open_ = lo < hi
        lo = jnp.where(open_ & less, mid + 1, lo)
        hi = jnp.where(open_ & ~less, mid, hi)
    at = jnp.clip(lo, 0, n - 1)
    return (lo < n) & (mu[at] == u) & (mi[at] == i)


def get_user_items(edge_index: np.ndarray) -> dict:
    """User → interacted-items dict (reference helpers.py:24-41 API parity;
    vectorized instead of the reference's per-edge Python loop)."""
    head = np.asarray(edge_index[0])
    tail = np.asarray(edge_index[1])
    order = np.argsort(head, kind="stable")
    h, t = head[order], tail[order]
    uniq, starts = np.unique(h, return_index=True)
    ends = np.append(starts[1:], h.shape[0])
    return {int(u): t[s:e].tolist() for u, s, e in zip(uniq, starts, ends)}


def is_in_feasible(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Columns of ``a`` (2, n) whose (x, y) pairs do NOT appear in ``b`` (2, m)
    — reference helpers.py:43-62 semantics via Cantor-hash set difference."""
    def h(e):
        s = e[0].astype(np.int64) + e[1].astype(np.int64)
        return s * (s + 1) // 2 + e[1].astype(np.int64)

    mask = ~np.isin(h(np.asarray(a)), h(np.asarray(b)))
    return np.asarray(a)[:, mask]


def sample_negative_feasible(
    key: jax.Array,
    user: jax.Array,
    num_items: int,
    member: jax.Array,
    num_rounds: int = 4,
    num: int = 1,
) -> jax.Array:
    """Rejection-resampled negatives: re-draw (bounded rounds, static shapes)
    whenever (user, candidate) is a known positive. ``member`` is the (2, L)
    int32 table from :func:`build_member_table`.

    Shape contract matches :func:`sample_negative`: ``(B,)`` for ``num <= 1``,
    ``(B, num)`` otherwise. Residual collision probability after R rounds is
    (deg_u / num_items)^(R+1) — at ML-25M stats (deg≈76, I=59K, R=4) ≈ 4e-15
    per draw, i.e. exact in practice while keeping the jit-static shape."""
    shape = (user.shape[0],) if num <= 1 else (user.shape[0], num)
    u = user if num <= 1 else jnp.broadcast_to(user[:, None], shape)
    neg = jax.random.randint(key, shape, 0, num_items, dtype=jnp.int32)
    for r in range(num_rounds):
        key, sub = jax.random.split(key)
        is_member = _member_probe(member, u, neg)
        redraw = jax.random.randint(sub, shape, 0, num_items, dtype=jnp.int32)
        neg = jnp.where(is_member, redraw, neg)
    return neg


def build_alias_table(counts: np.ndarray, power: float = 0.75,
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side Walker alias table for popularity^power negative sampling.

    The reference samples negatives uniformly (helpers.py:79-80); popularity-
    weighted negatives (word2vec's count^0.75 law) sharpen the ranking signal
    by spending draws where the model must discriminate hardest. The alias
    method makes each device draw O(1): two uniforms → one row probe + one
    conditional redirect — no searchsorted (a ~16-round serial binary search
    on TPU). Returns ``(prob (N,) float32, alias (N,) int32)``.
    """
    w = np.asarray(counts, np.float64) ** power
    if w.sum() <= 0:
        w = np.ones_like(w)
    p = w / w.sum() * w.shape[0]          # mean 1
    prob = np.zeros(w.shape[0], np.float32)
    alias = np.zeros(w.shape[0], np.int32)
    small = [i for i, x in enumerate(p) if x < 1.0]
    large = [i for i, x in enumerate(p) if x >= 1.0]
    p = p.copy()
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] - (1.0 - p[s])
        (small if p[l] < 1.0 else large).append(l)
    for i in large + small:
        prob[i] = 1.0
        alias[i] = i
    return prob, alias


def item_popularity(edge_index: np.ndarray, num_users: int,
                    num_items: int) -> np.ndarray:
    """(N,) train interaction counts per item (the popularity law's input)."""
    head, tail = np.asarray(edge_index[0]), np.asarray(edge_index[1])
    m = (head < num_users) & (tail >= num_users)
    return np.bincount(tail[m] - num_users, minlength=num_items)


def sample_negative_alias(key: jax.Array, batch: int, num_items: int,
                          prob: jax.Array, alias: jax.Array,
                          num: int = 1) -> jax.Array:
    """Popularity^power negatives via the alias table: per draw, pick slot
    ``j ~ U[0, N)``, keep it with probability ``prob[j]``, else take
    ``alias[j]``. Two (B,)-row gathers on device — O(1) per draw."""
    shape = (batch,) if num <= 1 else (batch, num)
    k1, k2 = jax.random.split(key)
    j = jax.random.randint(k1, shape, 0, num_items, dtype=jnp.int32)
    u = jax.random.uniform(k2, shape)
    return jnp.where(u < prob[j], j, alias[j]).astype(jnp.int32)
