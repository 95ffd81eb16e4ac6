"""Evaluation metrics: the reference's sampled Recall@k (for parity) plus standard
Recall@k / NDCG@k (the north-star metrics in BASELINE.json).

Reference ``compute_recall_at_k`` (utils/train_test.py:165-212) semantics, kept
bug-for-bug for parity:

  * embeddings are the **initial** (layer-0) per-edge gathered rows (train_test.py:157-159)
  * ``num_samples`` draws of ``sample_size`` users WITHOUT replacement
  * score matrix = L2-normalized users × [pos ‖ neg] item embeddings
  * top-k overlap with the positives mask, but the denominator is the TOTAL
    positive count (train_test.py:203-206) — hence the tiny absolute values
    (~1.6e-4) in the reference histories (SURVEY §6).

Standard metrics operate on full score matrices with train-interaction masking.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .bpr import normalize_embedding


def sampled_recall_at_k(
    key: jax.Array,
    user_embs: jax.Array,      # (B, d) initial user rows (one per eval edge)
    pos_item_embs: jax.Array,  # (B, d) initial positive-item rows
    neg_item_embs: jax.Array,  # (B, d) initial sampled-negative rows
    k: int = 100,
    num_samples: int = 10,
    sample_size: int = 100,
) -> jax.Array:
    """Reference-parity Monte-Carlo Recall@k (train_test.py:165-212), jitted."""
    pos_n = normalize_embedding(pos_item_embs)
    neg_n = normalize_embedding(neg_item_embs)
    items = jnp.concatenate([pos_n, neg_n], axis=0)          # (2B, d)
    num_users = user_embs.shape[0]
    num_pos = pos_item_embs.shape[0]
    # small eval sets: can't draw more users without replacement than exist
    # (the reference's np.random.choice would raise here too)
    sample_size = min(sample_size, num_users)
    k = min(k, items.shape[0])

    def one_sample(sk):
        idx = jax.random.choice(sk, num_users, (sample_size,), replace=False)
        u = normalize_embedding(user_embs[idx])
        scores = u @ items.T                                  # (S, 2B)
        _, topk = jax.lax.top_k(scores, k)
        hits = (topk < num_pos).astype(jnp.float32).sum(axis=1)
        return jnp.mean(hits / num_pos)

    keys = jax.random.split(key, num_samples)
    # sequential map, not vmap: each draw materializes a (sample_size, 2B)
    # score matrix — at ML-25M scale that is ~0.5 GB, and 10 vmapped copies
    # would blow HBM
    return jnp.mean(jax.lax.map(one_sample, keys))


def recall_ndcg_at_k(
    scores: jax.Array,        # (U, I) full score matrix (already train-masked)
    relevant: jax.Array,      # (U, I) bool — held-out positives
    k: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Standard per-user Recall@k and NDCG@k, averaged over users with ≥1
    relevant item. These are the BASELINE.json north-star metrics."""
    _, topk = jax.lax.top_k(scores, k)
    rel_at_topk = jnp.take_along_axis(relevant, topk, axis=1).astype(jnp.float32)  # (U, k)
    num_rel = relevant.sum(axis=1).astype(jnp.float32)                              # (U,)
    has_rel = num_rel > 0

    recall_u = rel_at_topk.sum(axis=1) / jnp.maximum(num_rel, 1.0)

    discounts = 1.0 / jnp.log2(jnp.arange(2, k + 2, dtype=jnp.float32))
    dcg = (rel_at_topk * discounts[None, :]).sum(axis=1)
    ideal_hits = jnp.minimum(num_rel, float(k))
    # ideal DCG = sum of first `ideal_hits` discounts
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(discounts)])
    idcg = cum[jnp.clip(ideal_hits, 0, k).astype(jnp.int32)]
    ndcg_u = dcg / jnp.maximum(idcg, 1e-12)

    denom = jnp.maximum(has_rel.sum(), 1)
    recall = jnp.where(has_rel, recall_u, 0.0).sum() / denom
    ndcg = jnp.where(has_rel, ndcg_u, 0.0).sum() / denom
    return recall, ndcg
