"""BPR-style ranking loss, exactly matching the reference's (non-standard) math.

Reference ``bpr_loss`` (utils/train_test.py:18-64):

  * reg   = bpr_coeff · mean(e_u² + e_p² + e_n²)  over the **initial** (layer-0)
            embeddings — elementwise sum of squares, mean over all B·d entries
            (train_test.py:38-40)
  * cos⁺/cos⁻ = cosine similarity of L2-normalized **final** embeddings
            (train_test.py:42-47)
  * score = mean(softplus(10·(cos⁺ − cos⁻)))/10   (train_test.py:49)
  * loss  = −score + reg                          (train_test.py:51) — note the
            sign: the loss goes NEGATIVE during training (histories confirm,
            SURVEY §6); we keep the quirk for parity and offer the standard
            −log σ(pos−neg) BPR as an option.

Masked variants support padded triplet batches (static shapes under jit).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def normalize_embedding(emb: jax.Array, eps: float = 0.0) -> jax.Array:
    """L2-row-normalize (reference ``normalize_embedding``, train_test.py:53-64)."""
    nrm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
    if eps:
        nrm = jnp.maximum(nrm, eps)
    return emb / nrm


def _mean_over_negs(x: jax.Array) -> jax.Array:
    """(B, K, d) → mean over K; (B, d) passes through (K=1 reference shape)."""
    return jnp.mean(x, axis=1) if x.ndim == 3 else x


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(jnp.broadcast_to(m, x.shape)), 1.0)


def bpr_loss(
    emb_users_final: jax.Array,
    emb_users: jax.Array,
    emb_pos_items_final: jax.Array,
    emb_pos_items: jax.Array,
    emb_neg_items_final: jax.Array,
    emb_neg_items: jax.Array,
    bpr_coeff: float = 5e-3,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference-parity BPR loss; with ``mask`` (B,) bool, padded rows are ignored
    in every mean (so a padded batch computes the same value as the unpadded one).

    Negative embeddings may be (B, d) — the reference's single uniform negative
    (helpers.py:79-80) — or (B, K, d) for K negatives per positive (a quality
    extension the reference lacks; the pairwise term averages over K, so K=1
    reproduces the reference exactly).
    """
    sq = emb_users**2 + emb_pos_items**2 + _mean_over_negs(emb_neg_items**2)
    reg_loss = bpr_coeff * _masked_mean(sq, mask)

    nu = normalize_embedding(emb_users_final)
    npos = normalize_embedding(emb_pos_items_final)
    nneg = normalize_embedding(emb_neg_items_final)

    cos_pos = jnp.sum(nu * npos, axis=-1)
    if nneg.ndim == 3:
        cos_neg = jnp.sum(nu[:, None, :] * nneg, axis=-1)       # (B, K)
        pair = jnp.mean(jax.nn.softplus(10.0 * (cos_pos[:, None] - cos_neg)),
                        axis=1)
    else:
        cos_neg = jnp.sum(nu * nneg, axis=-1)
        pair = jax.nn.softplus(10.0 * (cos_pos - cos_neg))
    score = _masked_mean(pair, mask) / 10.0
    return -score + reg_loss


def bpr_loss_standard(
    emb_users_final: jax.Array,
    emb_users: jax.Array,
    emb_pos_items_final: jax.Array,
    emb_pos_items: jax.Array,
    emb_neg_items_final: jax.Array,
    emb_neg_items: jax.Array,
    bpr_coeff: float = 5e-3,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Textbook BPR: −mean log σ(⟨u,p⟩ − ⟨u,n⟩) + L2 reg. Provided as the
    'fixed' alternative to the reference quirk (selectable via config).
    Accepts (B, K, d) negatives (pairwise term averages over K)."""
    sq = emb_users**2 + emb_pos_items**2 + _mean_over_negs(emb_neg_items**2)
    reg_loss = bpr_coeff * _masked_mean(sq, mask)
    pos = jnp.sum(emb_users_final * emb_pos_items_final, axis=-1)
    if emb_neg_items_final.ndim == 3:
        neg = jnp.sum(emb_users_final[:, None, :] * emb_neg_items_final, axis=-1)
        pair = jnp.mean(jax.nn.softplus(neg - pos[:, None]), axis=1)
    else:
        neg = jnp.sum(emb_users_final * emb_neg_items_final, axis=-1)
        pair = jax.nn.softplus(neg - pos)
    return _masked_mean(pair, mask) + reg_loss


def select_bpr_loss(name: str):
    """Loss selector for config wiring: 'reference' | 'standard'."""
    if name == "reference":
        return bpr_loss
    if name == "standard":
        return bpr_loss_standard
    raise ValueError(f"unknown loss {name!r}")
