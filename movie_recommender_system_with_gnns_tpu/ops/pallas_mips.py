"""Pallas fused MIPS kernel: per-block scoring + in-kernel top-k extraction.

The XLA flat path (ops/topk.py) materializes the (Q, N) score matrix in HBM
(~60 MB at ML-25M serving scale) before ``approx_max_k`` reads it back. This
kernel keeps each (Q, BLOCK) score tile in VMEM, extracts the block's top-k by
iterative max-and-mask on the VPU (Mosaic has no top_k lowering — verified),
and only writes (num_blocks, Q, k) candidates; a tiny XLA merge finishes.
HBM traffic drops from ~3·Q·N·4 bytes to N·d + num_blocks·Q·k·8.

Exclusion masks (train-seen filtering) stream per block as an int8 tile; the
kernel is the throughput path for batched retrieval with or without filters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bpr import normalize_embedding
from .topk import merge_topk

NEG_INF = -1e30
BIG_IDX = 2**30


def _mips_block_kernel(n_ref, q_ref, c_ref, *rest, k: int, has_mask: bool):
    """One catalog block: scores on the MXU, top-k extraction on the VPU.

    n_ref:  (1, 1) int32 in SMEM — true catalog size (masks padding)
    q_ref:  (Q, d) queries (VMEM)
    c_ref:  (B, d) catalog block (VMEM)
    [mask_ref: (Q, B) int8 — 1 = excluded (train-seen filtering)]
    os_ref: (1, Q, k) block top-k scores
    oi_ref: (1, Q, k) block top-k GLOBAL indices
    """
    if has_mask:
        mask_ref, os_ref, oi_ref = rest
    else:
        os_ref, oi_ref = rest
        mask_ref = None
    j = pl.program_id(0)
    q = q_ref[:]
    c = c_ref[:]
    b = c.shape[0]
    nq = q.shape[0]
    s = jax.lax.dot_general(
        q, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # (Q, B)
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, b), 1) + j * b
    s = jnp.where(col < n_ref[0, 0], s, NEG_INF)
    if mask_ref is not None:
        s = jnp.where(mask_ref[:] != 0, NEG_INF, s)
    for t in range(k):                                    # static unroll
        m = jnp.max(s, axis=1)                            # (Q,)
        is_max = s == m[:, None]
        idx = jnp.min(jnp.where(is_max, col, BIG_IDX), axis=1)
        os_ref[0, :, t] = m
        oi_ref[0, :, t] = idx
        s = jnp.where(col == idx[:, None], NEG_INF, s)


@functools.partial(jax.jit, static_argnames=("k", "block", "normalize"))
def mips_topk_pallas(
    query: jax.Array,      # (Q, d)
    catalog: jax.Array,    # (N, d)
    k: int = 10,
    block: int = 4096,
    normalize: bool = True,
    exclude_mask=None,     # (Q, N) bool — True = exclude (train-seen filter)
):
    """Fused-kernel MIPS top-k; returns (scores (Q, k), indices (Q, k)).

    block=8192 with Q=256 puts the (Q, B) score + iota tiles at the 16 MB VMEM
    edge (observed scoped-vmem OOM); 4096 measures the same ~1.4 ms/batch with
    comfortable headroom.
    """
    q = normalize_embedding(query) if normalize else query
    c = normalize_embedding(catalog) if normalize else catalog
    n, d = c.shape
    nq = q.shape[0]
    pad = (-n) % block
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad, d), c.dtype)], axis=0)
    nb = (n + pad) // block
    has_mask = exclude_mask is not None

    in_specs = [
        pl.BlockSpec((nq, d), lambda j, n_ref: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, d), lambda j, n_ref: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(n, jnp.int32).reshape(1, 1), q.astype(jnp.float32),
            c.astype(jnp.float32)]
    if has_mask:
        m8 = exclude_mask.astype(jnp.int8)
        if pad:
            m8 = jnp.concatenate(
                [m8, jnp.zeros((nq, pad), jnp.int8)], axis=1)
        in_specs.append(pl.BlockSpec((nq, block), lambda j, n_ref: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(m8)

    kern = functools.partial(_mips_block_kernel, k=k, has_mask=has_mask)
    os_, oi_ = pl.pallas_call(
        kern,
        interpret=(jax.default_backend() == "cpu"),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, nq, k), lambda j, n_ref: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nq, k), lambda j, n_ref: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nb, nq, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * nq * block * d,
            bytes_accessed=(n + pad) * d * 4 + nq * d * 4 + nb * nq * k * 8,
            transcendentals=0,
        ),
    )(*args)
    return merge_topk(os_, oi_, k)


CHUNK = 128   # twophase chunk width == one VREG lane group


def _score_chunkmax_kernel(n_ref, q_ref, c_ref, *rest, has_mask: bool,
                           packed_mask: bool = False):
    """Fused pass 1 of the exact twophase MIPS: one (QT, NT) score tile on the
    MXU, pad-column masking, bf16 store, and the tile's 128-lane chunk maxima
    — all while the tile is VMEM-resident. Replaces the XLA twophase's
    separate write + read of the (Q, N) score matrix (the ~50%-of-traffic
    re-read that capped mips_hbm_util at 0.13 in BENCH_r03).

    n_ref: (1,) int32 scalar-prefetch — true catalog size (masks padding)
    q_ref: (QT, d) query tile;  c_ref: (NT, d) catalog tile
    [m_ref: (QT, NT) int8 exclusion tile — 1 = excluded (train-seen filter,
     reference recommend.py:48-50), streamed per tile like the r2 per-block
     kernel's (VERDICT r4 item 5)]
    s_ref: (QT, NT) bf16 score tile out; cm_ref: (QT, NT/128) chunk maxima out
    """
    if has_mask:
        m_ref, s_ref, cm_ref = rest
    else:
        s_ref, cm_ref = rest
        m_ref = None
    j = pl.program_id(1)
    s = jax.lax.dot_general(
        q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # (QT, NT)
    qt, nt = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (qt, nt), 1) + j * nt
    s = jnp.where(col < n_ref[0], s, NEG_INF)
    if m_ref is not None and packed_mask:
        # stride-(nt/8) bit layout (ops/topk.py::pack_mask_tiles): byte
        # b of the (QT, nt/8) tile holds the bits of columns b, b+nt/8,
        # b+2·nt/8, …, so a lane-concat repeat (pltpu.repeat = np.tile)
        # aligns byte n % (nt/8) under lane n and the bit index is a pure
        # function of the lane: n // (nt/8). Whole unpack = repeat + widen +
        # shift + and, all VPU, no HBM intermediates (the point: the packed
        # serving mask is 8× smaller than int8 and 32× smaller than bool).
        nb = nt // 8
        rep = pltpu.repeat(m_ref[:], 8, axis=1).astype(jnp.int32)  # (QT, nt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (qt, nt), 1)
        bit = (rep >> (lane // nb)) & 1
        s = jnp.where(bit != 0, NEG_INF, s)
    elif m_ref is not None:
        s = jnp.where(m_ref[:] != 0, NEG_INF, s)
    sb = s.astype(s_ref.dtype)
    s_ref[:] = sb
    # chunk maxima stored CHUNK-MAJOR — (NT/128, QT) — so the output block's
    # lane dim is QT (128-multiple); a (QT, NT/128) layout would need a
    # 16-lane block, which Mosaic rejects. Cross-lane max per 128-lane slice.
    for t in range(nt // CHUNK):
        cm_ref[t, :] = jnp.max(sb[:, t * CHUNK:(t + 1) * CHUNK], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "q_tile", "n_tile",
                                             "normalize", "score_dtype"))
def mips_topk_fused(
    query: jax.Array,      # (Q, d)
    catalog: jax.Array,    # (N, d)
    k: int = 10,
    q_tile: int = 512,
    n_tile: int = 2048,
    normalize: bool = True,
    score_dtype=jnp.bfloat16,
    exclude_mask=None,         # (Q, N) bool/int8 — True/1 = exclude
    exclude_mask_packed=None,  # (Q, n_tiles·n_tile/8) uint8, tile-bit layout
                               # (ops/topk.py::pack_mask_tiles) — 8× smaller
):
    """Exact twophase MIPS with a fused Pallas pass 1.

    Pass 1 (kernel above) writes the bf16 score matrix ONCE together with its
    chunk maxima; pass 2 ranks chunk maxima (``top_k``), gathers only the k
    winning 128-wide chunks per query, and finishes with a tiny top-k — exact
    by chunk containment (ops/topk.py::twophase_select docstring). HBM
    traffic ≈ one score write + k·128 re-reads/query, vs write + full re-read
    for the XLA twophase.

    ``exclude_mask`` streams per-tile int8 exclusion blocks through the kernel
    (train-seen filtering, reference recommend.py:48-50) — build it ON DEVICE
    from index pairs via :func:`ops.topk.seen_mask_from_pairs` so the (Q, N)
    bool never materializes on host (VERDICT r4 item 5).
    """
    q = normalize_embedding(query) if normalize else query
    c = normalize_embedding(catalog) if normalize else catalog
    q = q.astype(score_dtype)
    c = c.astype(score_dtype)
    n, d = c.shape
    nq = q.shape[0]
    qpad = (-nq) % q_tile
    if qpad:
        q = jnp.concatenate([q, jnp.zeros((qpad, d), q.dtype)], axis=0)
    npad = (-n) % n_tile
    if npad:
        c = jnp.concatenate([c, jnp.zeros((npad, d), c.dtype)], axis=0)
    nqp, np_ = nq + qpad, n + npad
    ncp = np_ // CHUNK

    if exclude_mask is not None and exclude_mask_packed is not None:
        raise ValueError("pass exclude_mask OR exclude_mask_packed, not both")
    has_mask = exclude_mask is not None or exclude_mask_packed is not None
    packed_mask = exclude_mask_packed is not None
    in_specs = [
        pl.BlockSpec((q_tile, d), lambda i, j, n_ref: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_tile, d), lambda i, j, n_ref: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(n, jnp.int32).reshape(1), q, c]
    if packed_mask:
        mp = exclude_mask_packed
        if mp.shape[1] != np_ // 8:
            raise ValueError(
                f"packed mask width {mp.shape[1]} != padded catalog/8 "
                f"{np_ // 8} — pack with pack_mask_tiles(num_items={n}, "
                f"n_tile={n_tile})")
        if qpad:
            mp = jnp.pad(mp, ((0, qpad), (0, 0)))
        in_specs.append(pl.BlockSpec((q_tile, n_tile // 8),
                                     lambda i, j, n_ref: (i, j),
                                     memory_space=pltpu.VMEM))
        args.append(mp)
    elif has_mask:
        m8 = exclude_mask.astype(jnp.int8)
        if m8.shape != (nqp, np_):
            # accept pre-padded masks (no big pad copy per dispatch)
            m8 = jnp.pad(m8, ((0, nqp - m8.shape[0]), (0, np_ - m8.shape[1])))
        in_specs.append(pl.BlockSpec((q_tile, n_tile),
                                     lambda i, j, n_ref: (i, j),
                                     memory_space=pltpu.VMEM))
        args.append(m8)

    s, cm = pl.pallas_call(
        functools.partial(_score_chunkmax_kernel, has_mask=has_mask,
                          packed_mask=packed_mask),
        interpret=(jax.default_backend() == "cpu"),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nqp // q_tile, np_ // n_tile),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((q_tile, n_tile), lambda i, j, n_ref: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tile // CHUNK, q_tile),
                             lambda i, j, n_ref: (j, i),
                             memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nqp, np_), score_dtype),
            jax.ShapeDtypeStruct((ncp, nqp), score_dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nqp * np_ * d,
            bytes_accessed=(np_ * d + nqp * d) * 2
            + nqp * (np_ + ncp) * 2 + (nqp * np_ if has_mask else 0),
            transcendentals=0,
        ),
    )(*args)

    kc = min(k, ncp)
    _, ci = jax.lax.top_k(cm.T, kc)                       # winning chunks
    s3 = s.reshape(nqp, ncp, CHUNK)
    sel = jnp.take_along_axis(s3, ci[:, :, None], axis=1)  # (Q, kc, 128)
    vs, vi = jax.lax.top_k(sel.reshape(nqp, kc * CHUNK), k)
    chunk = jnp.take_along_axis(ci, vi // CHUNK, axis=1)
    idx = chunk * CHUNK + vi % CHUNK
    return vs[:nq].astype(jnp.float32), idx[:nq]
