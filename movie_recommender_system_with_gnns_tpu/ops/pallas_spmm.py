"""Pallas TPU kernel for LightGCN propagation: one-hot-densified SpMM on the MXU.

The propagation ``out = Â @ emb`` is the hot training kernel (reference
models/light_gcn.py:33 → torch-scatter CUDA scatter-add; SURVEY §3.3). TPU
hardware offers no efficient arbitrary-row gather/scatter (Mosaic's
``tpu.dynamic_gather`` is limited to one vreg along the gather axis — verified
empirically), so the TPU-native formulation converts the sparse matmul into
dense MXU work:

  for each (row-tile i, column-chunk j):
      A_ij[r, c] = Σ_k  w[i·TR+r, k] · [nbr[i·TR+r, k] == j·C + c]   (VPU build)
      out_i     += A_ij @ emb_j                                      (MXU)

The ELL neighbor lists (ops/spmm.py layout) feed the on-the-fly densification;
padding entries point at the phantom row and never match a chunk column. Cost is
O(N/TR · N/C · (W·TR·C + TR·C·d)) — quadratic in N, which on the MXU beats the
gather path for graphs up to ~16K nodes (full-graph ML-100K/1M training, and
every Cluster-GCN subgraph after node-compaction). Large HBM-resident graphs
route through the XLA gather path (ops.spmm.spmm_ell / spmm_segment);
:func:`select_spmm` picks automatically.

Golden-tested against spmm_segment in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm import DeviceELL

# one-hot densification pays off only while N² stays MXU-friendly
PALLAS_MAX_NODES = 16_384
ROW_TILE = 128
COL_CHUNK = 128


def _onehot_spmm_kernel(nbr_ref, w_ref, emb_ref, out_ref):
    """One (row-tile, col-chunk) step: densify A_ij and accumulate A_ij @ E_j.

    nbr_ref: (TR, W) int32 neighbor ids (global)
    w_ref:   (TR, W) f32 edge weights (0 on padding)
    emb_ref: (C, d) f32 — column chunk of the embedding matrix
    out_ref: (TR, d) f32 — accumulated over the chunk grid axis
    """
    j = pl.program_id(1)
    tr, w_width = nbr_ref.shape
    c = emb_ref.shape[0]

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rel = nbr_ref[:] - j * c                               # (TR, W)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tr, c), 1)
    a = jnp.zeros((tr, c), jnp.float32)
    for k in range(w_width):                               # static unroll
        match = (rel[:, k][:, None] == col_ids).astype(jnp.float32)
        a = a + w_ref[:, k][:, None] * match
    # HIGHEST: 3-pass bf16 emulation gives exact-f32 results (~2e-5 vs the
    # default single pass's ~4e-3 at unit scale, measured on v5e). The kernel
    # is VPU-bound on the one-hot build, so the extra MXU passes are ~free —
    # and this path's reason to exist next to the bf16 hybrid blocks is
    # exactness (on-chip golden test: tests/test_tpu_kernels.py).
    out_ref[:] += jnp.dot(a, emb_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


W_UNROLL_MAX = 32  # compare/FMA unroll bound inside the kernel


def _ell_block_call(emb: jax.Array, nbr: jax.Array, w: jax.Array) -> jax.Array:
    rows, width = nbr.shape
    n, d = emb.shape
    n_pad = pl.cdiv(n, COL_CHUNK) * COL_CHUNK
    if n_pad != n:
        emb = jnp.concatenate([emb, jnp.zeros((n_pad - n, d), emb.dtype)], axis=0)
    # wide buckets: split the neighbor width and sum partial SpMMs so the
    # in-kernel unroll stays bounded
    if width > W_UNROLL_MAX:
        parts = []
        for s in range(0, width, W_UNROLL_MAX):
            e = min(s + W_UNROLL_MAX, width)
            parts.append(_ell_block_call(emb[:n], nbr[:, s:e], w[:, s:e]))
        return functools.reduce(jnp.add, parts)

    tile_r = ROW_TILE if rows % ROW_TILE == 0 else 8
    if rows % tile_r != 0:
        # pad rows to the tile (zero weights null the phantom rows' output);
        # without this the floored grid would leave tail rows UNWRITTEN
        pad = tile_r - rows % tile_r
        nbr = jnp.concatenate([nbr, jnp.zeros((pad, width), nbr.dtype)], axis=0)
        w = jnp.concatenate([w, jnp.zeros((pad, width), w.dtype)], axis=0)
        return _ell_block_call(emb[:n], nbr, w)[:rows]
    grid = (rows // tile_r, n_pad // COL_CHUNK)
    return pl.pallas_call(
        _onehot_spmm_kernel,
        interpret=(jax.default_backend() == "cpu"),
        out_shape=jax.ShapeDtypeStruct((rows, d), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_r, width), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_r, width), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((COL_CHUNK, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_r, d), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * grid[0] * grid[1] * tile_r * COL_CHUNK * (width + d),
            bytes_accessed=rows * width * 8 + grid[0] * n_pad * d * 4 + rows * d * 4,
            transcendentals=0,
        ),
    )(nbr, w, emb.astype(jnp.float32))


@jax.jit
def spmm_ell_pallas(ell: DeviceELL, emb: jax.Array) -> jax.Array:
    """Pallas one-hot SpMM over the degree-bucketed ELL blocks (small-graph
    regime; see module docstring). API-compatible with ops.spmm.spmm_ell.

    Precision: the in-kernel dot runs at ``Precision.HIGHEST`` (3-pass bf16
    emulation → exact-f32 results, matching the XLA ELL/segment paths; the
    kernel is VPU-bound on the one-hot build so the extra passes are ~free).
    The hybrid trainer's dense blocks keep bf16 operands for speed — that
    trade lives there, not here."""
    outs = []
    for blk in ell.blocks:
        outs.append(_ell_block_call(emb, blk.nbr, blk.w))
    stacked = jnp.concatenate(outs, axis=0)
    return stacked[ell.inv_perm].astype(emb.dtype)


def select_spmm(num_nodes: int, dim: int, use_pallas: Optional[bool] = None):
    """Pick the propagation backend.

    Measured on a v5e chip (ML-100K-scale, d=64): the XLA gather ELL path runs
    ~1.4 ms/layer vs ~4.4 ms for this kernel — XLA's fused gather + reduce is
    already near the HBM roofline at these sizes while the one-hot formulation
    pays an O(N/C) chunk-scan overhead. The Pallas kernel therefore stays an
    explicit opt-in (``use_pallas=True``) until block-sparse chunk skipping
    lands; the default routes to XLA.
    """
    from .spmm import spmm_ell

    if use_pallas:
        if num_nodes > PALLAS_MAX_NODES:
            import warnings

            warnings.warn(
                f"pallas one-hot SpMM requested for {num_nodes} nodes "
                f"(> {PALLAS_MAX_NODES}): O(N^2) densification would be "
                "slower than the XLA ELL path; routing to XLA", stacklevel=2)
            return spmm_ell
        return spmm_ell_pallas
    return spmm_ell
