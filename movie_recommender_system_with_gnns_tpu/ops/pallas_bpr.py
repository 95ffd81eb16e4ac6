"""Pallas fused BPR triplet kernel: loss + all gradients in one VMEM pass.

The train step's dominant cost is not FLOPs but row-granular gathers/scatters:
XLA's TPU gather moves ~40M rows/s regardless of table size (~24 ns/row
measured on v5e), and the reference BPR loss (utils/train_test.py:18-64) needs
six 41K-row gathers forward plus their scatter transposes backward — ~4 ms of
a 6.4 ms step at ML-25M scale.

This kernel replaces all of them with one pass per triplet tile:

  * the compact cluster tables (propagated ‖ initial embeddings, ≤2 MB) are
    VMEM-resident across the whole grid;
  * "gathers" are one-hot × table matmuls on the MXU — the one-hot tile is
    built once in VMEM (never materialized in HBM) and reused by the forward
    AND the backward matmuls (``jax.value_and_grad`` of the tile loss runs
    inside the kernel, so its VJP matmuls hit the same VMEM operands);
  * the per-tile loss contributions and table gradients accumulate in VMEM
    across the sequential TPU grid; only the negative-row gradients stream
    back to HBM (they feed the global item-table scatter, which stays in XLA).

Gather precision note: MXU one-hot selection rounds the gathered values to
bfloat16 (TPU matmul operand precision). This matches the trainer's default
``compute_dtype=bfloat16`` propagation; the golden test bounds the loss error
against the exact-f32 XLA path.

Both loss variants are supported (``loss=`` static arg): "reference"
(utils/train_test.py:18-64 via ops/bpr.py::bpr_loss — reg on initial
embeddings with masked mean over B·d entries, cosine of L2-normalized finals,
score = masked-mean softplus(10Δ)/10, loss = −score + reg) and "standard"
(textbook −log σ(pos−neg) + reg, ops/bpr.py::bpr_loss_standard). Negatives out
of cluster use the analytic ``table_row · readout_scale`` final (see
training/compact.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024          # default triplet rows per grid step
VMEM_BUDGET = 13 * 2**20  # leave headroom under the 16 MB scoped-vmem limit


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile(u_pad: int, i_pad: int, d: int) -> Optional[int]:
    """Largest tile whose VMEM footprint fits, or None when even the smallest
    tile cannot (the resident tables + grad accumulators alone overflow):
    resident state is fixed; the three one-hot tiles scale with the tile size
    (bf16, kept live through the in-kernel backward)."""
    fixed = (u_pad + i_pad) * 2 * d * 4 * 2      # [prop‖init] tables + grads
    for tb in (1024, 512, 256, 128):
        # 1.25: Mosaic reuses the one-hot tiles in the VJP but keeps partial
        # copies live (factor fitted to observed scoped-vmem usage)
        onehot = int(tb * (u_pad + 2 * i_pad) * 2 * 1.25)
        stream = tb * d * 4 * 4                      # ni in, gni out, u/p cats
        if fixed + onehot + stream <= VMEM_BUDGET:
            return tb
    return None


def fused_bpr_supported(u_pad: int, i_pad: int, d: int) -> bool:
    """True when the cluster tables fit the kernel's VMEM budget — callers
    should fall back to the XLA loss path otherwise (more clusters shrink
    u_pad/i_pad and re-enable the kernel)."""
    return _pick_tile(u_pad, i_pad, d) is not None


def _bpr_tile_kernel(s_ref, ul_ref, pl_ref, loc_ref, inc_ref, m_ref,
                     utab_ref, itab_ref, ni_ref,
                     loss_ref, gu_ref, gi_ref, gni_ref,
                     *, d: int, scale: float, tb: int, loss: str):
    """One triplet tile: 3 one-hot MXU gathers + loss + VJP, all in VMEM.

    The tile width ``tb`` is chosen by _pick_tile so the one-hot tiles fit
    VMEM. Index/flag arrays arrive as (N, 1, tb) so every tile choice passes
    Mosaic's int32 layout rules (block (1, 1, tb) == trailing array dims).

    s_ref:    (1, 2) f32 SMEM — [w1, w2] = [−1/(10·count), coeff/(count·d)]
    ul/pl/loc:(1, 1, tb) int32 — user/pos/neg-membership local indices
    inc/m:    (1, 1, tb) int32 — in-cluster flag / validity mask
    utab_ref: (u_pad, 2d) f32 — [propagated ‖ initial] user rows (grid-constant)
    itab_ref: (i_pad, 2d) f32 — [propagated ‖ initial] item rows (grid-constant)
    ni_ref:   (tb, d) f32 — negatives' initial rows (streamed per tile)
    loss/gu/gi: accumulators (revisited every grid step); gni: per-tile block
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        loss_ref[...] = jnp.zeros_like(loss_ref)
        gu_ref[...] = jnp.zeros_like(gu_ref)
        gi_ref[...] = jnp.zeros_like(gi_ref)

    w1 = s_ref[0, 0]
    w2 = s_ref[0, 1]
    ul = ul_ref[0, 0, :]
    pl_i = pl_ref[0, 0, :]
    lc = loc_ref[0, 0, :]
    # Mosaic only reshapes 32-bit types into a new minor dim: lift the int32
    # flags to (TB, 1) f32 and blend arithmetically instead of jnp.where.
    # Scalar reductions also stay 2-D throughout (Mosaic has no 1-D→scalar
    # multi_reduction): per-row sums keep dims and the final masked sum is a
    # (1,TB)×(TB,1) MXU dot.
    incf = inc_ref[0, 0, :][:, None].astype(jnp.float32)
    m2 = m_ref[0, 0, :][:, None].astype(jnp.float32)          # (TB, 1)
    u_pad = utab_ref.shape[0]
    i_pad = itab_ref.shape[0]

    # one-hot tiles: built once on the VPU, reused by forward + VJP matmuls
    oh_u = (ul[:, None] == jax.lax.broadcasted_iota(jnp.int32, (tb, u_pad), 1)
            ).astype(jnp.bfloat16)
    oh_p = (pl_i[:, None] == jax.lax.broadcasted_iota(jnp.int32, (tb, i_pad), 1)
            ).astype(jnp.bfloat16)
    oh_l = (lc[:, None] == jax.lax.broadcasted_iota(jnp.int32, (tb, i_pad), 1)
            ).astype(jnp.bfloat16)

    def mm(oh, tab):
        return jax.lax.dot_general(oh, tab.astype(jnp.bfloat16),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def tile_loss(utab, itab, ni_t):
        u_cat = mm(oh_u, utab)                       # (TB, 2d)
        p_cat = mm(oh_p, itab)
        fl = mm(oh_l, itab[:, :d])                   # propagated half only
        uf, ui = u_cat[:, :d], u_cat[:, d:]
        pf, pi = p_cat[:, :d], p_cat[:, d:]
        nf = incf * fl + (1.0 - incf) * (ni_t * scale)
        # reg on initial embeddings (masked sum; w2 carries the global mean)
        sq = ui * ui + pi * pi + ni_t * ni_t
        reg_rows = jnp.sum(sq, axis=1, keepdims=True)            # (TB, 1)
        if loss == "reference":
            # cosine of normalized finals, softplus(10Δ) (ops/bpr.py::bpr_loss)
            nrm = lambda x: x / jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
            uf, pf, nf = nrm(uf), nrm(pf), nrm(nf)
            gain = 10.0
        else:  # "standard": raw-dot softplus(neg − pos) (bpr_loss_standard)
            gain = -1.0  # sp(gain·(cp−cn)) = sp(cn−cp); w1 flips the sign
        cp = jnp.sum(uf * pf, axis=1, keepdims=True)             # (TB, 1)
        cn = jnp.sum(uf * nf, axis=1, keepdims=True)
        sp_rows = jax.nn.softplus(gain * (cp - cn))              # (TB, 1)
        comb = w1 * sp_rows + w2 * reg_rows                      # (TB, 1)
        l11 = jax.lax.dot_general(m2.T, comb, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return l11[0, 0]

    l, (gu, gi, gni) = jax.value_and_grad(tile_loss, argnums=(0, 1, 2))(
        utab_ref[:], itab_ref[:], ni_ref[:])
    loss_ref[...] = loss_ref[...] + l  # (1,1) store: Mosaic VMEM rejects scalar stores
    gu_ref[...] += gu
    gi_ref[...] += gi
    gni_ref[...] = gni


def _run_kernel(u_tab, i_tab, ni, ul, pl_i, loc, inc, m, w, *, d, scale, loss):
    """Pad to the tile width, launch, unpad. Returns (loss, g_u_tab, g_i_tab, g_ni)."""
    b = ul.shape[0]
    u_pad, two_d = u_tab.shape
    i_pad = i_tab.shape[0]
    tb = _pick_tile(u_pad, i_pad, d)
    if tb is None:
        raise ValueError(
            f"fused BPR kernel: cluster tables (u_pad={u_pad}, i_pad={i_pad}, "
            f"d={d}) exceed the VMEM budget — use more clusters or "
            "fused_bpr=False (compact_cluster_loss falls back automatically)")
    bp = _round_up(b, tb)
    if bp != b:
        pad = bp - b
        ul = jnp.concatenate([ul, jnp.zeros((pad,), jnp.int32)])
        pl_i = jnp.concatenate([pl_i, jnp.zeros((pad,), jnp.int32)])
        loc = jnp.concatenate([loc, jnp.zeros((pad,), jnp.int32)])
        inc = jnp.concatenate([inc, jnp.zeros((pad,), jnp.int32)])
        m = jnp.concatenate([m, jnp.zeros((pad,), jnp.int32)])
        # repeat a real row: padded rows are masked but must not produce NaNs
        ni = jnp.concatenate([ni, jnp.broadcast_to(ni[:1], (pad, d))])
    nb = bp // tb
    as3d = lambda x: x.reshape(nb, 1, tb)

    kern = functools.partial(_bpr_tile_kernel, d=d, scale=scale, tb=tb, loss=loss)
    const = lambda j: (0, 0)
    ints = lambda j: (j, 0, 0)
    rows = lambda j: (j, 0)
    loss, gu, gi, gni = pl.pallas_call(
        kern,
        interpret=(jax.default_backend() == "cpu"),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 2), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tb), ints, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tb), ints, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tb), ints, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tb), ints, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tb), ints, memory_space=pltpu.VMEM),
            pl.BlockSpec((u_pad, two_d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((i_pad, two_d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), rows, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((u_pad, two_d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((i_pad, two_d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), rows, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((u_pad, two_d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, two_d), jnp.float32),
            jax.ShapeDtypeStruct((bp, d), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * 2 * bp * (u_pad + 2 * i_pad) * d,
            bytes_accessed=bp * d * 8 + (u_pad + i_pad) * two_d * 8,
            transcendentals=2 * bp,
        ),
    )(w, as3d(ul), as3d(pl_i), as3d(loc), as3d(inc), as3d(m), u_tab, i_tab, ni)
    return loss[0, 0], gu, gi, gni[:b]


@functools.lru_cache(maxsize=None)
def _make_fused(d: int, scale: float, bpr_coeff: float, loss: str):
    """Build the custom-VJP fused loss for static (d, scale, coeff, loss)."""

    def weights(mask):
        count = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        # reference: loss = −mean(sp(10Δcos))/10 + reg; standard: +mean(sp(−Δ)) + reg
        w1 = (-1.0 / (10.0 * count)) if loss == "reference" else (1.0 / count)
        w2 = bpr_coeff / (count * d)
        return jnp.stack([w1, w2]).reshape(1, 2)

    def pack(fu, u_rows, fi, i_rows):
        return (jnp.concatenate([fu, u_rows], axis=1),
                jnp.concatenate([fi, i_rows], axis=1))

    @jax.custom_vjp
    def fused(fu, u_rows, fi, i_rows, ni, ul, pl_i, loc, inc, mask):
        u_tab, i_tab = pack(fu, u_rows, fi, i_rows)
        out, _, _, _ = _run_kernel(
            u_tab, i_tab, ni, ul, pl_i, loc,
            inc.astype(jnp.int32), mask.astype(jnp.int32), weights(mask),
            d=d, scale=scale, loss=loss)
        return out

    def fwd(fu, u_rows, fi, i_rows, ni, ul, pl_i, loc, inc, mask):
        u_tab, i_tab = pack(fu, u_rows, fi, i_rows)
        out, gu, gi, gni = _run_kernel(
            u_tab, i_tab, ni, ul, pl_i, loc,
            inc.astype(jnp.int32), mask.astype(jnp.int32), weights(mask),
            d=d, scale=scale, loss=loss)
        return out, (gu, gi, gni)

    def bwd(res, ct):
        gu, gi, gni = res
        return (gu[:, :d] * ct, gu[:, d:] * ct,
                gi[:, :d] * ct, gi[:, d:] * ct,
                gni * ct, None, None, None, None, None)

    fused.defvjp(fwd, bwd)
    return fused


def fused_bpr_loss(fu, u_rows, fi, i_rows, ni, user_local, pos_local, loc,
                   in_cluster, mask, *, scale: float, bpr_coeff: float,
                   loss: str = "reference"):
    """BPR loss (ops/bpr.py::bpr_loss / bpr_loss_standard semantics) computed
    by the fused Pallas kernel; differentiable wrt the five embedding args."""
    d = int(fu.shape[1])
    fn = _make_fused(d, float(scale), float(bpr_coeff), loss)
    return fn(fu, u_rows, fi, i_rows, ni, user_local, pos_local, loc,
              in_cluster, mask)
