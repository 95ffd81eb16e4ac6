"""Sparse·dense propagation kernels for LightGCN: ``out = Â @ emb``.

This is THE hot kernel of training (reference models/light_gcn.py:33 → PyG LGConv →
torch-scatter CUDA scatter-add; see SURVEY §3.3). TPU-native paths:

  * :func:`spmm_ell`      — degree-bucketed dense gather + weighted reduction over
                            static ELL blocks. No scatter; XLA lowers the gather to
                            efficient dynamic-gather and fuses the multiply-reduce.
  * ``ops.pallas_spmm``   — hand-tiled Pallas kernel for the same ELL layout.
  * :func:`spmm_segment`  — destination-sorted COO gather + ``segment_sum``; the
                            reference-semantics oracle (golden-test baseline).

Graph containers are registered pytrees whose array fields are traced while the
shape metadata (``num_nodes``) stays static — required because ``segment_sum``'s
segment count and the output row count must be compile-time constants.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import COOGraph, EllGraph


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceCOO:
    """COOGraph on device: dst-sorted edges with static padded length."""

    src: jax.Array   # (E_pad,) int32
    dst: jax.Array   # (E_pad,) int32, sorted ascending
    w: jax.Array     # (E_pad,) float32, zero on padding
    num_nodes: int   # static

    def tree_flatten(self):
        return (self.src, self.dst, self.w), self.num_nodes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_nodes=aux)

    @staticmethod
    def from_host(g: COOGraph) -> "DeviceCOO":
        return DeviceCOO(
            src=jnp.asarray(g.src),
            dst=jnp.asarray(g.dst),
            w=jnp.asarray(g.w),
            num_nodes=g.num_nodes,
        )


class DeviceEllBlock(NamedTuple):
    node_ids: jax.Array  # (rows,) int32
    nbr: jax.Array       # (rows, width) int32 — padding points at row num_nodes
    w: jax.Array         # (rows, width) float32


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceELL:
    """Degree-bucketed ELL adjacency on device (scatter-free propagation)."""

    blocks: Tuple[DeviceEllBlock, ...]
    inv_perm: jax.Array  # (num_nodes,) int32
    num_nodes: int       # static

    def tree_flatten(self):
        return (self.blocks, self.inv_perm), self.num_nodes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(blocks=children[0], inv_perm=children[1], num_nodes=aux)

    @staticmethod
    def from_host(g: EllGraph) -> "DeviceELL":
        return DeviceELL(
            blocks=tuple(
                DeviceEllBlock(jnp.asarray(b.node_ids), jnp.asarray(b.nbr), jnp.asarray(b.w))
                for b in g.blocks
            ),
            inv_perm=jnp.asarray(g.inv_perm),
            num_nodes=g.num_nodes,
        )


def densify_blocks(blk, dst, src, w, num_blocks: int, width: int,
                   dtype=jnp.bfloat16, check: bool | None = None) -> jax.Array:
    """ON-DEVICE scatter-add densification: ``A[blk, dst, src] += w`` into
    dense ``(num_blocks, width, width)`` Â blocks.

    Replaces host-side per-block ``np.bincount`` builds followed by a full
    dense upload: the remote PJRT tunnel moves ~90 MB/s, so at ML-25M scale
    the dense blocks cost ~15 s to ship (1.3 GB bf16) while the COO edges
    behind them are ~70 MB (~1 s) and the on-device scatter is ~0.1 s.
    Accumulation is f32 regardless of the storage ``dtype``. Inputs may be
    1-D (edge-major, ``blk`` per edge) or (num_blocks, E) block-major; they
    are flattened. Padding edges must carry ``w == 0`` and in-range indices —
    under jit, out-of-range scatter indices are silently DROPPED (no loud
    bincount failure like the host build it replaced). Peak-HBM note: the
    scatter accumulates into a transient f32 (num_blocks, width²) buffer
    before the ``dtype`` cast — ~2× the final bf16 array (~2.6 GB at ML-25M
    scale) during graph build.

    ``check=None`` (default) runs a loud host-side range check on
    ``blk``/``dst``/``src`` whenever the index inputs are already host NumPy
    arrays — every build-time call site qualifies, and the vectorized min/max
    is ~ms against a ~25 s graph build, so a malformed partition fails loudly
    instead of being silently dropped by the jitted scatter. Set
    ``MRS_TPU_DEBUG_CHECKS=0`` (or ``check=False``) to opt out, ``=1`` (or
    ``check=True``) to force it even for device-resident inputs.
    """
    env = os.environ.get("MRS_TPU_DEBUG_CHECKS")
    if check is None:
        host_inputs = all(isinstance(a, np.ndarray) for a in (blk, dst, src))
        check = env == "1" or (host_inputs and env != "0")
    if check:
        b = np.asarray(blk).reshape(-1)
        d = np.asarray(dst).reshape(-1)
        s = np.asarray(src).reshape(-1)
        for name, arr, hi in (("blk", b, num_blocks), ("dst", d, width),
                              ("src", s, width)):
            if arr.size and (arr.min() < 0 or arr.max() >= hi):
                raise ValueError(
                    f"densify_blocks: {name} index out of range "
                    f"[{arr.min()}, {arr.max()}] vs [0, {hi}) — malformed "
                    f"padding would be silently dropped under jit")
    return _densify_jit(jnp.asarray(blk), jnp.asarray(dst), jnp.asarray(src),
                        jnp.asarray(w), num_blocks=int(num_blocks),
                        width=int(width), dtype=jnp.dtype(dtype))


@partial(jax.jit, static_argnames=("num_blocks", "width", "dtype"))
def _densify_jit(blk, dst, src, w, *, num_blocks, width, dtype):
    # 2-D operand + (block, flat-cell) index pair keeps every index within
    # int32 even when num_blocks·width² exceeds 2³¹ elements
    flat = dst.astype(jnp.int32) * width + src.astype(jnp.int32)
    dense = jnp.zeros((num_blocks, width * width), jnp.float32)
    dense = dense.at[blk.reshape(-1).astype(jnp.int32), flat.reshape(-1)].add(
        w.reshape(-1).astype(jnp.float32))
    return dense.reshape(num_blocks, width, width).astype(dtype)


def spmm_segment(coo: DeviceCOO, emb: jax.Array) -> jax.Array:
    """Reference-semantics propagation: ``out[d] = Σ_e w[e]·emb[src[e]]``.

    Equivalent math to PyG LGConv's normalized scatter-add (light_gcn.py:33).
    Edges are pre-sorted by destination so XLA can use the sorted segment path.
    """
    gathered = emb[coo.src] * coo.w[:, None].astype(emb.dtype)
    return jax.ops.segment_sum(
        gathered, coo.dst, num_segments=coo.num_nodes,
        indices_are_sorted=True,
    )


def make_spmm_chunked(num_chunks: int):
    """Edge-chunked segment-sum propagation for memory-bounded full-graph steps.

    The plain path materializes the full (E, d) gathered-message tensor — at
    ML-25M with d=128 that is ~12.7 GB per layer and overflows one chip's HBM.
    This variant scans ``num_chunks`` edge blocks, accumulating into the (N, d)
    output, so peak extra memory is (E/num_chunks, d). Edges are dst-sorted, so
    every chunk's scatter-add touches a contiguous row range.
    """

    def spmm_chunked(coo: DeviceCOO, emb: jax.Array) -> jax.Array:
        e_pad = coo.src.shape[0]
        if e_pad % num_chunks != 0:
            raise ValueError(f"padded edge count {e_pad} not divisible by "
                             f"num_chunks={num_chunks}")
        c = e_pad // num_chunks
        src = coo.src.reshape(num_chunks, c)
        dst = coo.dst.reshape(num_chunks, c)
        w = coo.w.reshape(num_chunks, c)

        def body(acc, x):
            s, d, wt = x
            msg = emb[s] * wt[:, None].astype(emb.dtype)
            return acc.at[d].add(msg), None

        acc0 = jnp.zeros((coo.num_nodes, emb.shape[1]), emb.dtype)
        out, _ = jax.lax.scan(body, acc0, (src, dst, w))
        return out

    return spmm_chunked


def spmm_ell(ell: DeviceELL, emb: jax.Array) -> jax.Array:
    """Scatter-free propagation over degree-bucketed ELL blocks.

    For each bucket: gather (rows, width, d) neighbor embeddings, multiply by
    edge weights, reduce over width. Block outputs concatenate in permuted node
    order; a single inverse-permutation gather restores node order.
    """
    emb_pad = jnp.concatenate([emb, jnp.zeros((1, emb.shape[1]), emb.dtype)], axis=0)
    outs: List[jax.Array] = []
    for blk in ell.blocks:
        g = emb_pad[blk.nbr]                      # (rows, width, d)
        outs.append(
            jnp.einsum("rw,rwd->rd", blk.w.astype(emb.dtype), g)
        )
    stacked = jnp.concatenate(outs, axis=0)       # (Σ rows, d)
    return stacked[ell.inv_perm]


# ---------------------------------------------------------------------------
# Hybrid block-diagonal propagation: Â = Â_diag + Â_off, exactly.
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class HybridGraph:
    """Full-graph adjacency split along a node partition.

    Intra-cluster edges (the partitioner keeps ~40-45% of ML-25M's mass in 100
    diagonal blocks) become dense (K, P, P) MXU blocks; the remainder stays a
    dst-sorted COO for the gather path. Edge weights are the GLOBAL GCN
    normalization, so ``spmm_hybrid(h, e) == spmm_segment(full, e)`` up to float
    summation order at ``block_dtype=float32`` — the default bfloat16 blocks
    additionally round intra-cluster operands to bf16 (MXU operand precision,
    f32 accumulation), a ~3-decimal-digit effect golden-tested in
    tests/test_fullgraph.py. The point: TPU gather/scatter costs
    ~24 ns/row regardless of width, so moving 40%+ of the edges from
    per-edge gathers onto the MXU cuts full-graph propagation time by ~40%.

    ``off_ell``, when present, replaces the segment-sum remainder with
    chunked-ELL propagation (:func:`spmm_chunked_ell`): TPU scatter costs ~4×
    a gather per row (measured), so reducing segment rows by the chunk width
    is the single biggest lever on the exact full-graph path (VERDICT r2
    item 2a).
    """

    off: DeviceCOO          # inter-cluster remainder
    ids: jax.Array          # (K, P) int32 — each block's sorted global node ids
    adj: jax.Array          # (K, P, P) — dense Â block, A[k, dst, src]
    num_nodes: int          # static
    off_ell: "ChunkedEll | None" = None
    # node → flat (K·P) block slot (greedy partition: each node sits in at
    # most ONE block) + coverage mask: lets the block-output combine be a
    # permutation GATHER instead of a scatter-add (XLA:TPU lowers a scatter
    # into a big table as a full-table rewrite — training/compact.py note)
    pos: "jax.Array | None" = None    # (N,) int32
    cov: "jax.Array | None" = None    # (N,) bool

    def tree_flatten(self):
        return ((self.off, self.ids, self.adj, self.off_ell, self.pos,
                 self.cov), self.num_nodes)

    @classmethod
    def tree_unflatten(cls, aux, children):
        off, ids, adj, off_ell, pos, cov = children
        return cls(off, ids, adj, num_nodes=aux, off_ell=off_ell,
                   pos=pos, cov=cov)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ChunkedEll:
    """Fixed-width chunked-ELL adjacency (SELL-style) for scatter-light SpMM.

    Each destination row's neighbor list is split into width-``W`` chunks;
    chunks are dst-sorted, so the final combine is a sorted ``segment_sum``
    over ~E/W + N rows instead of E rows. Padding slots point at row
    ``num_nodes`` of a zero-extended input (weight 0).

      nbr:  (C, W) int32 — neighbor ids into the SOURCE table (num_src = padding)
      w:    (C, W) float32
      dst:  (C,)  int32 — chunk's destination row, sorted ascending

    ``num_src`` may differ from ``num_nodes`` (destination rows) for
    rectangular operators — e.g. the mesh path's local-rows × gathered-full
    remainder (parallel/sharding.py).
    """

    nbr: jax.Array
    w: jax.Array
    dst: jax.Array
    num_nodes: int          # static — destination rows
    num_chunks: int         # static (C)
    num_src: int = 0        # static — source rows (0 = num_nodes)

    def tree_flatten(self):
        return ((self.nbr, self.w, self.dst),
                (self.num_nodes, self.num_chunks, self.num_src))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_nodes=aux[0], num_chunks=aux[1],
                   num_src=aux[2])

    @staticmethod
    def build(src: np.ndarray, dst: np.ndarray, w: np.ndarray, num_nodes: int,
              width: int = 16, align: int = 128, num_src: int = 0,
              pad_chunks_to: int = 0) -> "ChunkedEll":
        """Host-side build from (already weighted) COO arrays.

        ``pad_chunks_to`` forces a common chunk count (mesh stacking)."""
        n_src = num_src or num_nodes
        order = np.argsort(dst, kind="stable")
        src_s, dst_s, w_s = (np.asarray(src)[order].astype(np.int64),
                             np.asarray(dst)[order].astype(np.int64),
                             np.asarray(w)[order].astype(np.float32))
        deg = np.bincount(dst_s, minlength=num_nodes)
        rowptr = np.concatenate([[0], np.cumsum(deg)])
        pos = np.arange(dst_s.shape[0], dtype=np.int64) - rowptr[dst_s]
        chunks_per_row = -(-deg // width)               # ceil
        chunk_ptr = np.concatenate([[0], np.cumsum(chunks_per_row)])
        c_true = int(chunk_ptr[-1])
        c_pad = ((max(c_true, 1) + align - 1) // align) * align
        c_pad = max(c_pad, pad_chunks_to)
        nbr = np.full((c_pad, width), n_src, np.int32)
        ww = np.zeros((c_pad, width), np.float32)
        cdst = np.full(c_pad, num_nodes - 1, np.int32)  # pad: last row, w=0
        # edge -> (chunk, lane)
        ch = chunk_ptr[dst_s] + pos // width
        ln = pos % width
        nbr[ch, ln] = src_s
        ww[ch, ln] = w_s
        # chunk -> destination (chunks inherit dst-sorted order)
        row_ids = np.repeat(np.arange(num_nodes, dtype=np.int64), chunks_per_row)
        cdst[:c_true] = row_ids
        return ChunkedEll(nbr=jnp.asarray(nbr), w=jnp.asarray(ww),
                          dst=jnp.asarray(cdst), num_nodes=num_nodes,
                          num_chunks=c_pad, num_src=n_src)


def spmm_chunked_ell(ell: ChunkedEll, emb: jax.Array,
                     slices: int = 8, combine: str = "einsum") -> jax.Array:
    """``Â_off @ emb`` via chunked-ELL: gather (c, W) neighbor rows, weighted
    reduce over W on the VPU, sorted segment-sum over chunk rows.

    ``slices`` bounds the transient (C/slices, W, d) gather buffer (~E·d·4/slices
    bytes); the slice loop is a Python loop over static slices so XLA overlaps
    the slices' gathers and reductions freely.

    ``combine='mulsum'`` replaces the batched (W)·(W, d) dot_general with a
    broadcast multiply + W-axis reduce: same math and summation dtype, but a
    pure VPU elementwise/reduce program that XLA can fuse into the gather
    consumer without dot_general's operand layout transforms (the r5 sharded
    profile shows those as ~12 ms/application of reshape traffic).
    """
    emb_pad = jnp.concatenate(
        [emb, jnp.zeros((1, emb.shape[1]), emb.dtype)], axis=0)
    c = ell.num_chunks
    s = slices if c % slices == 0 else 1
    outs = []
    for i in range(s):
        nbr = ell.nbr[i * (c // s):(i + 1) * (c // s)]
        w = ell.w[i * (c // s):(i + 1) * (c // s)]
        g = emb_pad[nbr]                             # (c/s, W, d)
        # f32 combine regardless of the (possibly bf16) gather dtype: weights
        # STAY f32 (ADVICE r4 — w.astype(emb.dtype) silently rounded them),
        # so a bf16 ``emb`` only rounds the gathered operands; the products
        # promote to f32 and the W-reduce + segment sum accumulate in f32
        if combine == "mulsum":
            outs.append((w.astype(jnp.float32)[:, :, None]
                         * g.astype(jnp.float32)).sum(axis=1))
        else:
            outs.append(jnp.einsum("cw,cwd->cd", w.astype(jnp.float32), g,
                                   preferred_element_type=jnp.float32))
    red = jnp.concatenate(outs, axis=0)              # (C, d) f32
    return jax.ops.segment_sum(red, ell.dst, num_segments=ell.num_nodes,
                               indices_are_sorted=True)


def build_hybrid_graph(
    edge_index: np.ndarray,
    num_nodes: int,
    node_part: np.ndarray,
    num_parts: int,
    align: int = 128,
    block_dtype=jnp.bfloat16,
    max_block_nodes: int = 4096,
    off_format: str = "ell",
    ell_width: int = 16,
) -> HybridGraph:
    """Host-side split of the full (undirected, global-id) edge list.

    ``node_part``: (num_nodes,) part id per node (users ‖ items unified space;
    see data.partition.partition_assignments). ``off_format``: "ell" (default,
    chunked-ELL remainder — scatter rows cut by ``ell_width``) or "coo"
    (segment-sum remainder; the r1/r2 path, kept as the golden oracle).
    """
    from ..data.graph import gcn_norm

    src = edge_index[0].astype(np.int64)
    dst = edge_index[1].astype(np.int64)
    w = gcn_norm(edge_index, num_nodes)          # GLOBAL degrees — exactness
    intra = node_part[src] == node_part[dst]

    off_ell = None
    if off_format == "ell":
        off_ell = ChunkedEll.build(src[~intra], dst[~intra], w[~intra],
                                   num_nodes, width=ell_width)
    elif off_format != "coo":
        raise ValueError(f"unknown off_format {off_format!r}")

    # off-diagonal remainder: dst-sorted, padded COO with zero weights (a
    # 128-edge zero-weight stub when the ELL remainder replaces it — the stub
    # keeps the pytree shape without carrying 3×E_off arrays nobody reads)
    if off_ell is not None:
        o_src = np.zeros(0, np.int64)
        o_dst = np.zeros(0, np.int64)
        o_w = np.zeros(0, np.float32)
    else:
        o_src, o_dst, o_w = src[~intra], dst[~intra], w[~intra]
        order = np.argsort(o_dst, kind="stable")
        o_src, o_dst, o_w = o_src[order], o_dst[order], o_w[order]
    e_pad = ((len(o_src) + align - 1) // align) * align or align
    pad = e_pad - len(o_src)
    if pad:
        o_src = np.concatenate([o_src, np.zeros(pad, np.int64)])
        o_dst = np.concatenate([o_dst, np.full(pad, num_nodes - 1, np.int64)])
        o_w = np.concatenate([o_w, np.zeros(pad, np.float32)])
    off = DeviceCOO(src=jnp.asarray(o_src, jnp.int32),
                    dst=jnp.asarray(o_dst, jnp.int32),
                    w=jnp.asarray(o_w), num_nodes=num_nodes)

    # diagonal blocks: nodes touching >=1 intra edge, per part. Fully
    # vectorized (the r2 per-part np.unique/searchsorted/bincount loop cost
    # ~40 s at ML-25M scale) and densified ON DEVICE (densify_blocks): only
    # the ~77 MB local-index COO crosses the ~90 MB/s remote-PJRT tunnel, not
    # the ~1.3 GB dense block tensor it expands into.
    i_src, i_dst, i_w = src[intra], dst[intra], w[intra]
    k = num_parts
    touched = np.zeros(num_nodes, bool)
    touched[i_src] = True
    touched[i_dst] = True
    tnodes = np.flatnonzero(touched)
    tparts = node_part[tnodes]
    order = np.argsort(tparts, kind="stable")
    tnodes, tparts = tnodes[order], tparts[order]
    counts = np.bincount(tparts, minlength=k)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    ranks = np.arange(tnodes.size, dtype=np.int64) - offsets[tparts]
    p_max = int(counts.max()) if tnodes.size else 1
    p_pad = ((p_max + align - 1) // align) * align
    if p_pad > max_block_nodes:
        raise ValueError(
            f"hybrid block width {p_pad} > {max_block_nodes}: use more parts")
    # pad slots repeat a real (or zero) id: their adj rows/cols stay zero, so
    # the duplicate gather/scatter contributions are exact zeros
    ids_arr = np.zeros((k, p_pad), np.int32)
    ids_arr[tparts, ranks] = tnodes
    for p in range(k):                       # tail-pad only (k tiny O(100))
        c = counts[p]
        if 0 < c < p_pad:
            ids_arr[p, c:] = ids_arr[p, c - 1]
    local = np.zeros(num_nodes, np.int64)
    local[tnodes] = ranks
    adj = densify_blocks(node_part[i_dst], local[i_dst], local[i_src], i_w,
                         num_blocks=k, width=p_pad, dtype=block_dtype)
    # node → flat (K·P) slot for the gather-combine (each node in ≤1 block)
    pos = np.zeros(num_nodes, np.int64)
    pos[tnodes] = tparts * p_pad + ranks
    cov = touched
    return HybridGraph(off=off, ids=jnp.asarray(ids_arr),
                       adj=adj, num_nodes=num_nodes,
                       off_ell=off_ell,
                       pos=jnp.asarray(pos, jnp.int32),
                       cov=jnp.asarray(cov))


def spmm_hybrid(h: HybridGraph, emb: jax.Array) -> jax.Array:
    """``Â @ emb`` via dense MXU diagonal blocks + gather-path remainder
    (chunked-ELL when built with ``off_format='ell'``, segment-sum COO else)."""
    if h.off_ell is not None:
        out = spmm_chunked_ell(h.off_ell, emb)
    else:
        out = spmm_segment(h.off, emb)
    k, p = h.ids.shape
    d = emb.shape[1]
    blk_in = emb[h.ids.reshape(-1)].reshape(k, p, d).astype(h.adj.dtype)
    blk_out = jax.lax.dot_general(
        h.adj, blk_in,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                     # (K, P, d) f32
    if h.pos is not None:
        # each node owns exactly one block slot (pad slots carry zero adj
        # rows), so the combine is a row GATHER — no scatter, no full-table
        # rewrite
        contrib = jnp.where(h.cov[:, None], blk_out.reshape(-1, d)[h.pos],
                            jnp.zeros((), blk_out.dtype))
        return (out + contrib).astype(jnp.float32)
    return out.at[h.ids.reshape(-1)].add(
        blk_out.reshape(-1, d).astype(out.dtype))


def _zero_cotangent(x):
    """float0 for integer leaves (JAX's required int cotangent), zeros else.

    The zeros are dead code — symmetric-spmm callers never differentiate the
    graph — and XLA's DCE removes them; they only satisfy custom_vjp's
    requirement that the returned cotangent matches the primal pytree.
    """
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, jax.dtypes.float0)


def spmm_symmetric(spmm_fn):
    """Wrap ``spmm_fn(graph, emb)`` with a custom VJP that exploits Â = Âᵀ.

    LightGCN's normalized adjacency is symmetric (undirected edge doubling +
    D^{-1/2}AD^{-1/2} weights — reference light_gcn.py:33 semantics), so the
    cotangent of ``Â@E`` is ``Â@g``: the backward pass reuses the same
    forward-optimized kernel (sorted segment-sum / dense MXU blocks) instead of
    the unsorted transpose scatter XLA's autodiff would otherwise emit.

    The graph stays an explicit traced argument (NOT a closure constant — the
    platform's remote-compile path serializes closure constants into the HLO
    payload, which a 25M-scale adjacency overflows).
    """

    @jax.custom_vjp
    def prop(graph, emb):
        return spmm_fn(graph, emb)

    def fwd(graph, emb):
        return spmm_fn(graph, emb), graph

    def bwd(graph, g):
        return jax.tree_util.tree_map(_zero_cotangent, graph), spmm_fn(graph, g)

    prop.defvjp(fwd, bwd)
    return prop


#: symmetric-backward hybrid propagation (the full-graph trainer's kernel)
spmm_hybrid_sym = spmm_symmetric(spmm_hybrid)
#: symmetric-backward segment-sum propagation
spmm_segment_sym = spmm_symmetric(spmm_segment)
