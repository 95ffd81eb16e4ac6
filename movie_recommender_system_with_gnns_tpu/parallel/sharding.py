"""Sharded training + retrieval: row-sharded embedding tables over a (data, model)
mesh with explicit shard_map collectives.

No analog exists in the reference (single device, SURVEY §2.2); this implements
the BASELINE.json north star:

  * embedding tables row-sharded over the ``model`` axis (the tensor-parallel
    analog for embedding-table models);
  * propagation: per-layer ``all_gather`` of table shards over ICI → local
    segment-sum on the edge shard owned by each device (edges partitioned by
    destination row range) — the graph-domain analog of sequence-parallel
    boundary exchange (SURVEY §2.2 SP row);
  * BPR loss data-parallel over the ``data`` axis; gradients flow back through
    the all_gather transposes (reduce-scatter) and are psum'd over ``data``;
  * global-norm clip via cross-shard psum of squared norms, then Adam on local
    shards — numerically identical to the single-device trainer (tested);
  * sharded MIPS retrieval: local top-k per catalog shard + all_gather merge.

Design note: one all_gather of the full (N, d) table per layer is the right
trade at MovieLens scale (N·d ≈ 47 MB in f32 at 25M scale) — neighbor gathers
are all-to-all-ish anyway and ICI all_gather bandwidth beats per-edge RDMA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..data.graph import gcn_norm
from ..models.lightgcn import LightGCNParams
from ..ops.sampling import TripletBatch
from ..ops.spmm import densify_blocks
from ..ops.topk import merge_topk, mips_topk
from .mesh import DATA_AXIS, MODEL_AXIS


class ShardedGraph(NamedTuple):
    """Edge shards stacked over the model axis (leading dim = Pm).

    ``src`` holds GLOBAL padded node ids; ``dst_local`` holds indices into each
    device's local row block (users then items). Zero-weight padding edges make
    all shards the same length.
    """

    src: jax.Array        # (Pm, E_shard) int32, global padded node id
    dst_local: jax.Array  # (Pm, E_shard) int32, sorted per shard
    w: jax.Array          # (Pm, E_shard) float32


@dataclass(frozen=True)
class ShardPlan:
    """Static layout of the padded, sharded problem."""

    num_users: int      # true
    num_items: int      # true
    pm: int             # model-parallel degree
    u_pad: int          # padded user rows (divisible by pm)
    i_pad: int          # padded item rows (divisible by pm)

    @property
    def u_loc(self) -> int:
        return self.u_pad // self.pm

    @property
    def i_loc(self) -> int:
        return self.i_pad // self.pm

    @property
    def n_pad(self) -> int:
        return self.u_pad + self.i_pad

    @staticmethod
    def create(num_users: int, num_items: int, pm: int) -> "ShardPlan":
        rnd = lambda x: ((x + pm - 1) // pm) * pm
        return ShardPlan(num_users, num_items, pm, rnd(num_users), rnd(num_items))


def pad_params(params: LightGCNParams, plan: ShardPlan) -> LightGCNParams:
    """Zero-pad table rows so each divides evenly over the model axis."""
    u = np.asarray(params.user_emb)
    i = np.asarray(params.item_emb)
    u = np.pad(u, ((0, plan.u_pad - u.shape[0]), (0, 0)))
    i = np.pad(i, ((0, plan.i_pad - i.shape[0]), (0, 0)))
    return LightGCNParams(jnp.asarray(u), jnp.asarray(i))


def unpad_params(params: LightGCNParams, plan: ShardPlan) -> LightGCNParams:
    return LightGCNParams(
        params.user_emb[: plan.num_users], params.item_emb[: plan.num_items]
    )


def _to_padded_ids(nodes: np.ndarray, plan: ShardPlan) -> np.ndarray:
    """True node-id space → padded space (items shift up to ``u_pad``)."""
    shift = plan.u_pad - plan.num_users
    return np.where(nodes >= plan.num_users, nodes + shift, nodes)


def _owner_and_local(nodes: np.ndarray, plan: ShardPlan) -> Tuple[np.ndarray, np.ndarray]:
    """Padded-space node id → (owner device, local row index users‖items)."""
    is_item = nodes >= plan.u_pad
    u_owner = nodes // plan.u_loc
    u_local = nodes % plan.u_loc
    it = nodes - plan.u_pad
    i_owner = it // plan.i_loc
    i_local = plan.u_loc + it % plan.i_loc
    return (
        np.where(is_item, i_owner, u_owner),
        np.where(is_item, i_local, u_local),
    )


def _shard_coo_by_dst(src_p: np.ndarray, dst_p: np.ndarray, w: np.ndarray,
                      plan: ShardPlan) -> ShardedGraph:
    """Partition padded-space COO edges by destination owner; equal-length,
    dst-sorted padded shards (pads point at the last local row with w=0)."""
    own, loc = _owner_and_local(dst_p, plan)
    counts = np.bincount(own, minlength=plan.pm)
    e_shard = int(counts.max(initial=1))
    e_shard = ((e_shard + 127) // 128) * 128
    l_rows = plan.u_loc + plan.i_loc
    src_s = np.zeros((plan.pm, e_shard), np.int32)
    dst_s = np.full((plan.pm, e_shard), l_rows - 1, np.int32)
    w_s = np.zeros((plan.pm, e_shard), np.float32)
    # one global (owner, local-dst) sort, then contiguous slices per shard;
    # padding tails stay dst-sorted for free (real dst <= l_rows-1 = pad dst)
    order = np.lexsort((loc, own))
    src_o, loc_o, w_o = src_p[order], loc[order], w[order]
    ofs = np.concatenate([[0], np.cumsum(counts)])
    for p in range(plan.pm):
        k = int(counts[p])
        src_s[p, :k] = src_o[ofs[p]:ofs[p + 1]]
        dst_s[p, :k] = loc_o[ofs[p]:ofs[p + 1]]
        w_s[p, :k] = w_o[ofs[p]:ofs[p + 1]]
    return ShardedGraph(jnp.asarray(src_s), jnp.asarray(dst_s), jnp.asarray(w_s))


def shard_graph(edge_index: np.ndarray, plan: ShardPlan) -> ShardedGraph:
    """Partition edges by destination owner; emit equal-length padded shards.

    Node ids are remapped into the padded space: users keep their id, items
    shift from ``num_users`` up to ``u_pad``. GCN weights are computed BEFORE
    padding/sharding on the true graph, so sharded propagation is bit-equal to
    the single-device path.
    """
    w = gcn_norm(edge_index, plan.num_users + plan.num_items)
    src_p = _to_padded_ids(edge_index[0].astype(np.int64), plan)
    dst_p = _to_padded_ids(edge_index[1].astype(np.int64), plan)
    return _shard_coo_by_dst(src_p, dst_p, w, plan)


class ShardedHybrid(NamedTuple):
    """Hybrid adjacency sharded over the model axis (leading dim = Pm).

    The mesh port of :class:`ops.spmm.HybridGraph` (VERDICT r1 item 1): the
    partitioner's intra-cluster edge mass rides the MXU as dense blocks while
    only the inter-cluster remainder pays the per-edge gather path.

      * ``src``/``dst_local``/``w``: the OFF-diagonal remainder, sharded by
        destination owner exactly like :class:`ShardedGraph`;
      * ``blk_ids``/``blk_adj``: the dense diagonal blocks, dealt round-robin
        over devices. Ids are PADDED-space node ids (block padding repeats the
        last id; its adj row/col is zero). Each device matmuls its blocks
        against the all-gathered layer input and the per-device partial
        outputs reduce-scatter back to local rows.
    """

    src: jax.Array        # (Pm, E_shard) int32 — off-diag, global padded ids
    dst_local: jax.Array  # (Pm, E_shard) int32, sorted per shard
    w: jax.Array          # (Pm, E_shard) float32
    blk_ids: jax.Array    # (Pm, K_loc, P) int32 — padded-space node ids
    blk_adj: jax.Array    # (Pm, K_loc, P, P) — Â[k, dst, src], bf16/f32
    # chunked-ELL remainder (None -> segment-sum over src/dst_local/w):
    ell_nbr: Optional[jax.Array] = None   # (Pm, C, W) int32 into full (n_pad=pad)
    ell_w: Optional[jax.Array] = None     # (Pm, C, W) f32
    ell_dst: Optional[jax.Array] = None   # (Pm, C) int32 local rows, sorted
    # node → flat (K_loc·P) block slot per shard + coverage mask: the block
    # combine becomes a permutation GATHER instead of a scatter-add into the
    # (n_pad, d) contrib buffer (XLA:TPU lowers big-table scatter as a
    # full-table rewrite — training/compact.py note)
    blk_pos: Optional[jax.Array] = None   # (Pm, n_pad) int32
    blk_cov: Optional[jax.Array] = None   # (Pm, n_pad) bool


def shard_hybrid_graph(
    edge_index: np.ndarray,
    plan: ShardPlan,
    node_part: np.ndarray,
    num_parts: int,
    align: int = 128,
    block_dtype=jnp.bfloat16,
    max_block_nodes: int = 4096,
    off_format: str = "ell",
    ell_width: int = 16,
    ghost_cap: int = 0,
) -> ShardedHybrid:
    """Host-side build of the sharded hybrid adjacency.

    ``node_part``: (num_users+num_items,) part id per TRUE node id (users ‖
    items unified space, data.partition.partition_assignments). GCN weights are
    global (true graph), so sharded hybrid propagation equals single-device
    ``ops.spmm.spmm_hybrid`` up to block-dtype rounding and summation order.
    ``off_format='ell'`` (default) lays the off-diagonal remainder out as
    chunked-ELL per shard (ops/spmm.py::ChunkedEll — segment rows cut by the
    chunk width; VERDICT r2 item 2a), stacked to a common chunk count over the
    model axis; 'coo' keeps the r2 segment-sum remainder.

    ``ghost_cap`` > 0 enables GHOST SOURCE COLUMNS (r5, VERDICT r4 item 3):
    each part's dense block gets extra columns for the highest-traffic
    off-part SOURCE nodes (hub items/users whose edges fan into the part),
    filling the block width up to ``min(ghost_cap, max_block_nodes)`` nodes.
    Every absorbed edge moves from the per-row-gather ELL remainder (1.7
    ns/row, the epoch's dominant floor term) onto the MXU block matmul whose
    marginal cost is ~0 until the width cap — on the ML-25M graph this
    converts ~1/3 of the off-diagonal mass at cap 4608. Ghosts are COLUMNS
    only: each edge's dst row stays owned by its primary part, so the
    permutation-gather combine (each OWNED node in exactly one block) and the
    global-operator symmetry (the blocks+remainder sum is exactly Â) are
    both preserved. Absorbed edges are restricted to dsts already in the
    part's key set so width grows by exactly the ghost count.
    """
    from ..ops.spmm import ChunkedEll

    src = edge_index[0].astype(np.int64)
    dst = edge_index[1].astype(np.int64)
    w = gcn_norm(edge_index, plan.num_users + plan.num_items)
    intra = node_part[src] == node_part[dst]

    blk_edge = intra
    part64 = node_part.astype(np.int64)
    n_nodes = plan.num_users + plan.num_items
    if ghost_cap > 0:
        cap = min(int(ghost_cap), int(max_block_nodes))
        # base key sets: (part, node) pairs touched by intra edges
        ik = np.unique(np.concatenate([part64[src[intra]] * n_nodes
                                       + src[intra],
                                       part64[dst[intra]] * n_nodes
                                       + dst[intra]]))
        base_width = np.bincount(ik // n_nodes, minlength=num_parts)
        # candidates: off-diag edges whose dst is already a base key of its
        # own part (true for any dst with >=1 intra edge)
        offm = ~intra
        off_idx = np.flatnonzero(offm)
        dkey = part64[dst[off_idx]] * n_nodes + dst[off_idx]
        if ik.size:
            ins = np.searchsorted(ik, dkey)
            ok = (ins < ik.size) & (ik[np.minimum(ins, ik.size - 1)] == dkey)
        else:
            ok = np.zeros(off_idx.size, bool)
        cand = off_idx[ok]
        ckey = part64[dst[cand]] * n_nodes + src[cand]
        uk, inv, ucnt = np.unique(ckey, return_inverse=True,
                                  return_counts=True)
        uq = uk // n_nodes
        # per-part greedy: the (cap - base_width) highest-count sources
        order = np.lexsort((-ucnt, uq))
        starts = np.searchsorted(uq[order], np.arange(num_parts))
        rank = np.arange(uk.size) - starts[uq[order]]
        budget = np.maximum(cap - base_width, 0)
        sel = np.zeros(uk.size, bool)
        sel[order[rank < budget[uq[order]]]] = True
        absorbed = cand[sel[inv]]
        blk_edge = intra.copy()
        blk_edge[absorbed] = True
        shard_hybrid_graph.last_stats = {
            "ghost_cap": cap,
            "absorbed_edges": int(absorbed.size),
            "off_diag_edges": int(off_idx.size),
            "remainder_edges": int(off_idx.size - absorbed.size),
        }
    else:
        shard_hybrid_graph.last_stats = {
            "ghost_cap": 0,
            "absorbed_edges": 0,
            "off_diag_edges": int((~intra).sum()),
            "remainder_edges": int((~intra).sum()),
        }

    ell = None
    if off_format == "ell":
        o_src = _to_padded_ids(src[~blk_edge], plan)
        o_dst = _to_padded_ids(dst[~blk_edge], plan)
        o_w = w[~blk_edge]
        own, loc = _owner_and_local(o_dst, plan)
        l_rows = plan.u_loc + plan.i_loc
        shards = []
        for p in range(plan.pm):
            m = own == p
            shards.append((o_src[m], loc[m], o_w[m]))
        c_max = 0
        built = []
        for s_p, d_p, w_p in shards:
            e = ChunkedEll.build(s_p, d_p, w_p, l_rows, width=ell_width,
                                 num_src=plan.n_pad)
            built.append(e)
            c_max = max(c_max, e.num_chunks)
        if any(e.num_chunks != c_max for e in built):
            built = [ChunkedEll.build(s_p, d_p, w_p, l_rows, width=ell_width,
                                      num_src=plan.n_pad, pad_chunks_to=c_max)
                     for (s_p, d_p, w_p) in shards]
        ell = (jnp.stack([e.nbr for e in built]),
               jnp.stack([e.w for e in built]),
               jnp.stack([e.dst for e in built]))
        # keep only a 128-edge zero-weight COO stub per shard
        z = np.zeros(0, np.int64)
        off = _shard_coo_by_dst(z, z, np.zeros(0, np.float32), plan)
    elif off_format == "coo":
        off = _shard_coo_by_dst(_to_padded_ids(src[~blk_edge], plan),
                                _to_padded_ids(dst[~blk_edge], plan),
                                w[~blk_edge], plan)
    else:
        raise ValueError(f"unknown off_format {off_format!r}")

    # dense diagonal blocks in PADDED id space, one per part. Each part's node
    # set and the edges' local indices come from ONE global unique/searchsorted
    # over (part, node) composite keys instead of a per-part Python loop, and
    # the blocks themselves are scatter-added on device (ops.spmm.
    # densify_blocks) — shipping ~70 MB of COO through the PJRT tunnel instead
    # of the ~1.3 GB dense array it expands into.
    i_src = _to_padded_ids(src[blk_edge], plan)
    i_dst = _to_padded_ids(dst[blk_edge], plan)
    i_w = w[blk_edge]
    # part of the edge = the DST's part (== both ends for intra edges; ghost
    # edges put the off-part SOURCE into the dst part's column set)
    ep = node_part[dst[blk_edge]].astype(np.int64)
    npad = plan.n_pad
    keys = np.unique(np.concatenate([ep * npad + i_src, ep * npad + i_dst]))
    bounds = np.searchsorted(keys // npad, np.arange(num_parts + 1))
    counts = np.diff(bounds)
    p_max = max(int(counts.max(initial=1)), 1)
    p_pad = ((p_max + align - 1) // align) * align
    if p_pad > max_block_nodes:
        raise ValueError(
            f"sharded hybrid block width {p_pad} > {max_block_nodes}: use "
            "more parts")
    # round the block count up to a multiple of pm; filler blocks are all-zero
    k_tot = ((num_parts + plan.pm - 1) // plan.pm) * plan.pm
    ids_arr = np.zeros((k_tot, p_pad), np.int32)
    for p in range(num_parts):
        c = int(counts[p])
        if c:
            ids_arr[p, :c] = keys[bounds[p]:bounds[p + 1]] % npad
            ids_arr[p, c:] = ids_arr[p, c - 1]   # edge-pad: repeat the last id
    ls = np.searchsorted(keys, ep * npad + i_src) - bounds[ep]
    ld = np.searchsorted(keys, ep * npad + i_dst) - bounds[ep]
    blk_adj = densify_blocks(ep.astype(np.int32), ld.astype(np.int32),
                             ls.astype(np.int32), i_w.astype(np.float32),
                             num_blocks=k_tot, width=p_pad, dtype=block_dtype)
    k_loc = k_tot // plan.pm
    blk_pos = np.zeros((plan.pm, npad), np.int32)
    blk_cov = np.zeros((plan.pm, npad), bool)
    # padded-id → part lookup for the ownership filter below (ghost columns
    # appear in FOREIGN parts' key sets; only the OWNING part may claim a
    # node's output position, else a later part's ghost entry would clobber it)
    part_of_padded = np.full(npad, -1, np.int64)
    part_of_padded[_to_padded_ids(np.arange(n_nodes, dtype=np.int64),
                                  plan)] = part64
    for p in range(num_parts):
        nodes = (keys[bounds[p]:bounds[p + 1]] % npad).astype(np.int64)
        pos_in_blk = np.arange(nodes.size, dtype=np.int64)
        owned = part_of_padded[nodes] == p
        nodes, pos_in_blk = nodes[owned], pos_in_blk[owned]
        if nodes.size:
            m, kl = divmod(p, k_loc)
            blk_pos[m, nodes] = kl * p_pad + pos_in_blk
            blk_cov[m, nodes] = True
    return ShardedHybrid(
        src=off.src, dst_local=off.dst_local, w=off.w,
        blk_ids=jnp.asarray(ids_arr.reshape(plan.pm, k_loc, p_pad)),
        blk_adj=blk_adj.reshape(plan.pm, k_loc, p_pad, p_pad),
        ell_nbr=None if ell is None else ell[0],
        ell_w=None if ell is None else ell[1],
        ell_dst=None if ell is None else ell[2],
        blk_pos=jnp.asarray(blk_pos),
        blk_cov=jnp.asarray(blk_cov),
    )


def _hybrid_shard(graph: ShardedHybrid):
    """Per-device slice of a ShardedHybrid (inside shard_map the leading model
    axis is 1)."""
    e = graph.ell_nbr
    pos = graph.blk_pos
    return (graph.src[0], graph.dst_local[0], graph.w[0],
            graph.blk_ids[0], graph.blk_adj[0],
            None if e is None else graph.ell_nbr[0],
            None if e is None else graph.ell_w[0],
            None if e is None else graph.ell_dst[0],
            None if pos is None else graph.blk_pos[0],
            None if pos is None else graph.blk_cov[0])


def _hybrid_specs(off_ell: bool = True, has_pos: bool = True):
    p = P(MODEL_AXIS)
    tail = [p, p, p] if off_ell else [None, None, None]
    pose = [p, p] if has_pos else [None, None]
    return ShardedHybrid(p, p, p, p, p, *tail, *pose)


def pad_batch(batch: TripletBatch, pd: int) -> TripletBatch:
    """Pad the triplet batch so it divides evenly over the data axis."""
    b = batch.user.shape[0]
    pad = (-b) % pd
    if pad == 0:
        return batch
    z = lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
    return TripletBatch(z(batch.user), z(batch.pos_item), z(batch.mask))


def _spec_like_params(leaf_shape_to_spec):
    def f(leaf):
        return leaf_shape_to_spec(leaf)
    return f


def state_specs(state, plan: ShardPlan):
    """PartitionSpec pytree for a TrainState: table-shaped leaves row-shard over
    'model'; everything else replicates."""
    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 2 and shape[0] in (plan.u_pad, plan.i_pad):
            return P(MODEL_AXIS, None)
        return P()
    return jax.tree.map(spec, state)


def _make_local_propagates(cfg: Config, plan: ShardPlan, symmetric: bool):
    """Shared K-layer sharded propagation closures (run INSIDE shard_map over
    the model axis). Returns ``(local_propagate, local_propagate_hybrid)``;
    both map local table shards → local FINAL rows. Used by the train step and
    by :func:`make_sharded_propagate` (serving/eval tables) so the two paths
    cannot drift."""
    num_layers = cfg.model.num_layers
    readout = cfg.model.readout
    spmm_chunks = max(int(getattr(cfg.train, "spmm_chunks", 1)), 1)
    # gather-source dtype. compute_dtype="bfloat16" rounds only the gathered
    # operands (f32 edge weights promote the products, so all accumulations
    # still sum in f32). MEASURED r4 on v5e: bf16 sources are SLOWER
    # (sharded epoch 3.60 → 4.80 s) — the per-edge gathers are row-op bound,
    # not bandwidth bound, and bf16 (16,128)-tiled rows gather slower than
    # f32 — so the default stays float32; the knob remains for narrower-HBM
    # targets.
    cdtype = jnp.dtype(cfg.model.compute_dtype)

    def local_propagate(u_shard, i_shard, src, dst_local, w):
        """K layers of (all_gather → local segment-sum); returns local final rows.

        With ``cfg.train.spmm_chunks > 1`` the per-layer gather runs as an
        edge-chunked scan so the (E_shard, d) message tensor never materializes
        (the milestone-3 big-model regime: d=128 at ML-25M scale)."""
        l_rows = plan.u_loc + plan.i_loc

        def gather_full(u_loc_rows, i_loc_rows):
            uf = jax.lax.all_gather(u_loc_rows, MODEL_AXIS, axis=0, tiled=True)
            itf = jax.lax.all_gather(i_loc_rows, MODEL_AXIS, axis=0, tiled=True)
            # cast BEFORE the per-edge gathers (see cdtype note above)
            return jnp.concatenate([uf, itf], axis=0).astype(cdtype)

        def layer(full):
            if spmm_chunks == 1 or src.shape[0] % spmm_chunks != 0:
                msg = full[src] * w[:, None]
                return jax.ops.segment_sum(msg, dst_local, num_segments=l_rows,
                                           indices_are_sorted=True)
            c = src.shape[0] // spmm_chunks
            xs = (src.reshape(spmm_chunks, c), dst_local.reshape(spmm_chunks, c),
                  w.reshape(spmm_chunks, c))

            def body(acc, x):
                s, d, wt = x
                return acc.at[d].add(full[s] * wt[:, None]), None

            # init carry derived from `full` so its varying-axes match the body
            # output under shard_map's vma typecheck (cf. ops/topk.py); f32
            # regardless of the (possibly bf16) gather dtype — the message
            # products promote to f32, so the accumulator must match
            z = jnp.where(jnp.isnan(full[0, 0].astype(jnp.float32)), 0.0, 0.0)
            acc0 = jnp.broadcast_to(z, (l_rows, full.shape[1]))
            out, _ = jax.lax.scan(body, acc0, xs)
            return out

        u_cur, i_cur = u_shard, i_shard
        acc_u, acc_i = u_shard, i_shard
        for _ in range(num_layers):
            full = gather_full(u_cur, i_cur)
            out = layer(full)
            u_cur, i_cur = out[: plan.u_loc], out[plan.u_loc:]
            acc_u = acc_u + u_cur
            acc_i = acc_i + i_cur
        k1 = num_layers + 1
        scale = 1.0 / (k1 * k1) if readout == "reference" else 1.0 / k1
        return acc_u * scale, acc_i * scale

    def _hybrid_layer(garr, uv):
        """One hybrid layer on the mesh: all_gather → (local off-diag
        chunked-ELL or segment-sum) + (dense MXU blocks → reduce_scatter).
        Self-adjoint as a GLOBAL linear operator when Â = Âᵀ, so
        :func:`ops.spmm.spmm_symmetric` can reuse it verbatim as its own
        backward."""
        from ..ops.spmm import ChunkedEll, spmm_chunked_ell

        src, dst_local, w, ids, adj, enbr, ew, edst, pos, cov = garr
        u_cur, i_cur = uv
        uf = jax.lax.all_gather(u_cur, MODEL_AXIS, axis=0, tiled=True)
        itf = jax.lax.all_gather(i_cur, MODEL_AXIS, axis=0, tiled=True)
        # cast BEFORE the ELL/block gathers (see cdtype note above); f32 w
        # promotes the products, so sums still accumulate in f32
        full = jnp.concatenate([uf, itf], axis=0).astype(cdtype)
        d = full.shape[1]
        l_rows = plan.u_loc + plan.i_loc
        if enbr is not None:
            ell = ChunkedEll(nbr=enbr, w=ew, dst=edst, num_nodes=l_rows,
                             num_chunks=int(enbr.shape[0]),
                             num_src=plan.n_pad)
            off = spmm_chunked_ell(ell, full)
        else:
            off = jax.ops.segment_sum(full[src] * w[:, None], dst_local,
                                      num_segments=l_rows,
                                      indices_are_sorted=True)
        k_loc, p = ids.shape
        blk_in = full[ids.reshape(-1)].reshape(k_loc, p, d).astype(adj.dtype)
        blk_out = jax.lax.dot_general(
            adj, blk_in,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                     # (K_loc, P, d) f32
        if pos is not None:
            # permutation-gather combine (each node sits in ≤1 block of this
            # shard; pad slots carry zero adj rows) — no big-table scatter
            contrib = jnp.where(cov[:, None], blk_out.reshape(-1, d)[pos],
                                jnp.zeros((), blk_out.dtype))
        else:
            contrib = jnp.zeros((plan.n_pad, d), blk_out.dtype).at[
                ids.reshape(-1)].add(blk_out.reshape(-1, d))
        # per-device partial block outputs land on whichever device owns the
        # row: reduce_scatter converts (n_pad, d) partials to owned local rows
        cu = jax.lax.psum_scatter(contrib[: plan.u_pad], MODEL_AXIS,
                                  scatter_dimension=0, tiled=True)
        ci = jax.lax.psum_scatter(contrib[plan.u_pad:], MODEL_AXIS,
                                  scatter_dimension=0, tiled=True)
        return off[: plan.u_loc] + cu, off[plan.u_loc:] + ci

    if symmetric:
        from ..ops.spmm import spmm_symmetric

        _hybrid_layer_fn = spmm_symmetric(_hybrid_layer)
    else:
        _hybrid_layer_fn = _hybrid_layer

    def local_propagate_hybrid(u_shard, i_shard, garr):
        u_cur, i_cur = u_shard, i_shard
        acc_u, acc_i = u_shard, i_shard
        for _ in range(num_layers):
            u_cur, i_cur = _hybrid_layer_fn(garr, (u_cur, i_cur))
            acc_u = acc_u + u_cur
            acc_i = acc_i + i_cur
        k1 = num_layers + 1
        scale = 1.0 / (k1 * k1) if readout == "reference" else 1.0 / k1
        return acc_u * scale, acc_i * scale

    return local_propagate, local_propagate_hybrid


def make_sharded_propagate(
    cfg: Config,
    mesh: Mesh,
    plan: ShardPlan,
    hybrid: bool = False,
    symmetric: bool = False,
    off_ell: bool = True,
):
    """Jitted sharded K-layer propagation for SERVING / full-ranking eval
    (round-1 verdict item 7): ``fn(padded_params, graph) -> LightGCNParams``
    of FINAL propagated tables, still padded and row-sharded over 'model' so
    downstream sharded MIPS/eval consume them without a host round-trip.

    ``graph`` is a :class:`ShardedGraph` (default gather path — serving
    propagation runs once per checkpoint, not hot) or :class:`ShardedHybrid`
    with ``hybrid=True``. Numerically equal to the single-device
    ``serving.recommend.compute_serving_tables(mode='propagated')``
    (tests/test_sharding.py)."""
    lp, lph = _make_local_propagates(cfg, plan, symmetric)

    def fwd(params: LightGCNParams, graph):
        if hybrid:
            gs = _hybrid_shard(graph)
            fu_loc, fi_loc = lph(params.user_emb, params.item_emb, gs)
        else:
            fu_loc, fi_loc = lp(params.user_emb, params.item_emb,
                                graph.src[0], graph.dst_local[0], graph.w[0])
        return LightGCNParams(fu_loc, fi_loc)

    table_spec = LightGCNParams(P(MODEL_AXIS, None), P(MODEL_AXIS, None))
    if hybrid:
        graph_specs = _hybrid_specs(off_ell)
    else:
        graph_specs = ShardedGraph(P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS))
    fn = jax.shard_map(fwd, mesh=mesh, in_specs=(table_spec, graph_specs),
                       out_specs=table_spec)
    return jax.jit(fn)


def make_sharded_train_step(
    cfg: Config,
    mesh: Mesh,
    plan: ShardPlan,
    opt: Optional[optax.GradientTransformation] = None,
    hybrid: bool = False,
    symmetric: Optional[bool] = None,
    off_ell: bool = True,
):
    """Build the shard_map'd train step.

    Signature: ``step(state, graph, batch, neg) -> (state, loss)`` where state
    holds PADDED tables and ``graph`` is a :class:`ShardedGraph` (gather-path
    propagation) or, with ``hybrid=True``, a :class:`ShardedHybrid` (dense
    MXU diagonal blocks + gather remainder — the single-chip fullgraph
    trainer's kernel ported to the mesh). ``symmetric`` enables the
    symmetric-Â custom VJP per layer (backward reuses the forward collective
    program; requires a mirror-complete edge list —
    ``data.graph.adjacency_is_symmetric``); None defaults to
    ``cfg.train.symmetric_vjp``. Numerically matches the single-device
    trainers (tests/test_sharding.py).
    """
    if opt is None:
        opt = optax.adam(cfg.train.lr, b1=cfg.train.adam_b1, b2=cfg.train.adam_b2,
                         eps=cfg.train.adam_eps)
    pm = plan.pm
    if symmetric is None:
        symmetric = bool(cfg.train.symmetric_vjp)
    local_propagate, local_propagate_hybrid = _make_local_propagates(
        cfg, plan, symmetric)

    # Why no fused Pallas BPR here (it IS wired into the compact trainers,
    # incl. data-parallel): the kernel keeps the [propagated ‖ initial] tables
    # VMEM-resident across its grid (ops/pallas_bpr.py), which works because a
    # compact cluster's tables are ≤2 MB. This trainer's loss runs on the
    # FULL-catalog gathered tables — (U+I)·2d·4 ≈ 227 MB at ML-25M d=64 —
    # 14× over the 16 MB VMEM ceiling, so fused_bpr_supported() is
    # structurally never true at the scales this path exists for. The
    # fused-gather trick below recovers most of the win on the XLA path.
    def local_loss(params: LightGCNParams, graph_shard, batch: TripletBatch,
                   neg: jax.Array) -> jax.Array:
        if hybrid:
            fu_loc, fi_loc = local_propagate_hybrid(
                params.user_emb, params.item_emb, graph_shard)
        else:
            src, dst_local, w = graph_shard
            fu_loc, fi_loc = local_propagate(params.user_emb, params.item_emb,
                                             src, dst_local, w)
        # full final tables for triplet gathers (replicated over 'model')
        fu = jax.lax.all_gather(fu_loc, MODEL_AXIS, axis=0, tiled=True)
        fi = jax.lax.all_gather(fi_loc, MODEL_AXIS, axis=0, tiled=True)
        u0 = jax.lax.all_gather(params.user_emb, MODEL_AXIS, axis=0, tiled=True)
        i0 = jax.lax.all_gather(params.item_emb, MODEL_AXIS, axis=0, tiled=True)

        # fused (final ‖ initial) gather pairs: TPU gather cost is per-ROW
        # (width-independent up to 128 lanes), so one 2d-wide gather per index
        # set halves the row-op count vs separate final/initial gathers (the
        # same fusion the compact trainer uses, training/compact.py).
        # MEASURED r5 (profile-guided attempt, then reverted): replacing
        # these gathers' AD scatter-add transpose (29.4 ms/step self-time at
        # ~10.7 GB/s in the trace) with a sorted-segment custom VJP left the
        # epoch wall unchanged (3.60 → 3.64 s) — the scatter overlaps the
        # propagation's gather traffic, so its self-time is not critical-path
        # time — and custom_vjp opacity breaks shard_map's varying-axes
        # inference. Plain AD stays.
        d = fu.shape[1]
        u_cat = jnp.concatenate([fu, u0], axis=1)[batch.user]
        uf, ui = u_cat[:, :d], u_cat[:, d:]
        i_cat = jnp.concatenate([fi, i0], axis=1)
        p_cat = i_cat[batch.pos_item]
        pf, pi = p_cat[:, :d], p_cat[:, d:]
        n_cat = i_cat[neg]                      # (B, 2d) or (B, K, 2d)
        nf, ni = n_cat[..., :d], n_cat[..., d:]
        if ni.ndim == 3:                        # K>1: pairwise/reg avg over K
            ni2 = jnp.mean(ni**2, axis=1)       # (ops/bpr.py semantics)
        else:
            ni2 = ni**2
        # masked SUMS so cross-device averaging is exact under uneven masks
        m = batch.mask.astype(jnp.float32)
        cnt = jnp.maximum(jax.lax.psum(jnp.sum(m), DATA_AXIS), 1.0)

        sq = ((ui**2 + pi**2 + ni2) * m[:, None]).sum() / (ui.shape[1])
        reg = cfg.train.bpr_coeff * jax.lax.psum(sq, DATA_AXIS) / cnt

        if cfg.train.loss == "standard":        # textbook −log σ(⟨u,p⟩−⟨u,n⟩)
            pos = jnp.sum(uf * pf, axis=-1)
            if nf.ndim == 3:
                ng = jnp.sum(uf[:, None, :] * nf, axis=-1)        # (B, K)
                pair = jnp.mean(jax.nn.softplus(ng - pos[:, None]), axis=1)
            else:
                pair = jax.nn.softplus(jnp.sum(uf * nf, axis=-1) - pos)
            loss = jax.lax.psum((pair * m).sum(), DATA_AXIS) / cnt + reg
        else:                                   # reference cosine-softplus
            nrm = lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True)
            cp = jnp.sum(nrm(uf) * nrm(pf), axis=-1)
            if nf.ndim == 3:
                cn = jnp.sum(nrm(uf)[:, None, :] * nrm(nf), axis=-1)  # (B, K)
                pair = jnp.mean(jax.nn.softplus(10.0 * (cp[:, None] - cn)),
                                axis=1)
            else:
                cn = jnp.sum(nrm(uf) * nrm(nf), axis=-1)
                pair = jax.nn.softplus(10.0 * (cp - cn))
            score = jax.lax.psum((pair * m).sum(), DATA_AXIS) / cnt / 10.0
            loss = -score + reg
        # replicated over 'model': average over the axis so AD through the
        # all_gather transposes sums to exactly the true gradient
        return jax.lax.psum(loss, MODEL_AXIS) / pm

    def step(state, graph, batch: TripletBatch, neg: jax.Array):
        params, opt_state, count = state
        if hybrid:
            graph_shard = _hybrid_shard(graph)
        else:
            graph_shard = (graph.src[0], graph.dst_local[0], graph.w[0])
        loss, grads = jax.value_and_grad(local_loss)(params, graph_shard, batch, neg)
        # No explicit data-axis grad reduction here: local_loss psums its
        # masked SUMS over 'data', and shard_map AD transposes that psum into
        # a cotangent psum — so each device's grad already includes every
        # data shard's batch contribution. An extra psum(g, 'data') would
        # multiply grads by dp (a uniform factor the global-norm clip + Adam
        # silently absorb, which is how it once hid; caught by the unclipped
        # SGD parity test in tests/test_sharding.py).
        # the global-norm clip needs the cross-shard norm (torch clip
        # semantics, train_test.py:95)
        sq = sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))
        gsq = jax.lax.psum(sq, MODEL_AXIS)  # shards are disjoint over 'model'
        gn = jnp.sqrt(gsq)
        scale = jnp.minimum(1.0, cfg.train.grad_clip_norm / jnp.maximum(gn, 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, count + 1), loss

    # ---- wire shard_map ----
    def build(state_template, jit: bool = True):
        st_specs = state_specs(state_template, plan)
        if hybrid:
            graph_specs = _hybrid_specs(off_ell)
        else:
            graph_specs = ShardedGraph(P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS))
        batch_specs = TripletBatch(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))
        fn = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(st_specs, graph_specs, batch_specs, P(DATA_AXIS)),
            out_specs=(st_specs, P()),
        )
        return jax.jit(fn) if jit else fn

    return build


def make_sharded_epoch_fn(
    cfg: Config,
    mesh: Mesh,
    plan: ShardPlan,
    opt: Optional[optax.GradientTransformation] = None,
    hybrid: bool = True,
    symmetric: Optional[bool] = None,
    off_ell: bool = True,
):
    """Fused sharded epoch: shuffle all train positives on device, then scan
    ``num_steps`` shard_map'd train steps in ONE compiled program — the mesh
    analog of the single-chip fullgraph epoch (training/fullgraph.py).

    Returns ``build(state_template) -> epoch_fn(state, graph, user, pos_item,
    key)`` where ``user``/``pos_item`` are ALL train positives padded to a
    multiple of the lane-aligned batch (padding masked out of the loss), and
    ``graph`` is a :class:`ShardedHybrid` (default) or :class:`ShardedGraph`.
    """
    from functools import partial

    from ..ops.sampling import sample_negative

    step_builder = make_sharded_train_step(cfg, mesh, plan, opt=opt,
                                           hybrid=hybrid, symmetric=symmetric,
                                           off_ell=off_ell)
    pd_axis = mesh.shape[DATA_AXIS]

    def build(state_template):
        sharded_step = step_builder(state_template, jit=False)

        @partial(jax.jit, donate_argnums=(0,),
                 static_argnames=("e_real", "num_steps", "batch"))
        def epoch_inner(state, graph, user, pos_item, key, *,
                        e_real: int, num_steps: int, batch: int):
            pkey, skey = jax.random.split(key)
            perm = jax.random.permutation(pkey, e_real).astype(jnp.int32)
            idx = jnp.concatenate(
                [perm, jnp.arange(e_real, num_steps * batch, dtype=jnp.int32)])
            u = user[idx].reshape(num_steps, batch)
            p = pos_item[idx].reshape(num_steps, batch)
            m = (idx < e_real).reshape(num_steps, batch)
            keys = jax.random.split(skey, num_steps)

            def body(st, x):
                uu, pp, mm, k = x
                neg = sample_negative(k, batch, plan.num_items,
                                      cfg.train.num_negatives)
                tb = TripletBatch(user=uu, pos_item=pp, mask=mm)
                st, loss = sharded_step(st, graph, tb, neg)
                return st, loss * mm.sum()

            st, wlosses = jax.lax.scan(body, state, (u, p, m, keys))
            return st, jnp.sum(wlosses) / e_real

        def epoch_fn(state, graph, user, pos_item, key):
            e_real = int(user.shape[0])  # caller may pre-pad; see pad helper
            # lane-aligned static batch from the fullgraph steps knob
            batch = -(-e_real // max(1, cfg.train.fullgraph_steps))
            if cfg.train.batch_size:
                batch = int(cfg.train.batch_size)
            batch = ((batch + 1023) // 1024) * 1024
            batch = max(batch, pd_axis * 8)
            num_steps = max(1, -(-e_real // batch))
            pad = num_steps * batch - e_real
            if pad:
                user = jnp.concatenate([user, jnp.zeros((pad,), user.dtype)])
                pos_item = jnp.concatenate(
                    [pos_item, jnp.zeros((pad,), pos_item.dtype)])
            # expose the compiled program's static plan so benchmarks can AOT
            # lower the SAME program for XLA cost analysis (bench.py MFU/HBM)
            epoch_fn.last_plan = dict(e_real=e_real, num_steps=num_steps,
                                      batch=batch)
            return epoch_inner(state, graph, user, pos_item, key,
                               e_real=e_real, num_steps=num_steps, batch=batch)

        epoch_fn.inner = epoch_inner
        return epoch_fn

    return build


def make_sharded_mips(mesh: Mesh, k: int = 10, block: int = 8192):
    """Sharded MIPS retrieval: catalog row-sharded over 'model', queries
    replicated; local blocked top-k then global candidate merge."""

    def local(query, catalog_shard):
        my = jax.lax.axis_index(MODEL_AXIS)
        rows = catalog_shard.shape[0]
        s, i = mips_topk(query, catalog_shard, k=k, block=min(block, max(rows, 128)))
        i = i + my * rows                             # globalize indices
        # emit per-shard candidates stacked over the sharded axis; the global
        # merge happens outside the shard_map in the same jit program
        return s[None], i[None]                        # (1, Q, k) per shard

    inner = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None)),
        out_specs=(P(MODEL_AXIS), P(MODEL_AXIS)),
    )

    @jax.jit
    def fn(query, catalog):
        all_s, all_i = inner(query, catalog)           # (Pm, Q, k)
        return merge_topk(all_s, all_i, k)

    return fn
