"""Compact-cluster trainer: per-cluster node compaction for Cluster-GCN steps.

The reference trains each Cluster-GCN step over the FULL node-id space — every
cluster's edge_index is remapped back to global ids and propagation allocates
(U+I, d) tensors per layer (reference data/dataset_handler.py:277-282,
models/light_gcn.py:29-36). That wastes ~50× memory bandwidth when a cluster
touches only ~1% of nodes: measured 26 ms/step at ML-25M scale on a v5e.

This module keeps the reference's exact math while propagating in the cluster's
COMPACT node space:

  * gather the cluster's user/item rows from the global tables (one gather per
    table — AD turns it into one scatter-add per table on backward);
  * run the K-layer propagation over local ids (tiny tensors);
  * negatives stay reference-semantics: sampled uniformly over the FULL item
    catalog (helpers.py:79-80). An out-of-cluster negative receives no messages
    under cluster propagation, so its final embedding is analytically
    ``table_row · readout_scale`` — in-cluster negatives use the propagated
    row, resolved by a searchsorted membership probe. Equivalence with the
    full-space path is proven in tests/test_compact.py.

The whole epoch runs as one ``lax.scan`` over stacked compact clusters (same
fusion as training.train.make_epoch_fn).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.graph import gcn_norm
from ..models.lightgcn import LightGCNParams
from ..ops.bpr import bpr_loss, select_bpr_loss
from ..ops.sampling import sample_negative
from .train import TrainState, make_optimizer


@jax.tree_util.register_pytree_node_class
class CompactClusters:
    """Stacked compact cluster batches (leading axis = cluster).

    ``user_ids``/``item_ids`` are each cluster's sorted global user/item
    indices, padded with the LAST valid id repeated (duplicate gathers are
    harmless; padded rows receive zero edge weight and masked triplets, so
    their gradient contribution is exactly zero).
    """

    def __init__(self, user_ids, item_ids, src, dst, w, user_local, pos_local,
                 mask, edge_counts, user_valid, item_valid, u_pad, i_pad,
                 adj=None, user_cluster=None, user_slot=None,
                 users_disjoint=True, member_table=None, corr=None,
                 neg_rest=None):
        self.user_ids, self.item_ids = user_ids, item_ids          # (K, Upad), (K, Ipad)
        self.src, self.dst, self.w = src, dst, w                   # (K, Epad)
        self.user_local, self.pos_local = user_local, pos_local    # (K, B)
        self.mask = mask                                           # (K, B)
        self.edge_counts = edge_counts                             # (K,)
        self.user_valid, self.item_valid = user_valid, item_valid  # (K, Upad/Ipad)
        self.u_pad, self.i_pad = u_pad, i_pad                      # static
        # optional densified Â per cluster (K, n_local, n_local): turns the
        # propagation into pure MXU matmuls (see densify_adjacency)
        self.adj = adj
        # inverse user map for the hybrid_adam write-back-by-gather:
        # user_cluster[u] = owning cluster (or -1), user_slot[u] = row inside
        # that cluster's user_ids. Valid only when ``users_disjoint`` (each
        # user's edges in exactly one cluster — greedy node partition).
        self.user_cluster, self.user_slot = user_cluster, user_slot  # (U,)
        self.users_disjoint = users_disjoint                       # static
        # sorted (2, L) int32 train-pair table (ops.sampling.build_member_table)
        # — present iff negatives='feasible' (exact rejection resampling)
        self.member_table = member_table
        # frozen boundary-embedding correction (VERDICT r4 item 1): per
        # cluster+layer inter-cluster message term (K, L, n_local, d) and the
        # frozen neighbor accumulator Σ_{l≥1} x_l for the ITEM table (I, d) —
        # rebuilt from the full-graph propagation at every refresh
        # (build_boundary_correction). None = uncorrected Cluster-GCN
        # semantics (the reference's compromise, dataset_handler.py:256-288).
        self.corr = corr
        self.neg_rest = neg_rest

    def tree_flatten(self):
        return ((self.user_ids, self.item_ids, self.src, self.dst, self.w,
                 self.user_local, self.pos_local, self.mask, self.edge_counts,
                 self.user_valid, self.item_valid, self.adj,
                 self.user_cluster, self.user_slot, self.member_table,
                 self.corr, self.neg_rest),
                (self.u_pad, self.i_pad, self.users_disjoint))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:-6], u_pad=aux[0], i_pad=aux[1],
                   adj=children[-6], user_cluster=children[-5],
                   user_slot=children[-4], users_disjoint=aux[2],
                   member_table=children[-3], corr=children[-2],
                   neg_rest=children[-1])

    def with_correction(self, corr, neg_rest) -> "CompactClusters":
        """Copy of this cluster set carrying a (new) frozen boundary
        correction. Shapes are stable across refreshes, so jitted epoch fns
        do not retrace."""
        return CompactClusters(
            self.user_ids, self.item_ids, self.src, self.dst, self.w,
            self.user_local, self.pos_local, self.mask, self.edge_counts,
            self.user_valid, self.item_valid, self.u_pad, self.i_pad,
            adj=self.adj, user_cluster=self.user_cluster,
            user_slot=self.user_slot, users_disjoint=self.users_disjoint,
            member_table=self.member_table, corr=corr, neg_rest=neg_rest)

    @property
    def num_clusters(self) -> int:
        return int(self.src.shape[0])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_compact_clusters(
    parts: List[np.ndarray],
    num_users: int,
    align: int = 128,
) -> CompactClusters:
    """Host-side compaction of partitioned (global-id, undirected) edge lists.

    Also builds the inverse user map (``user_cluster``/``user_slot``) used by
    the hybrid_adam write-back; ``users_disjoint`` records whether each user
    really appears in at most one cluster (true for the greedy node partition,
    false for random edge partitions)."""
    parts = [p for p in parts if p.shape[1] > 0]
    infos = []
    for e in parts:
        head, tail = e[0], e[1]
        fwd = (head < num_users) & (tail >= num_users)
        u = head[fwd].astype(np.int64)
        it = (tail[fwd] - num_users).astype(np.int64)
        uu = np.unique(u)               # sorted
        ii = np.unique(it)              # sorted
        ul = np.searchsorted(uu, u)
        il = np.searchsorted(ii, it)
        infos.append((uu, ii, ul, il, e.shape[1]))

    u_pad = _round_up(max(len(i[0]) for i in infos), align)
    i_pad = _round_up(max(len(i[1]) for i in infos), align)
    e_fwd_pad = _round_up(max(len(i[2]) for i in infos), align)
    e_pad = 2 * e_fwd_pad

    k = len(infos)
    user_ids = np.zeros((k, u_pad), np.int32)
    item_ids = np.zeros((k, i_pad), np.int32)
    src = np.zeros((k, e_pad), np.int32)
    dst = np.zeros((k, e_pad), np.int32)
    w = np.zeros((k, e_pad), np.float32)
    user_local = np.zeros((k, e_fwd_pad), np.int32)
    pos_local = np.zeros((k, e_fwd_pad), np.int32)
    mask = np.zeros((k, e_fwd_pad), bool)
    edge_counts = np.zeros(k, np.float32)
    user_valid = np.zeros((k, u_pad), bool)
    item_valid = np.zeros((k, i_pad), bool)

    n_local = u_pad + i_pad
    user_cluster = np.full(num_users, -1, np.int32)
    user_slot = np.zeros(num_users, np.int32)
    users_disjoint = True
    for c, (uu, ii, ul, il, ecount) in enumerate(infos):
        if (user_cluster[uu] >= 0).any():
            users_disjoint = False
        user_cluster[uu] = c
        user_slot[uu] = np.arange(len(uu), dtype=np.int32)
        # pad id lists by repeating the last valid id (gather-safe)
        user_ids[c] = np.pad(uu, (0, u_pad - len(uu)), mode="edge") if len(uu) else 0
        item_ids[c] = np.pad(ii, (0, i_pad - len(ii)), mode="edge") if len(ii) else 0
        nf = len(ul)
        # undirected compact edges: user→item and item→user halves
        s = np.concatenate([ul, u_pad + il])
        d = np.concatenate([u_pad + il, ul])
        e_loc = np.stack([s, d])
        wts = gcn_norm(e_loc, n_local)
        order = np.argsort(d, kind="stable")
        s, d, wts = s[order], d[order], wts[order]
        src[c, : 2 * nf] = s
        dst[c, 2 * nf:] = n_local - 1
        dst[c, : 2 * nf] = d
        w[c, : 2 * nf] = wts
        user_local[c, :nf] = ul
        pos_local[c, :nf] = il
        mask[c, :nf] = True
        edge_counts[c] = float(ecount)
        user_valid[c, : len(uu)] = True
        item_valid[c, : len(ii)] = True

    cc = CompactClusters(
        user_ids=jnp.asarray(user_ids), item_ids=jnp.asarray(item_ids),
        src=jnp.asarray(src), dst=jnp.asarray(dst), w=jnp.asarray(w),
        user_local=jnp.asarray(user_local), pos_local=jnp.asarray(pos_local),
        mask=jnp.asarray(mask), edge_counts=jnp.asarray(edge_counts),
        user_valid=jnp.asarray(user_valid), item_valid=jnp.asarray(item_valid),
        u_pad=u_pad, i_pad=i_pad,
        user_cluster=jnp.asarray(user_cluster),
        user_slot=jnp.asarray(user_slot), users_disjoint=users_disjoint,
    )
    return cc


def densify_adjacency(cc: CompactClusters, dtype=jnp.bfloat16,
                      max_local_nodes: int = 4096) -> CompactClusters:
    """Materialize each cluster's normalized adjacency as a dense
    (n_local, n_local) block so propagation runs as MXU matmuls.

    TPU scatter/gather is the bottleneck of segment-sum propagation
    (~1.85 ms/step/layer measured at ML-25M scale); a dense Â at n_local ≈ 2.7K
    costs ~29 MB/cluster (bf16: 14.5 MB) and turns each layer into a
    (n, n)·(n, d) matmul — microseconds on the MXU. Only sensible while
    K·n_local² fits HBM; refuse beyond ``max_local_nodes``.
    """
    n_local = cc.u_pad + cc.i_pad
    if n_local > max_local_nodes:
        raise ValueError(
            f"n_local={n_local} > {max_local_nodes}: dense adjacency would "
            f"need {cc.num_clusters * n_local * n_local * 2 / 1e9:.1f} GB — "
            "use more clusters or the segment-sum path")
    k = cc.num_clusters
    # A[c, dst, src] += w built ON DEVICE (ops.spmm.densify_blocks): the
    # cluster COO is already resident, so this replaces a host bincount build
    # plus a ~1.4 GB dense upload through the remote PJRT tunnel (~15 s at
    # ML-25M scale) with one ~0.1 s on-device scatter-add. Padding edges
    # carry w=0 so they are harmless.
    from ..ops.spmm import densify_blocks

    # host NumPy views (zero-copy) so densify_blocks' default range check
    # engages before the jitted scatter silently drops bad indices
    blk = np.broadcast_to(np.arange(k, dtype=np.int32)[:, None],
                          np.shape(cc.src))
    adj = densify_blocks(blk, np.asarray(cc.dst), np.asarray(cc.src),
                         np.asarray(cc.w), num_blocks=k, width=n_local,
                         dtype=dtype)
    return CompactClusters(
        cc.user_ids, cc.item_ids, cc.src, cc.dst, cc.w, cc.user_local,
        cc.pos_local, cc.mask, cc.edge_counts, cc.user_valid, cc.item_valid,
        cc.u_pad, cc.i_pad, adj=adj, user_cluster=cc.user_cluster,
        user_slot=cc.user_slot, users_disjoint=cc.users_disjoint,
        member_table=cc.member_table, corr=cc.corr, neg_rest=cc.neg_rest,
    )


def attach_member_table(cc: CompactClusters,
                        train_edge_index: np.ndarray,
                        num_users: int) -> CompactClusters:
    """Return a copy of ``cc`` carrying the sorted train-pair table so every
    compact epoch fn samples EXACT feasible negatives (the variant the
    reference sketches but never wires in, helpers.py:11-62). Pairs come from
    the FULL train edge set, not just kept intra-cluster edges — a negative
    must avoid everything the user interacted with."""
    from ..data.partition import forward_half
    from ..ops.sampling import build_member_table

    u, it = forward_half(train_edge_index, num_users)
    table = jnp.asarray(build_member_table(u.astype(np.int32),
                                           it.astype(np.int32)))
    return CompactClusters(
        cc.user_ids, cc.item_ids, cc.src, cc.dst, cc.w, cc.user_local,
        cc.pos_local, cc.mask, cc.edge_counts, cc.user_valid, cc.item_valid,
        cc.u_pad, cc.i_pad, adj=cc.adj, user_cluster=cc.user_cluster,
        user_slot=cc.user_slot, users_disjoint=cc.users_disjoint,
        member_table=table, corr=cc.corr, neg_rest=cc.neg_rest,
    )


@partial(jax.jit, static_argnames=("num_layers", "num_users", "n_local",
                                   "cdtype", "corr_dtype"))
def _boundary_correction_jit(user_emb, item_emb, hybrid, user_ids, item_ids,
                             src, dst, w, adj, *, num_layers, num_users,
                             n_local, cdtype, corr_dtype):
    from ..ops.spmm import spmm_hybrid

    emb = jnp.concatenate([user_emb, item_emb], axis=0).astype(cdtype)
    xs = [emb]
    x = emb
    for _ in range(num_layers):
        # same dtype flow as the fullgraph trainer's forward (fullgraph.py):
        # gather/block sources in cdtype, f32 accumulation inside the kernel
        x = spmm_hybrid(hybrid, x.astype(cdtype))
        xs.append(x)
    xs_stack = jnp.stack(xs)                       # (L+1, N, d)
    # frozen neighbor accumulator Σ_{l≥1} x_l for the item table: an
    # out-of-cluster negative's corrected final is (e_n + neg_rest[n])·scale —
    # its own CURRENT row still carries gradient, the frozen neighborhood
    # restores the inter-cluster mass the analytic e_n·scale form dropped
    neg_rest = sum(xs[1:]).astype(corr_dtype)[num_users:]

    def per_cluster(args):
        uids, iids, src_c, dst_c, w_c, adj_c = args
        ids = jnp.concatenate([uids, num_users + iids])
        rows = xs_stack[:, ids, :]                 # (L+1, n_local, d)
        layers = []
        for l in range(num_layers):
            local = _one_hop(rows[l], src_c, dst_c, w_c, adj_c, n_local)
            layers.append((rows[l + 1] - local).astype(corr_dtype))
        return jnp.stack(layers)                   # (L, n_local, d)

    if adj is not None:
        corr = jax.lax.map(per_cluster,
                           (user_ids, item_ids, src, dst, w, adj))
    else:
        corr = jax.lax.map(lambda a: per_cluster(a + (None,)),
                           (user_ids, item_ids, src, dst, w))
    return corr, neg_rest


def build_boundary_correction(params: LightGCNParams, hybrid, cc: CompactClusters,
                              cfg: Config, num_users: int,
                              corr_dtype: str = "float32"):
    """Frozen inter-cluster correction from one full-graph propagation.

    The TPU-native fix for Cluster-GCN's structural bias (the reference drops
    every inter-cluster message, data/dataset_handler.py:256-288; at 100
    parts only ~39% of ML-25M's edge mass survives): propagate the CURRENT
    tables over the FULL hybrid adjacency once (L spmms), then cache, per
    cluster and layer, the remainder ``corr[c, l] = x_{l+1}[ids_c] −
    Â_c·x_l[ids_c]`` — everything the cluster-local operator misses
    (inter-cluster messages AND the local-vs-global degree-normalization
    mismatch). Compact epochs add the frozen term per layer
    (:func:`_propagate_local`), so their gradients are evaluated at the true
    forward point; staleness is bounded by the refresh cadence.

    Returns ``(corr, neg_rest)`` for :meth:`CompactClusters.with_correction`:
    corr is (K, L, n_local, d), neg_rest (num_items, d) — the frozen
    Σ_{l≥1} x_l item rows used for out-of-cluster negatives' finals.
    """
    return _boundary_correction_jit(
        params.user_emb, params.item_emb, hybrid,
        cc.user_ids, cc.item_ids, cc.src, cc.dst, cc.w, cc.adj,
        num_layers=cfg.model.num_layers, num_users=num_users,
        n_local=cc.u_pad + cc.i_pad,
        cdtype=cfg.model.compute_dtype, corr_dtype=corr_dtype)


def _step_negatives(cfg: Config, nk, user_ids, user_local, num_items, member):
    """Per-cluster negative draw: uniform (reference helpers.py:79-80) or
    exact-feasible when the cluster set carries a member table."""
    if member is None:
        return sample_negative(nk, user_local.shape[0], num_items,
                               num=cfg.train.num_negatives)
    from ..ops.sampling import sample_negative_feasible

    users = user_ids[user_local]       # triplet slots -> global user ids
    return sample_negative_feasible(nk, users, num_items, member,
                                    num=cfg.train.num_negatives)


def _one_hop(cur, src, dst, w, adj, n_local):
    """One propagation hop in the cluster's compact node space — the SAME op
    the boundary-correction builder uses, so corrected propagation reproduces
    the full-graph layers exactly at refresh time (see
    build_boundary_correction)."""
    if adj is not None:
        # feed the MXU its native mix: low-precision operands (adj is
        # stored bf16), f32 accumulation — and never materialize an f32
        # copy of the 29 MB adjacency block
        return jax.lax.dot_general(
            adj, cur.astype(adj.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cur.dtype)
    msg = cur[src] * w[:, None].astype(cur.dtype)
    return jax.ops.segment_sum(msg, dst, num_segments=n_local,
                               indices_are_sorted=True)


def _propagate_local(emb, src, dst, w, adj, num_layers, n_local, corr=None):
    """Compact-space propagation: dense-Â matmuls when ``adj`` is present,
    sorted segment-sum otherwise. Returns the layer-summed accumulator.

    ``corr`` is an optional (num_layers, n_local, d) FROZEN boundary
    correction: layer l becomes ``Â_c·cur + corr[l]``, where corr[l] was
    computed at the last full-graph refresh as the inter-cluster remainder
    ``x_{l+1}[ids] − Â_c·x_l[ids]`` of the full propagation. With frozen
    tables the corrected recursion reproduces the full-graph layers on the
    cluster's nodes exactly (induction: y_l = x_l[ids] ⇒ y_{l+1} =
    Â_c·x_l[ids] + x_{l+1}[ids] − Â_c·x_l[ids] = x_{l+1}[ids]), so compact
    gradients are evaluated at the true forward point instead of the
    39%-edge-retention one (VERDICT r4 item 1)."""
    acc = emb
    cur = emb
    for layer in range(num_layers):
        cur = _one_hop(cur, src, dst, w, adj, n_local)
        if corr is not None:
            cur = cur + jax.lax.stop_gradient(corr[layer]).astype(cur.dtype)
        acc = acc + cur
    return acc


#: lanes per inverse-table row — wide enough that the per-row gather amortizes
#: TPU row-op cost, small enough that the lane-select compare stays trivial
_INV_LANES = 8


def _neg_local_index(item_ids, neg, i_pad: int, num_items: int):
    """Map sampled global negative item ids to cluster-local slots.

    Semantics match ``clip(searchsorted(item_ids, neg), 0, i_pad-1)`` +
    ``item_ids[loc] == neg`` membership (item_ids is sorted with the last
    valid id repeated as padding), but the binary search lowers to a
    ~log2(i_pad)-round serial while loop on TPU — measured 37% of the whole
    compact epoch at ML-25M scale. Instead: scatter-min each slot index into
    an inverse table (first slot wins on duplicates, = lower bound), then one
    gather. The table is laid out ``(num_items/8, 8)`` so the probe is a
    ROW gather of B 8-lane rows + a VPU lane select: a width-1 gather of B
    int32 pays full per-row cost (~6.6 ns/row measured on v5e, 200 µs/step at
    ML-25M scale) while the 8-wide row gather runs ~3× faster.
    """
    rows = -(-num_items // _INV_LANES)
    inv = jnp.full((rows * _INV_LANES,), i_pad, jnp.int32)  # i_pad = "absent"
    inv = inv.at[item_ids].min(jnp.arange(item_ids.shape[0], dtype=jnp.int32))
    g = inv.reshape(rows, _INV_LANES)[neg // _INV_LANES]    # (..., 8)
    lane = jax.lax.broadcasted_iota(jnp.int32, g.shape, g.ndim - 1)
    loc = jnp.sum(jnp.where(lane == (neg % _INV_LANES)[..., None], g, 0),
                  axis=-1)
    return jnp.minimum(loc, i_pad - 1), loc < i_pad


def _triplet_loss(fu, u_rows, fi, i_rows, ni, neg, item_ids, user_local,
                  pos_local, mask, cfg: Config, i_pad: int, scale: float,
                  num_items: int, allow_fused: bool = True,
                  nrest=None) -> jax.Array:
    """Shared compact-space BPR dispatch: fused Pallas kernel when enabled and
    the cluster tables fit its VMEM budget, XLA row-op path otherwise.

    ``neg`` is (B,) or (B, K) for K negatives per positive; ``ni`` its gathered
    initial rows. The fused kernel is single-negative: K>1 flattens to B·K
    triplets with users/positives repeated — exactly equivalent, because both
    masked means in the reference loss decompose over the expansion
    (ops/bpr.py::bpr_loss means over B·d reg entries and over B pairwise rows;
    with u/p repeated K times those equal the B·K-expanded means).
    """
    d = u_rows.shape[1]
    use_fused = (allow_fused and cfg.train.fused_bpr
                 and cfg.train.loss in ("reference", "standard"))
    if use_fused and nrest is not None:
        import warnings

        warnings.warn(
            "fused_bpr ignores the boundary correction's frozen negative "
            "term (the kernel computes out-of-cluster finals analytically); "
            "using the XLA loss path for corrected epochs", stacklevel=2)
        use_fused = False
    if use_fused:
        from ..ops.pallas_bpr import fused_bpr_loss, fused_bpr_supported

        if not fused_bpr_supported(fu.shape[0], i_pad, d):
            import warnings

            warnings.warn(
                f"fused_bpr disabled: cluster tables (u_pad={fu.shape[0]}, "
                f"i_pad={i_pad}) exceed the kernel's VMEM budget — using the "
                "XLA loss path (more clusters re-enable the kernel)",
                stacklevel=2)
            use_fused = False
    if use_fused:
        if neg.ndim == 2:
            kneg = neg.shape[1]
            ul_x = jnp.repeat(user_local, kneg)
            pl_x = jnp.repeat(pos_local, kneg)
            m_x = jnp.repeat(mask, kneg)
            neg_x = neg.reshape(-1)
            ni_x = ni.reshape(-1, d)
        else:
            ul_x, pl_x, m_x, neg_x, ni_x = user_local, pos_local, mask, neg, ni
        loc, in_cluster = _neg_local_index(item_ids, neg_x, i_pad, num_items)
        # single fused Pallas pass: loss + all embedding gradients
        # (ops/pallas_bpr.py); the only XLA row ops left are the global
        # negative-row gather/scatter and the cluster-row table updates
        return fused_bpr_loss(fu, u_rows, fi, i_rows, ni_x, ul_x, pl_x, loc,
                              in_cluster, m_x, scale=scale,
                              bpr_coeff=cfg.train.bpr_coeff,
                              loss=cfg.train.loss)

    # gather (final ‖ initial) in ONE row op per index set: TPU gather/scatter
    # cost is per-ROW (~24ns/row measured, independent of width up to 128
    # lanes), so fusing the two same-index gathers halves the dominant cost of
    # the step; splitting the 128-wide result is free
    u_cat = jnp.concatenate([fu, u_rows], axis=1)[user_local]    # (B, 2d)
    uf, ui = u_cat[:, :d], u_cat[:, d:]
    p_cat = jnp.concatenate([fi, i_rows], axis=1)[pos_local]
    pf, pi = p_cat[:, :d], p_cat[:, d:]
    # negatives over the FULL catalog (reference helpers.py:79-80): in-cluster
    # negatives take the propagated row; out-of-cluster ones are isolated under
    # cluster propagation → final = table_row · scale analytically — unless a
    # frozen boundary correction supplies the neighbor mass (nrest), in which
    # case final = (table_row + Σ_{l≥1} x_l[frozen]) · scale
    loc, in_cluster = _neg_local_index(item_ids, neg, i_pad, num_items)
    iso = ni if nrest is None else ni + jax.lax.stop_gradient(
        nrest).astype(ni.dtype)
    nf = jnp.where(in_cluster[..., None], fi[loc], iso * scale)

    loss_fn = select_bpr_loss(cfg.train.loss)
    return loss_fn(uf, ui, pf, pi, nf, ni, cfg.train.bpr_coeff, mask=mask)


def compact_cluster_loss(
    params: LightGCNParams,
    cluster: Tuple,
    neg: jax.Array,
    cfg: Config,
    u_pad: int,
    i_pad: int,
    adj: Optional[jax.Array] = None,
    corr: Optional[jax.Array] = None,
    neg_rest: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference-equivalent BPR loss for one compact cluster.

    Matches ``training.train.compute_loss`` over the same cluster with global
    propagation (tests/test_compact.py::test_compact_matches_full_space).
    ``neg`` may be (B,) or (B, K) — K uniform negatives per positive.
    ``corr``/``neg_rest`` add the frozen boundary correction (see
    :func:`build_boundary_correction`).
    """
    (user_ids, item_ids, src, dst, w, user_local, pos_local, mask) = cluster
    n_local = u_pad + i_pad
    k1 = cfg.model.num_layers + 1
    scale = 1.0 / (k1 * k1) if cfg.model.readout == "reference" else 1.0 / k1
    cdtype = jnp.dtype(cfg.model.compute_dtype)

    u_rows = params.user_emb[user_ids]           # (Upad, d) gather
    i_rows = params.item_emb[item_ids]           # (Ipad, d)
    emb = jnp.concatenate([u_rows, i_rows], axis=0).astype(cdtype)
    acc = _propagate_local(emb, src, dst, w, adj, cfg.model.num_layers,
                           n_local, corr=corr)
    final = acc.astype(jnp.float32) * scale
    fu, fi = final[:u_pad], final[u_pad:]

    ni = params.item_emb[neg]
    nrest = None if neg_rest is None else neg_rest[neg]
    return _triplet_loss(fu, u_rows, fi, i_rows, ni, neg, item_ids,
                         user_local, pos_local, mask, cfg, i_pad, scale,
                         num_items=params.item_emb.shape[0], nrest=nrest)


# ---------------------------------------------------------------------------
# Lazy (sparse) Adam: moments touched-rows-only — the torch SparseAdam analog
# ---------------------------------------------------------------------------


class LazyAdamState(NamedTuple):
    mu: LightGCNParams
    nu: LightGCNParams
    count: jax.Array


def init_lazy_adam(params: LightGCNParams) -> LazyAdamState:
    z = lambda p: jnp.zeros_like(p)
    return LazyAdamState(
        mu=LightGCNParams(z(params.user_emb), z(params.item_emb)),
        nu=LightGCNParams(z(params.user_emb), z(params.item_emb)),
        count=jnp.zeros((), jnp.int32),
    )


def _lazy_row_update(table, mu, nu, rows, g_rows, valid, lr_t, b1, b2, eps, scale):
    """Adam on the gathered rows only, written back as masked scatter-ADDs of
    deltas — commutative, so padded duplicate ids are race-free (their deltas
    are masked to zero).

    Differences vs dense Adam (documented trade): untouched rows keep stale
    moments (no decay while idle — torch SparseAdam behaves the same), and a
    row sampled twice as a negative in one step applies two moment deltas
    computed from the same pre-state (SparseAdam-style approximation).
    """
    g_rows = g_rows * scale
    m_old = mu[rows]
    v_old = nu[rows]
    m = b1 * m_old + (1.0 - b1) * g_rows
    v = b2 * v_old + (1.0 - b2) * (g_rows * g_rows)
    upd = -lr_t * m / (jnp.sqrt(v) + eps)
    vmask = valid[:, None].astype(table.dtype)
    return (
        table.at[rows].add(upd * vmask),
        mu.at[rows].add((m - m_old) * vmask),
        nu.at[rows].add((v - v_old) * vmask),
    )


def _make_lr_schedule(cfg: Config):
    """jnp replica of training.train.make_optimizer's lr law for the fused
    lazy/hybrid Adam paths: ``lr_of(t)`` with t the 0-based optimizer step
    (optax applies ``schedule(count)`` BEFORE incrementing count — matched
    here so a recipe can hand one Adam state back and forth between
    optimizer='adam' and the fused paths without a schedule phase shift).
    Matches optax.warmup_cosine_decay_schedule piecewise-exactly."""
    tc = cfg.train
    if tc.lr_schedule == "constant":
        return lambda t: tc.lr
    if tc.lr_schedule != "cosine":
        raise ValueError(f"unknown lr_schedule {tc.lr_schedule!r}")
    if tc.lr_total_steps <= 0:
        raise ValueError(
            "lr_schedule='cosine' needs lr_total_steps > 0 "
            "(set it to steps_per_epoch * epochs)")
    warm, total = tc.lr_warmup_steps, tc.lr_total_steps
    peak = tc.lr
    init = 0.0 if warm > 0 else peak
    end = peak * tc.lr_final_frac

    def lr_of(t):
        tt = t.astype(jnp.float32)
        lr_warm = init + (peak - init) * tt / jnp.maximum(warm, 1)
        frac = jnp.clip((tt - warm) / jnp.maximum(total - warm, 1), 0.0, 1.0)
        lr_cos = end + 0.5 * (peak - end) * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(tt < warm, lr_warm, lr_cos)

    return lr_of


def make_compact_lazy_epoch_fn(cfg: Config):
    """Fused epoch with lazy Adam: per step, only the cluster's gathered rows
    (users, items, and a deduplicated union with sampled negatives) move."""
    lr_of = _make_lr_schedule(cfg)
    b1, b2, eps = cfg.train.adam_b1, cfg.train.adam_b2, cfg.train.adam_eps
    clip = cfg.train.grad_clip_norm

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, cc: CompactClusters, key: jax.Array):
        num_items = state.params.item_emb.shape[0]
        k = cc.num_clusters
        perm_key, neg_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, k)
        keys = jax.random.split(neg_key, k)
        xs = (
            cc.user_ids[perm], cc.item_ids[perm], cc.src[perm], cc.dst[perm],
            cc.w[perm], cc.user_local[perm], cc.pos_local[perm], cc.mask[perm],
            cc.edge_counts[perm], cc.user_valid[perm], cc.item_valid[perm], keys,
            cc.adj[perm] if cc.adj is not None else None,
            cc.corr[perm] if cc.corr is not None else None,
        )

        def row_loss(u_rows, i_rows, n_rows, cluster, neg, adj, corr, nrest):
            (user_ids, item_ids, src, dst, w, user_local, pos_local, mask) = cluster
            n_local = cc.u_pad + cc.i_pad
            k1 = cfg.model.num_layers + 1
            scale = 1.0 / (k1 * k1) if cfg.model.readout == "reference" else 1.0 / k1
            cdtype = jnp.dtype(cfg.model.compute_dtype)
            emb = jnp.concatenate([u_rows, i_rows], axis=0).astype(cdtype)
            acc = _propagate_local(emb, src, dst, w, adj,
                                   cfg.model.num_layers, n_local, corr=corr)
            final = acc.astype(jnp.float32) * scale
            fu, fi = final[:cc.u_pad], final[cc.u_pad:]
            # shared dispatch — the fused Pallas kernel works here too: its
            # custom VJP yields grads wrt (fu, u_rows, fi, i_rows, n_rows) and
            # autodiff chains them through the propagation to the row args
            return _triplet_loss(fu, u_rows, fi, i_rows, n_rows, neg,
                                 item_ids, user_local, pos_local, mask,
                                 cfg, cc.i_pad, scale, num_items=num_items,
                                 nrest=nrest)

        def body(carry, x):
            params, ost = carry
            cluster = x[:8]
            ecount = x[8]
            user_valid, item_valid, nk, adj, corr = (x[9], x[10], x[11],
                                                     x[12], x[13])
            user_ids, item_ids = cluster[0], cluster[1]
            neg = _step_negatives(cfg, nk, cluster[0], cluster[5],
                                  num_items, cc.member_table)

            u_rows = params.user_emb[user_ids]
            i_rows = params.item_emb[item_ids]
            n_rows = params.item_emb[neg]
            nrest = None if cc.neg_rest is None else cc.neg_rest[neg]
            loss, (gu, gi, gn) = jax.value_and_grad(row_loss, argnums=(0, 1, 2))(
                u_rows, i_rows, n_rows, cluster, neg, adj, corr, nrest)

            # global-norm clip over the row grads (duplicate-row sums differ
            # negligibly from the dense norm; see _lazy_row_update)
            gsq = jnp.sum(gu**2) + jnp.sum(gi**2) + jnp.sum(gn**2)
            gn_norm = jnp.sqrt(gsq)
            cscale = jnp.minimum(1.0, clip / jnp.maximum(gn_norm, 1e-6))

            cnt = ost.count + 1
            lr_t = lr_of(ost.count) * jnp.sqrt(
                1.0 - b2**cnt.astype(jnp.float32)) / (
                1.0 - b1**cnt.astype(jnp.float32))

            ue, mu_u, nu_u = _lazy_row_update(
                params.user_emb, ost.mu.user_emb, ost.nu.user_emb,
                user_ids, gu, user_valid, lr_t, b1, b2, eps, cscale)
            # items: cluster rows and negative rows update sequentially; a
            # negative that is also a cluster item gets two moment deltas
            # (SparseAdam-style approximation)
            ie, mu_i, nu_i = _lazy_row_update(
                params.item_emb, ost.mu.item_emb, ost.nu.item_emb,
                item_ids, gi, item_valid, lr_t, b1, b2, eps, cscale)
            neg_flat = neg.reshape(-1)                     # (B,) or (B·K,)
            gn_flat = gn.reshape(neg_flat.shape[0], -1)
            neg_valid = jnp.ones(neg_flat.shape[0], bool)
            ie, mu_i, nu_i = _lazy_row_update(ie, mu_i, nu_i, neg_flat, gn_flat,
                                              neg_valid, lr_t, b1, b2, eps, cscale)

            new_params = LightGCNParams(ue, ie)
            new_ost = LazyAdamState(LightGCNParams(mu_u, mu_i),
                                    LightGCNParams(nu_u, nu_i), cnt)
            return (new_params, new_ost), loss * ecount

        (params, ost), wlosses = jax.lax.scan(
            body, (state.params, state.opt_state), xs)
        mean_loss = jnp.sum(wlosses) / jnp.maximum(jnp.sum(cc.edge_counts), 1.0)
        return TrainState(params, ost, state.step + cc.num_clusters), mean_loss

    return epoch_fn


def create_lazy_train_state(cfg: Config, params: LightGCNParams) -> TrainState:
    return TrainState(params=params, opt_state=init_lazy_adam(params),
                      step=jnp.zeros((), jnp.int32))


def lazy_state_from_optax(opt_state) -> LazyAdamState:
    """Extract (mu, nu, count) from any optax chain containing scale_by_adam.

    The bridge recipe hands ONE Adam state back and forth between
    optimizer='adam' epoch fns (optax chain: clip → adam) and the fused
    lazy/hybrid paths (LazyAdamState) — moments are per-row and both sides
    implement the same update law, so the conversion is a relabeling."""
    for leaf in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)):
        if isinstance(leaf, optax.ScaleByAdamState):
            return LazyAdamState(mu=leaf.mu, nu=leaf.nu,
                                 count=leaf.count.astype(jnp.int32))
    raise ValueError("no ScaleByAdamState found in the optax state")


def lazy_state_to_optax(lz: LazyAdamState, template):
    """Write a LazyAdamState's (mu, nu, count) back into an optax state of the
    make_optimizer shape (``template`` = ``opt.init(params)`` or a live
    state). Schedule counts (ScaleByScheduleState) are synced to the same
    step so a cosine recipe stays phase-aligned across trainer switches."""
    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=lz.count.astype(node.count.dtype), mu=lz.mu, nu=lz.nu)
        if isinstance(node, optax.ScaleByScheduleState):
            # fresh buffer: the SAME count array in two state leaves would be
            # donated twice by the epoch fns' donate_argnums (backend
            # InvalidArgument on this platform)
            return optax.ScaleByScheduleState(
                count=(lz.count + 0).astype(node.count.dtype))
        if isinstance(node, tuple) and type(node) is not tuple:  # NamedTuple
            return type(node)(*(walk(c) for c in node))
        if isinstance(node, tuple):
            return tuple(walk(c) for c in node)
        return node

    return walk(template)


def make_compact_hybrid_epoch_fn(cfg: Config, lazy_items: bool = False):
    """Hybrid-Adam fused epoch: EXACT dense Adam on the item table, lazy
    (SparseAdam-style, see :func:`_lazy_row_update`) on the user table.

    ``lazy_items=True`` (optimizer='lazy_item_adam', VERDICT r4 item 4) swaps
    the dense item path for row-sparse item moments: the sorted
    (negatives ‖ cluster items) keys are run-length-compressed on device
    (first-occurrence mask + compressed segment sum), Adam runs on the summed
    per-row grads in the optax form (bit-matching the dense path's update for
    every TOUCHED row at equal moments), and the three item arrays take
    masked scatter-ADDs instead of full dense sweeps. Trade vs dense:
    untouched rows keep stale moments (no decay while idle — torch SparseAdam
    semantics), in exchange for dropping the per-step (num_items, d) dense
    gradient write + three-table sweep.

    Why this split wins on TPU (profiled at ML-25M scale, v5e):

      * a compact cluster touches ≤1920 of 162,541 user rows (1.2%), yet dense
        Adam sweeps all three user-table arrays every step — 921 µs of the
        2.6 ms step, plus ~385 µs of dense-user-grad zeros/densify/norm. Lazy
        user rows replace all of it with ~50 µs of row ops.
      * the item table is hit broadly every step (30K uniform negatives across
        59K items), so its dense sweep (95 µs) is CHEAPER than per-row lazy
        moment gathers+scatters — and stays bit-exact reference Adam
        (train_test.py:236): item moments decay every step, clip uses the true
        dense-grad norm contribution.

    State reuses :class:`LazyAdamState` (same pytree: full mu/nu tables +
    count); only the update rule differs per table.

    TPU scatter note (profiled): XLA:TPU lowers a functional scatter into a
    big table as a FULL-TABLE rewrite (~93 µs for 1920 rows into the 41 MB
    user table — a copy, not a row op), so per-step lazy scatters would cost
    3 table copies/step. The greedy partitioner assigns each USER to exactly
    one cluster, so instead each scan step emits its cluster's updated
    (param, mu, nu) user rows as a scan OUTPUT, and the epoch writes all of
    them back in ONE permutation-GATHER per table (no scatter at all:
    ``new[u] = ys[inv_perm[user_cluster[u]], user_slot[u]]`` masked by
    cluster membership) — ~1 ms/epoch instead of ~44 ms. The scan iterates
    the cluster PERMUTATION itself and dynamic-slices each cluster's arrays
    on demand, so the 1.4 GB stacked dense adjacency is never re-gathered
    into permuted order (~8 ms/epoch saved).
    """
    lr_of = _make_lr_schedule(cfg)
    b1, b2, eps = cfg.train.adam_b1, cfg.train.adam_b2, cfg.train.adam_eps
    clip = cfg.train.grad_clip_norm

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, cc: CompactClusters, key: jax.Array):
        if not cc.users_disjoint or cc.user_cluster is None:
            raise ValueError(
                "hybrid_adam needs disjoint per-cluster user sets (greedy "
                "node partition); rebuild the clusters with "
                "partitioner='greedy' or use optimizer='adam'/'lazy_adam'")
        num_items = state.params.item_emb.shape[0]
        d = state.params.user_emb.shape[1]
        k = cc.num_clusters
        perm_key, neg_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, k)
        keys = jax.random.split(neg_key, k)

        def row_loss(u_rows, i_rows, n_rows, cluster, neg, adj, corr, nrest):
            (user_ids, item_ids, src, dst, w, user_local, pos_local, mask) = cluster
            n_local = cc.u_pad + cc.i_pad
            k1 = cfg.model.num_layers + 1
            scale = 1.0 / (k1 * k1) if cfg.model.readout == "reference" else 1.0 / k1
            cdtype = jnp.dtype(cfg.model.compute_dtype)
            emb = jnp.concatenate([u_rows, i_rows], axis=0).astype(cdtype)
            acc = _propagate_local(emb, src, dst, w, adj,
                                   cfg.model.num_layers, n_local, corr=corr)
            final = acc.astype(jnp.float32) * scale
            fu, fi = final[:cc.u_pad], final[cc.u_pad:]
            return _triplet_loss(fu, u_rows, fi, i_rows, n_rows, neg,
                                 item_ids, user_local, pos_local, mask,
                                 cfg, cc.i_pad, scale, num_items=num_items,
                                 nrest=nrest)

        user_emb0 = state.params.user_emb
        mu_u0 = state.opt_state.mu.user_emb
        nu_u0 = state.opt_state.nu.user_emb

        def body(carry, x):
            item_emb, mu_i, nu_i, cnt = carry
            c, nk = x                      # cluster id (traced) + PRNG key
            cluster = (cc.user_ids[c], cc.item_ids[c], cc.src[c], cc.dst[c],
                       cc.w[c], cc.user_local[c], cc.pos_local[c], cc.mask[c])
            ecount = cc.edge_counts[c]
            user_valid = cc.user_valid[c]
            item_valid = cc.item_valid[c]
            adj = cc.adj[c] if cc.adj is not None else None
            corr = cc.corr[c] if cc.corr is not None else None
            user_ids, item_ids = cluster[0], cluster[1]
            neg = _step_negatives(cfg, nk, cluster[0], cluster[5],
                                  num_items, cc.member_table)

            # user rows come from the epoch-START tables: each user belongs
            # to exactly one cluster, so its rows are read and updated by
            # exactly one step — epoch-start reads ARE the current values
            u_rows = user_emb0[user_ids]
            mu_rows = mu_u0[user_ids]
            nu_rows = nu_u0[user_ids]
            i_rows = item_emb[item_ids]
            n_rows = item_emb[neg]
            nrest = None if cc.neg_rest is None else cc.neg_rest[neg]
            loss, (gu, gi, gn) = jax.value_and_grad(row_loss, argnums=(0, 1, 2))(
                u_rows, i_rows, n_rows, cluster, neg, adj, corr, nrest)

            # exact item gradient (duplicate negative rows sum — torch
            # autograd semantics). Negatives AND the cluster's positive-item
            # rows ride ONE sort + sorted segment-sum: the r3 version
            # scattered the positive rows separately via .at[item_ids].add,
            # which XLA lowers as a full-table rewrite (~30 MB/step; profiled
            # r4 at 29.8 ms/epoch — the largest reducible term of the
            # headline's floor gap). Sorting the extra 2.5K keys costs ~µs.
            gu = gu * user_valid[:, None].astype(gu.dtype)
            neg_flat = neg.reshape(-1)
            gn_flat = gn.reshape(neg_flat.shape[0], -1)
            all_idx = jnp.concatenate([neg_flat, item_ids])
            all_val = jnp.concatenate(
                [gn_flat, gi * item_valid[:, None].astype(gi.dtype)])
            idx_s, a = jax.lax.sort_key_val(
                all_idx, jnp.arange(all_idx.shape[0], dtype=jnp.int32))
            if lazy_items:
                # run-length-compress duplicate keys: the summed per-row grad
                # lands at each run's FIRST position, everything else masked
                val_s = all_val[a]
                first = jnp.concatenate(
                    [jnp.ones((1,), bool), idx_s[1:] != idx_s[:-1]])
                seg = jnp.cumsum(first) - 1
                summed = jax.ops.segment_sum(val_s, seg,
                                             num_segments=idx_s.shape[0],
                                             indices_are_sorted=True)
                g_rows = summed[seg] * first[:, None].astype(summed.dtype)
                gn_norm = jnp.sqrt(jnp.sum(gu**2) + jnp.sum(g_rows**2))
            else:
                gi_dense = jax.ops.segment_sum(all_val[a], idx_s,
                                               num_segments=num_items,
                                               indices_are_sorted=True)
                # user rows are unique per cluster, so the masked row norm
                # equals the dense user-grad norm exactly — clip preserved
                gn_norm = jnp.sqrt(jnp.sum(gu**2) + jnp.sum(gi_dense**2))
            cscale = jnp.minimum(1.0, clip / jnp.maximum(gn_norm, 1e-6))

            lr = lr_of(cnt)            # optax convention: schedule(count) pre-increment
            cnt = cnt + 1
            tf = cnt.astype(jnp.float32)

            if lazy_items:
                # optax-form Adam on the TOUCHED rows only (bit-matches the
                # dense branch's update at equal moments); masked scatter-adds
                # replace the three dense sweeps
                g = g_rows * cscale
                m_old = mu_i[idx_s]
                v_old = nu_i[idx_s]
                m_new = b1 * m_old + (1.0 - b1) * g
                v_new = b2 * v_old + (1.0 - b2) * (g * g)
                mhat = m_new / (1.0 - b1**tf)
                vhat = v_new / (1.0 - b2**tf)
                upd = -lr * mhat / (jnp.sqrt(vhat) + eps)
                fm = first[:, None].astype(item_emb.dtype)
                item_emb = item_emb.at[idx_s].add(upd * fm)
                mu_i = mu_i.at[idx_s].add((m_new - m_old) * fm)
                nu_i = nu_i.at[idx_s].add((v_new - v_old) * fm)
            else:
                # item table: textbook dense Adam (one fused three-table
                # sweep); bias correction in the optax/torch form (eps
                # OUTSIDE the corrected sqrt) so the item table matches
                # optax.adam bit-for-bit
                g = gi_dense * cscale
                mu_i = b1 * mu_i + (1.0 - b1) * g
                nu_i = b2 * nu_i + (1.0 - b2) * (g * g)
                mhat = mu_i / (1.0 - b1**tf)
                vhat = nu_i / (1.0 - b2**tf)
                item_emb = item_emb - lr * mhat / (jnp.sqrt(vhat) + eps)

            # user block: lazy Adam on this cluster's rows, pure elementwise
            # (write-back deferred to the one epoch-end scatter)
            lr_t = lr * jnp.sqrt(1.0 - b2**tf) / (1.0 - b1**tf)
            gs = gu * cscale
            m_new = b1 * mu_rows + (1.0 - b1) * gs
            v_new = b2 * nu_rows + (1.0 - b2) * (gs * gs)
            u_new = u_rows - lr_t * m_new / (jnp.sqrt(v_new) + eps)

            return ((item_emb, mu_i, nu_i, cnt),
                    (loss * ecount, u_new, m_new, v_new))

        carry0 = (state.params.item_emb, state.opt_state.mu.item_emb,
                  state.opt_state.nu.item_emb, state.opt_state.count)
        (item_emb, mu_i, nu_i, cnt), (wlosses, u_out, mu_out, nu_out) = (
            jax.lax.scan(body, carry0, (perm, keys)))

        # write-back by PERMUTATION GATHER (no scatter): user u's new row sits
        # at scan position inv_perm[user_cluster[u]], slot user_slot[u]; users
        # in no cluster keep their old rows (and moments) — lazy semantics
        inv_perm = jnp.zeros((k,), jnp.int32).at[perm].set(
            jnp.arange(k, dtype=jnp.int32))
        in_cluster = cc.user_cluster >= 0
        pos = inv_perm[jnp.maximum(cc.user_cluster, 0)] * cc.u_pad + cc.user_slot
        sel = in_cluster[:, None]
        wb = lambda new, old: jnp.where(sel, new.reshape(-1, d)[pos], old)
        user_emb = wb(u_out, user_emb0)
        mu_u = wb(mu_out, mu_u0)
        nu_u = wb(nu_out, nu_u0)

        params = LightGCNParams(user_emb, item_emb)
        ost = LazyAdamState(LightGCNParams(mu_u, mu_i),
                            LightGCNParams(nu_u, nu_i), cnt)
        mean_loss = jnp.sum(wlosses) / jnp.maximum(jnp.sum(cc.edge_counts), 1.0)
        return TrainState(params, ost, state.step + cc.num_clusters), mean_loss

    return epoch_fn


def make_compact_epoch_fn(cfg: Config):
    """One fused ``lax.scan`` pass over all compact clusters per call.

    The full train-config matrix is supported here: ``num_negatives > 1``
    (K uniform global negatives per positive, out-of-cluster finals analytic),
    ``fused_bpr`` under both adam and lazy_adam (the kernel's custom VJP chains
    through the propagation), and any ``loss``/``readout`` combination.
    """
    if cfg.train.optimizer == "lazy_adam":
        return make_compact_lazy_epoch_fn(cfg)
    if cfg.train.optimizer == "hybrid_adam":
        return make_compact_hybrid_epoch_fn(cfg)
    if cfg.train.optimizer == "lazy_item_adam":
        return make_compact_hybrid_epoch_fn(cfg, lazy_items=True)
    opt = make_optimizer(cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, cc: CompactClusters, key: jax.Array):
        num_items = state.params.item_emb.shape[0]
        k = cc.num_clusters
        perm_key, neg_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, k)
        keys = jax.random.split(neg_key, k)
        xs = (
            cc.user_ids[perm], cc.item_ids[perm], cc.src[perm], cc.dst[perm],
            cc.w[perm], cc.user_local[perm], cc.pos_local[perm], cc.mask[perm],
            cc.edge_counts[perm], keys,
            cc.adj[perm] if cc.adj is not None else None,
            cc.corr[perm] if cc.corr is not None else None,
        )

        def body(carry, x):
            st = carry
            cluster = x[:8]
            ecount, nk, adj, corr = x[8], x[9], x[10], x[11]
            neg = _step_negatives(cfg, nk, cluster[0], cluster[5],
                                  num_items, cc.member_table)
            loss, grads = jax.value_and_grad(compact_cluster_loss)(
                st.params, cluster, neg, cfg, cc.u_pad, cc.i_pad, adj,
                corr, cc.neg_rest)
            updates, opt_state = opt.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(params, opt_state, st.step + 1), loss * ecount

        state, wlosses = jax.lax.scan(body, state, xs)
        mean_loss = jnp.sum(wlosses) / jnp.maximum(jnp.sum(cc.edge_counts), 1.0)
        return state, mean_loss

    return epoch_fn
