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


def shard_graph(edge_index: np.ndarray, plan: ShardPlan) -> ShardedGraph:
    """Partition edges by destination owner; emit equal-length padded shards.

    Node ids are remapped into the padded space: users keep their id, items
    shift from ``num_users`` up to ``u_pad``. GCN weights are computed BEFORE
    padding/sharding on the true graph, so sharded propagation is bit-equal to
    the single-device path.
    """
    w = gcn_norm(edge_index, plan.num_users + plan.num_items)
    src = edge_index[0].astype(np.int64)
    dst = edge_index[1].astype(np.int64)
    # remap into padded node space
    shift = plan.u_pad - plan.num_users
    src_p = np.where(src >= plan.num_users, src + shift, src)
    dst_p = np.where(dst >= plan.num_users, dst + shift, dst)

    def owner_and_local(nodes: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
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

    own, loc = owner_and_local(dst_p)
    counts = np.bincount(own, minlength=plan.pm)
    e_shard = int(counts.max(initial=1))
    e_shard = ((e_shard + 127) // 128) * 128
    l_rows = plan.u_loc + plan.i_loc
    src_s = np.zeros((plan.pm, e_shard), np.int32)
    dst_s = np.full((plan.pm, e_shard), l_rows - 1, np.int32)
    w_s = np.zeros((plan.pm, e_shard), np.float32)
    for p in range(plan.pm):
        m = own == p
        order = np.argsort(loc[m], kind="stable")
        k = int(m.sum())
        src_s[p, :k] = src_p[m][order]
        dst_s[p, :k] = loc[m][order]
        w_s[p, :k] = w[m][order]
        # keep dst sorted incl. padding tail (pads point at last local row, w=0)
        resort = np.argsort(dst_s[p], kind="stable")
        src_s[p] = src_s[p][resort]
        dst_s[p] = dst_s[p][resort]
        w_s[p] = w_s[p][resort]
    return ShardedGraph(jnp.asarray(src_s), jnp.asarray(dst_s), jnp.asarray(w_s))


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


def make_sharded_train_step(
    cfg: Config,
    mesh: Mesh,
    plan: ShardPlan,
    opt: Optional[optax.GradientTransformation] = None,
):
    """Build the shard_map'd train step.

    Signature: ``step(state, graph: ShardedGraph, batch, neg, key) ->
    (state, loss)`` where state holds PADDED tables. Numerically matches the
    single-device ``training.train.make_train_step`` (see
    tests/test_sharding.py::test_sharded_matches_single_device).
    """
    if opt is None:
        opt = optax.adam(cfg.train.lr, b1=cfg.train.adam_b1, b2=cfg.train.adam_b2,
                         eps=cfg.train.adam_eps)
    pm = plan.pm
    num_layers = cfg.model.num_layers
    readout = cfg.model.readout

    spmm_chunks = max(int(getattr(cfg.train, "spmm_chunks", 1)), 1)

    def local_propagate(u_shard, i_shard, src, dst_local, w):
        """K layers of (all_gather → local segment-sum); returns local final rows.

        With ``cfg.train.spmm_chunks > 1`` the per-layer gather runs as an
        edge-chunked scan so the (E_shard, d) message tensor never materializes
        (the milestone-3 big-model regime: d=128 at ML-25M scale)."""
        l_rows = plan.u_loc + plan.i_loc

        def gather_full(u_loc_rows, i_loc_rows):
            uf = jax.lax.all_gather(u_loc_rows, MODEL_AXIS, axis=0, tiled=True)
            itf = jax.lax.all_gather(i_loc_rows, MODEL_AXIS, axis=0, tiled=True)
            return jnp.concatenate([uf, itf], axis=0)          # (n_pad, d)

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
            # output under shard_map's vma typecheck (cf. ops/topk.py)
            z = jnp.where(jnp.isnan(full[0, 0]), 0.0, 0.0).astype(full.dtype)
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

    def local_loss(params: LightGCNParams, graph_shard, batch: TripletBatch,
                   neg: jax.Array) -> jax.Array:
        src, dst_local, w = graph_shard
        fu_loc, fi_loc = local_propagate(params.user_emb, params.item_emb,
                                         src, dst_local, w)
        # full final tables for triplet gathers (replicated over 'model')
        fu = jax.lax.all_gather(fu_loc, MODEL_AXIS, axis=0, tiled=True)
        fi = jax.lax.all_gather(fi_loc, MODEL_AXIS, axis=0, tiled=True)
        u0 = jax.lax.all_gather(params.user_emb, MODEL_AXIS, axis=0, tiled=True)
        i0 = jax.lax.all_gather(params.item_emb, MODEL_AXIS, axis=0, tiled=True)

        uf, ui = fu[batch.user], u0[batch.user]
        pf, pi = fi[batch.pos_item], i0[batch.pos_item]
        nf, ni = fi[neg], i0[neg]
        # masked SUMS so cross-device averaging is exact under uneven masks
        m = batch.mask.astype(jnp.float32)
        cnt = jnp.maximum(jax.lax.psum(jnp.sum(m), DATA_AXIS), 1.0)

        sq = ((ui**2 + pi**2 + ni**2) * m[:, None]).sum() / (ui.shape[1])
        reg = cfg.train.bpr_coeff * jax.lax.psum(sq, DATA_AXIS) / cnt

        nrm = lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True)
        cp = jnp.sum(nrm(uf) * nrm(pf), axis=1)
        cn = jnp.sum(nrm(uf) * nrm(nf), axis=1)
        s = (jax.nn.softplus(10.0 * (cp - cn)) * m).sum()
        score = jax.lax.psum(s, DATA_AXIS) / cnt / 10.0
        loss = -score + reg
        # replicated over 'model': average over the axis so AD through the
        # all_gather transposes sums to exactly the true gradient
        return jax.lax.psum(loss, MODEL_AXIS) / pm

    def step(state, graph: ShardedGraph, batch: TripletBatch, neg: jax.Array):
        params, opt_state, count = state
        graph_shard = (graph.src[0], graph.dst_local[0], graph.w[0])
        loss, grads = jax.value_and_grad(local_loss)(params, graph_shard, batch, neg)
        # data-parallel reduction: each data-device saw only its batch shard
        grads = jax.tree.map(lambda g: jax.lax.psum(g, DATA_AXIS), grads)
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
    def build(state_template):
        st_specs = state_specs(state_template, plan)
        graph_specs = ShardedGraph(P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS))
        batch_specs = TripletBatch(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS))
        fn = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(st_specs, graph_specs, batch_specs, P(DATA_AXIS)),
            out_specs=(st_specs, P()),
        )
        return jax.jit(fn)

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
