"""Data-parallel compact-cluster training over a device mesh.

Scales the compact-cluster trainer (training/compact.py) across chips: each
device of the ``data`` axis processes a DIFFERENT cluster per step; gradients
psum over the mesh and one Adam update applies per superstep. This is exactly
Cluster-GCN with cluster-batch-size = #devices (PyG's ClusterLoader
``batch_size`` knob — the reference pins it to 1, dataset_handler.py:285; >1 is
the standard way Cluster-GCN scales out). Tables are replicated (57 MB at
ML-25M scale — cheap); the win is parallel propagation + loss over clusters.

Numerics: one superstep == a single update with the edge-count-weighted MEAN of
the per-cluster gradients — verified against a hand-computed batched update in
tests/test_compact_sharded.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..models.lightgcn import LightGCNParams
from ..ops.sampling import sample_negative
from ..parallel.mesh import DATA_AXIS
from .compact import CompactClusters, compact_cluster_loss
from .train import TrainState, make_optimizer


def make_compact_sharded_epoch_fn(cfg: Config, mesh: Mesh):
    """Epoch over clusters with ``pd = mesh['data']`` clusters per update.

    Requires ``num_clusters % pd == 0`` (build the partitioner with a multiple).
    Returns ``epoch_fn(state, cc, key) -> (state, mean_loss)`` like the
    single-chip compact epoch fn.
    """
    pd = mesh.shape[DATA_AXIS]
    opt = make_optimizer(cfg)

    def superstep(params, opt_state, cluster, ecount, adj, nk, member):
        """Runs on ONE device with its own cluster; grads psum over 'data'."""
        from .compact import _step_negatives

        num_items = params.item_emb.shape[0]
        neg = _step_negatives(cfg, nk, cluster[0], cluster[5], num_items,
                              member)
        loss, grads = jax.value_and_grad(compact_cluster_loss)(
            params, cluster, neg, cfg, *_pads(cfg), adj)
        # edge-count-weighted mean across the cluster batch
        wsum = jax.lax.psum(ecount, DATA_AXIS)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g * (ecount / wsum), DATA_AXIS), grads)
        loss = jax.lax.psum(loss * ecount, DATA_AXIS)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    pads = {}

    def _pads(cfg):
        return pads["u"], pads["i"]

    def build(cc: CompactClusters):
        if cc.num_clusters % pd != 0:
            raise ValueError(
                f"num_clusters={cc.num_clusters} must divide by data axis {pd}")
        pads["u"], pads["i"] = cc.u_pad, cc.i_pad

        def sharded_body(params, opt_state, xs_slice, member):
            # xs_slice leading dim = 1 on each device (sharded over 'data')
            (uids, iids, src, dst, w, ul, pl_, m, ec, adj, nk) = xs_slice
            cluster = (uids[0], iids[0], src[0], dst[0], w[0], ul[0], pl_[0], m[0])
            return superstep(params, opt_state,
                             cluster, ec[0],
                             adj[0] if adj is not None else None, nk[0],
                             member)

        inner = jax.shard_map(
            sharded_body,
            mesh=mesh,
            in_specs=(P(), P(),
                      (P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                       P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                       P(DATA_AXIS),
                       P(DATA_AXIS) if cc.adj is not None else None,
                       P(DATA_AXIS)),
                      P() if cc.member_table is not None else None),
            out_specs=(P(), P(), P()),
            # pallas_call outputs carry no varying-manifest annotations, which
            # the static vma checker rejects; skip it when the fused BPR
            # kernel runs inside the body. Replication of the outputs is real
            # either way (grads/loss psum over 'data'; params update from
            # replicated inputs) and covered by the parity test
            # (tests/test_compact_sharded.py: sharded ≡ single-device).
            check_vma=not cfg.train.fused_bpr,
        )

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(state: TrainState, cc: CompactClusters, key: jax.Array):
            k = cc.num_clusters
            perm_key, neg_key = jax.random.split(key)
            perm = jax.random.permutation(perm_key, k)
            keys = jax.random.split(neg_key, k)

            def outer_body(carry, step_idx):
                params, opt_state = carry
                sel = jax.lax.dynamic_slice_in_dim(perm, step_idx * pd, pd)
                xs = (
                    cc.user_ids[sel], cc.item_ids[sel], cc.src[sel],
                    cc.dst[sel], cc.w[sel], cc.user_local[sel],
                    cc.pos_local[sel], cc.mask[sel], cc.edge_counts[sel],
                    cc.adj[sel] if cc.adj is not None else None,
                    keys[sel],
                )
                params, opt_state, wloss = inner(params, opt_state, xs,
                                                 cc.member_table)
                return (params, opt_state), wloss

            (params, opt_state), wlosses = jax.lax.scan(
                outer_body, (state.params, state.opt_state),
                jnp.arange(k // pd))
            mean_loss = jnp.sum(wlosses) / jnp.maximum(
                jnp.sum(cc.edge_counts), 1.0)
            return TrainState(params, opt_state,
                              state.step + k // pd), mean_loss

        return epoch_fn

    return build
