"""Compact-cluster trainer: equivalence with the full-node-space path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from movie_recommender_system_with_gnns_tpu.config import Config, ModelConfig, TrainConfig
from movie_recommender_system_with_gnns_tpu.data.graph import COOGraph
from movie_recommender_system_with_gnns_tpu.data.partition import partition_bipartite_greedy
from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
from movie_recommender_system_with_gnns_tpu.ops.sampling import TripletBatch, triplets_from_edges
from movie_recommender_system_with_gnns_tpu.ops.spmm import DeviceCOO
from movie_recommender_system_with_gnns_tpu.training.compact import (
    CompactClusters, build_compact_clusters, compact_cluster_loss,
    make_compact_epoch_fn,
)
from movie_recommender_system_with_gnns_tpu.training.train import (
    compute_loss, create_train_state,
)


def _cfg():
    return Config(model=ModelConfig(num_layers=2, dim=8), train=TrainConfig(lr=1e-2))


def test_compact_matches_full_space(tiny_data):
    """compact_cluster_loss ≡ compute_loss on the same cluster + negatives."""
    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = partition_bipartite_greedy(tiny_data.edge_index, nu, n, 3)
    parts = [p for p in parts if p.shape[1] > 0]
    params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
    cc = build_compact_clusters(parts, nu, align=8)

    for ci, part in enumerate(parts):
        # full-space reference on this cluster
        graph = DeviceCOO.from_host(COOGraph.build(part, n))
        batch = triplets_from_edges(part, nu)
        neg = jax.random.randint(jax.random.PRNGKey(ci), (batch.user.shape[0],),
                                 0, ni, dtype=jnp.int32)
        loss_full = compute_loss(params, graph, batch, neg, cfg)

        # compact path needs neg padded to its static width + triplet remap
        b_pad = cc.user_local.shape[1]
        neg_pad = jnp.concatenate([neg, jnp.zeros((b_pad - neg.shape[0],), jnp.int32)])
        cluster = (cc.user_ids[ci], cc.item_ids[ci], cc.src[ci], cc.dst[ci],
                   cc.w[ci], cc.user_local[ci], cc.pos_local[ci], cc.mask[ci])
        loss_compact = compact_cluster_loss(params, cluster, neg_pad, cfg,
                                            cc.u_pad, cc.i_pad)
        np.testing.assert_allclose(float(loss_compact), float(loss_full),
                                   rtol=2e-5, atol=1e-7)


def test_compact_gradients_match(tiny_data):
    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 2)
             if p.shape[1] > 0]
    params = init_params(jax.random.PRNGKey(1), nu, ni, cfg.model.dim)
    cc = build_compact_clusters(parts, nu, align=8)

    part = parts[0]
    graph = DeviceCOO.from_host(COOGraph.build(part, n))
    batch = triplets_from_edges(part, nu)
    neg = jax.random.randint(jax.random.PRNGKey(9), (batch.user.shape[0],), 0, ni,
                             dtype=jnp.int32)
    g_full = jax.grad(compute_loss)(params, graph, batch, neg, cfg)

    b_pad = cc.user_local.shape[1]
    neg_pad = jnp.concatenate([neg, jnp.zeros((b_pad - neg.shape[0],), jnp.int32)])
    cluster = (cc.user_ids[0], cc.item_ids[0], cc.src[0], cc.dst[0], cc.w[0],
               cc.user_local[0], cc.pos_local[0], cc.mask[0])
    g_comp = jax.grad(compact_cluster_loss)(params, cluster, neg_pad, cfg,
                                            cc.u_pad, cc.i_pad)
    np.testing.assert_allclose(np.asarray(g_comp.user_emb),
                               np.asarray(g_full.user_emb), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_comp.item_emb),
                               np.asarray(g_full.item_emb), rtol=1e-4, atol=1e-7)


def test_compact_epoch_decreases_loss(tiny_data):
    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 3)
             if p.shape[1] > 0]
    cc = build_compact_clusters(parts, nu, align=8)
    state = create_train_state(cfg, nu, ni)
    fn = make_compact_epoch_fn(cfg)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(4):
        key, sub = jax.random.split(key)
        state, loss = fn(state, cc, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
