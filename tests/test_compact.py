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
    TrainState, compute_loss, create_train_state, make_optimizer,
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


def test_lazy_adam_matches_dense_when_cluster_covers_all(tiny_data):
    """With ONE cluster covering every node and negatives forced unique &
    disjoint from positives... lazy and dense Adam still differ on untouched
    rows only; with full coverage + all rows touched, the first step must
    match dense Adam closely."""
    cfg = Config(model=ModelConfig(num_layers=1, dim=8),
                 train=TrainConfig(lr=1e-2, optimizer="lazy_adam", num_clusters=1))
    nu, ni = tiny_data.num_users, tiny_data.num_items
    parts = [tiny_data.edge_index]
    cc = build_compact_clusters(parts, nu, align=8)
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        create_lazy_train_state, make_compact_lazy_epoch_fn,
    )
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params

    params = init_params(jax.random.PRNGKey(0), nu, ni, 8)
    # the epoch fns DONATE their input state — give each path its own copy
    copy = lambda p: jax.tree.map(lambda x: jnp.array(np.asarray(x)), p)
    lazy_state = create_lazy_train_state(cfg, copy(params))
    fn = make_compact_lazy_epoch_fn(cfg)
    key = jax.random.PRNGKey(5)
    lazy_state, loss_lazy = fn(lazy_state, cc, key)
    assert np.isfinite(float(loss_lazy))

    # dense path on the same single cluster (same permutation is trivial: K=1;
    # same neg draw since both use split(neg_key, 1)[0])
    cfg_d = Config(model=ModelConfig(num_layers=1, dim=8),
                   train=TrainConfig(lr=1e-2, num_clusters=1))
    dense_params = copy(params)
    dense_state = TrainState(dense_params, make_optimizer(cfg_d).init(dense_params),
                             jnp.zeros((), jnp.int32))
    fn_d = make_compact_epoch_fn(cfg_d)
    dense_state, loss_dense = fn_d(dense_state, cc, key)

    np.testing.assert_allclose(float(loss_lazy), float(loss_dense), rtol=1e-5)
    # params after one step: identical on rows with gradients; rows never
    # touched (no interactions) may differ by the dense-Adam zero-grad update
    du = np.abs(np.asarray(lazy_state.params.user_emb) -
                np.asarray(dense_state.params.user_emb))
    assert np.median(du) < 1e-6 or du.max() < 5e-3


def test_lazy_adam_trains(tiny_data):
    cfg = Config(model=ModelConfig(num_layers=2, dim=8),
                 train=TrainConfig(lr=1e-2, optimizer="lazy_adam"))
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 3)
             if p.shape[1] > 0]
    cc = build_compact_clusters(parts, nu, align=8)
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        create_lazy_train_state,
    )
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params

    state = create_lazy_train_state(cfg, init_params(jax.random.PRNGKey(1), nu, ni, 8))
    fn = make_compact_epoch_fn(cfg)   # dispatches to lazy via cfg
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(5):
        key, sub = jax.random.split(key)
        state, loss = fn(state, cc, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.opt_state.count) == 5 * len(parts)


def test_hybrid_adam_item_table_matches_dense_adam(tiny_data):
    """hybrid_adam's ITEM table is exact dense Adam: over several epochs it
    must track the optax dense-adam trainer bit-for-bit-ish, because (a) the
    clip norm is identical (user_ids are unique per cluster, so the masked
    row-grad norm equals the dense user-grad norm) and (b) untouched user rows
    (isolated nodes) never influence propagation or the loss."""
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        create_lazy_train_state, make_compact_hybrid_epoch_fn,
    )
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params

    nu, ni = tiny_data.num_users, tiny_data.num_items
    parts = [tiny_data.edge_index]  # one cluster -> every interacting row moves
    cc = build_compact_clusters(parts, nu, align=8)
    params = init_params(jax.random.PRNGKey(0), nu, ni, 8)
    copy = lambda p: jax.tree.map(lambda x: jnp.array(np.asarray(x)), p)

    cfg_h = Config(model=ModelConfig(num_layers=2, dim=8),
                   train=TrainConfig(lr=1e-2, optimizer="hybrid_adam",
                                     num_clusters=1))
    h_state = create_lazy_train_state(cfg_h, copy(params))
    fn_h = make_compact_hybrid_epoch_fn(cfg_h)

    cfg_d = Config(model=ModelConfig(num_layers=2, dim=8),
                   train=TrainConfig(lr=1e-2, num_clusters=1))
    d_params = copy(params)
    d_state = TrainState(d_params, make_optimizer(cfg_d).init(d_params),
                         jnp.zeros((), jnp.int32))
    fn_d = make_compact_epoch_fn(cfg_d)

    key = jax.random.PRNGKey(7)
    for _ in range(3):
        key, sub = jax.random.split(key)
        h_state, loss_h = fn_h(h_state, cc, sub)
        d_state, loss_d = fn_d(d_state, cc, sub)
        np.testing.assert_allclose(float(loss_h), float(loss_d), rtol=1e-5)
    # atol 1e-5: touched USER rows under the lazy rule differ from optax by
    # the eps placement (~1e-8 relative), which feeds back through propagation
    # into later-epoch item grads — measured max |Δ| 8e-6 after 3 epochs
    np.testing.assert_allclose(np.asarray(h_state.params.item_emb),
                               np.asarray(d_state.params.item_emb),
                               rtol=1e-3, atol=1e-5)
    # user rows WITH gradients must match dense adam on the first epoch's
    # clusters too (moments start at zero); over 3 epochs small drift from
    # the eps placement in the lazy rule is allowed
    du = np.abs(np.asarray(h_state.params.user_emb) -
                np.asarray(d_state.params.user_emb))
    assert du.max() < 5e-3


def test_hybrid_adam_trains(tiny_data):
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        create_lazy_train_state,
    )
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params

    cfg = Config(model=ModelConfig(num_layers=2, dim=8),
                 train=TrainConfig(lr=1e-2, optimizer="hybrid_adam"))
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 3)
             if p.shape[1] > 0]
    cc = build_compact_clusters(parts, nu, align=8)
    state = create_lazy_train_state(cfg, init_params(jax.random.PRNGKey(1), nu, ni, 8))
    fn = make_compact_epoch_fn(cfg)   # dispatches to hybrid via cfg
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(5):
        key, sub = jax.random.split(key)
        state, loss = fn(state, cc, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.opt_state.count) == 5 * len(parts)


def test_lazy_and_hybrid_reject_lr_schedule(tiny_data):
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        make_compact_hybrid_epoch_fn, make_compact_lazy_epoch_fn,
    )

    for maker, opt in ((make_compact_lazy_epoch_fn, "lazy_adam"),
                       (make_compact_hybrid_epoch_fn, "hybrid_adam")):
        cfg = Config(train=TrainConfig(optimizer=opt, lr_schedule="cosine",
                                       lr_total_steps=10))
        with pytest.raises(ValueError, match="lr_schedule"):
            maker(cfg)


def test_dense_adjacency_matches_segment(tiny_data):
    """Densified-Â propagation (MXU path) ≡ segment-sum path (f32 adj)."""
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        densify_adjacency,
    )

    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 2)
             if p.shape[1] > 0]
    params = init_params(jax.random.PRNGKey(2), nu, ni, cfg.model.dim)
    cc = build_compact_clusters(parts, nu, align=8)
    ccd = densify_adjacency(cc, dtype=jnp.float32)

    for ci in range(len(parts)):
        neg = jax.random.randint(jax.random.PRNGKey(ci), (cc.user_local.shape[1],),
                                 0, ni, dtype=jnp.int32)
        cluster = (cc.user_ids[ci], cc.item_ids[ci], cc.src[ci], cc.dst[ci],
                   cc.w[ci], cc.user_local[ci], cc.pos_local[ci], cc.mask[ci])
        l_seg = compact_cluster_loss(params, cluster, neg, cfg, cc.u_pad, cc.i_pad)
        l_dense = compact_cluster_loss(params, cluster, neg, cfg, cc.u_pad,
                                       cc.i_pad, adj=ccd.adj[ci])
        np.testing.assert_allclose(float(l_dense), float(l_seg), rtol=1e-5)


def test_dense_adjacency_epoch_runs(tiny_data):
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        densify_adjacency,
    )

    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 3)
             if p.shape[1] > 0]
    cc = densify_adjacency(build_compact_clusters(parts, nu, align=8))
    state = create_train_state(cfg, nu, ni)
    fn = make_compact_epoch_fn(cfg)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(3):
        key, sub = jax.random.split(key)
        state, loss = fn(state, cc, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
