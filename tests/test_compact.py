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


def test_lazy_and_hybrid_lr_schedule_support(tiny_data):
    """The fused paths now implement the cosine schedule in-kernel (r5:
    enables hybrid-compact bridge epochs under one shared schedule).
    Misconfiguration (no horizon) must still raise; the jnp schedule must
    match optax.warmup_cosine_decay_schedule pointwise."""
    import optax

    from movie_recommender_system_with_gnns_tpu.training.compact import (
        _make_lr_schedule, make_compact_hybrid_epoch_fn,
        make_compact_lazy_epoch_fn,
    )

    for maker, opt in ((make_compact_lazy_epoch_fn, "lazy_adam"),
                       (make_compact_hybrid_epoch_fn, "hybrid_adam")):
        cfg = Config(train=TrainConfig(optimizer=opt, lr_schedule="cosine",
                                       lr_total_steps=0))
        with pytest.raises(ValueError, match="lr_total_steps"):
            maker(cfg)

    for warm in (0, 7):
        cfg = Config(train=TrainConfig(lr=3e-3, lr_schedule="cosine",
                                       lr_total_steps=50, lr_warmup_steps=warm,
                                       lr_final_frac=0.1))
        lr_of = _make_lr_schedule(cfg)
        ref = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warm > 0 else 3e-3, peak_value=3e-3,
            warmup_steps=warm, decay_steps=50, end_value=3e-4)
        for t in [0, 1, 6, 7, 8, 25, 49, 50, 60]:
            np.testing.assert_allclose(
                float(lr_of(jnp.asarray(t, jnp.int32))), float(ref(t)),
                rtol=1e-5, atol=1e-9, err_msg=f"warm={warm} t={t}")


def test_adam_state_conversion_roundtrip(tiny_data):
    """optax ↔ LazyAdamState conversion (the bridge's trainer-switch glue):
    roundtrip preserves moments/count, and a converted state keeps training
    under the other trainer with finite decreasing loss."""
    import optax

    from movie_recommender_system_with_gnns_tpu.training.compact import (
        init_lazy_adam, lazy_state_from_optax, lazy_state_to_optax,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import (
        make_optimizer,
    )

    nu, ni = tiny_data.num_users, tiny_data.num_items
    cfg = Config(model=ModelConfig(num_layers=2, dim=8),
                 train=TrainConfig(lr=1e-2))
    params = init_params(jax.random.PRNGKey(11), nu, ni, 8)
    opt = make_optimizer(cfg)
    ost = opt.init(params)
    # push one real optax step so moments are nonzero
    g = jax.tree.map(jnp.ones_like, params)
    upd, ost = opt.update(g, ost, params)

    lz = lazy_state_from_optax(ost)
    assert int(lz.count) == 1
    template = jax.eval_shape(opt.init, params)
    back = lazy_state_to_optax(lz, template)
    for a, b in zip(jax.tree_util.tree_leaves(ost),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # mini-bridge: adam epoch -> convert -> hybrid epoch -> convert back
    parts = [p for p in partition_bipartite_greedy(
        tiny_data.edge_index, nu, nu + ni, 2) if p.shape[1] > 0]
    cc = build_compact_clusters(parts, nu, align=8)
    cfg_a = Config(model=ModelConfig(num_layers=2, dim=8),
                   train=TrainConfig(lr=1e-2, optimizer="adam"))
    cfg_h = Config(model=ModelConfig(num_layers=2, dim=8),
                   train=TrainConfig(lr=1e-2, optimizer="hybrid_adam"))
    state = create_train_state(cfg_a, nu, ni)
    fn_a = make_compact_epoch_fn(cfg_a)
    fn_h = make_compact_epoch_fn(cfg_h)
    state, l0 = fn_a(state, cc, jax.random.PRNGKey(0))
    hstate = TrainState(state.params, lazy_state_from_optax(state.opt_state),
                        state.step)
    hstate, l1 = fn_h(hstate, cc, jax.random.PRNGKey(1))
    back_state = TrainState(
        hstate.params,
        lazy_state_to_optax(hstate.opt_state,
                            jax.eval_shape(make_optimizer(cfg_a).init,
                                           hstate.params)),
        hstate.step)
    back_state, l2 = fn_a(back_state, cc, jax.random.PRNGKey(2))
    assert np.isfinite([float(l0), float(l1), float(l2)]).all()
    assert float(l2) < float(l0)


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


# ---------------------------------------------------------------------------
# Boundary-embedding correction (VERDICT r4 item 1)
# ---------------------------------------------------------------------------


def _full_hybrid(tiny_data, cfg, num_parts=3):
    from movie_recommender_system_with_gnns_tpu.data.partition import (
        partition_assignments,
    )
    from movie_recommender_system_with_gnns_tpu.ops.spmm import build_hybrid_graph

    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    pu, pi = partition_assignments(tiny_data.edge_index, nu, n, num_parts)
    node_part = np.concatenate([pu, pi])
    # f32 blocks so the corrected-compact vs full-graph comparison is tight
    return build_hybrid_graph(tiny_data.edge_index, n, node_part, num_parts,
                              block_dtype=jnp.float32)


def test_boundary_correction_reproduces_full_propagation(tiny_data):
    """At frozen params, corrected compact propagation == the full-graph
    layers on the cluster's nodes (the induction in _propagate_local)."""
    from movie_recommender_system_with_gnns_tpu.ops.spmm import spmm_hybrid
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        _propagate_local, build_boundary_correction,
    )

    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 3)
             if p.shape[1] > 0]
    params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
    cc = build_compact_clusters(parts, nu, align=8)
    hybrid = _full_hybrid(tiny_data, cfg)
    corr, neg_rest = build_boundary_correction(params, hybrid, cc, cfg, nu)
    assert corr.shape == (cc.num_clusters, cfg.model.num_layers,
                          cc.u_pad + cc.i_pad, cfg.model.dim)
    assert neg_rest.shape == (ni, cfg.model.dim)

    # full-graph accumulator (same op the corr builder used)
    emb = jnp.concatenate([params.user_emb, params.item_emb], axis=0)
    acc_full = emb
    x = emb
    for _ in range(cfg.model.num_layers):
        x = spmm_hybrid(hybrid, x)
        acc_full = acc_full + x

    for ci in range(cc.num_clusters):
        ids = np.concatenate([np.asarray(cc.user_ids[ci]),
                              nu + np.asarray(cc.item_ids[ci])])
        local_emb = jnp.concatenate([params.user_emb[cc.user_ids[ci]],
                                     params.item_emb[cc.item_ids[ci]]], axis=0)
        acc_c = _propagate_local(local_emb, cc.src[ci], cc.dst[ci], cc.w[ci],
                                 None, cfg.model.num_layers,
                                 cc.u_pad + cc.i_pad, corr=corr[ci])
        np.testing.assert_allclose(np.asarray(acc_c),
                                   np.asarray(acc_full)[ids],
                                   rtol=1e-4, atol=1e-6)


def test_boundary_correction_loss_closer_to_fullgraph(tiny_data):
    """Compact-with-correction loss must be closer to the full-graph loss than
    compact-without (the VERDICT r4 item 1 acceptance test) — and, at frozen
    params, nearly equal to it."""
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        build_boundary_correction,
    )

    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 3)
             if p.shape[1] > 0]
    params = init_params(jax.random.PRNGKey(2), nu, ni, cfg.model.dim)
    cc = build_compact_clusters(parts, nu, align=8)
    hybrid = _full_hybrid(tiny_data, cfg)
    corr, neg_rest = build_boundary_correction(params, hybrid, cc, cfg, nu)

    full_graph = DeviceCOO.from_host(COOGraph.build(tiny_data.edge_index, n))
    worse = better = 0.0
    for ci, part in enumerate(parts):
        batch = triplets_from_edges(part, nu)
        neg = jax.random.randint(jax.random.PRNGKey(100 + ci),
                                 (batch.user.shape[0],), 0, ni, dtype=jnp.int32)
        # truth: the SAME cluster triplets under FULL-graph propagation
        loss_full = float(compute_loss(params, full_graph, batch, neg, cfg))
        b_pad = cc.user_local.shape[1]
        neg_pad = jnp.concatenate(
            [neg, jnp.zeros((b_pad - neg.shape[0],), jnp.int32)])
        cluster = (cc.user_ids[ci], cc.item_ids[ci], cc.src[ci], cc.dst[ci],
                   cc.w[ci], cc.user_local[ci], cc.pos_local[ci], cc.mask[ci])
        l_nocorr = float(compact_cluster_loss(params, cluster, neg_pad, cfg,
                                              cc.u_pad, cc.i_pad))
        l_corr = float(compact_cluster_loss(params, cluster, neg_pad, cfg,
                                            cc.u_pad, cc.i_pad,
                                            corr=corr[ci], neg_rest=neg_rest))
        worse += abs(l_nocorr - loss_full)
        better += abs(l_corr - loss_full)
        # frozen-params correction is exact up to fp reassociation
        np.testing.assert_allclose(l_corr, loss_full, rtol=2e-4, atol=1e-6)
    assert better < worse


def test_corrected_epoch_runs_all_optimizers(tiny_data):
    """Every compact epoch fn accepts a corrected cluster set (dense adj too)
    and still trains."""
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        build_boundary_correction, create_lazy_train_state, densify_adjacency,
    )

    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 3)
             if p.shape[1] > 0]
    for optname in ["adam", "lazy_adam", "hybrid_adam"]:
        cfg = Config(model=ModelConfig(num_layers=2, dim=8),
                     train=TrainConfig(lr=1e-2, optimizer=optname))
        cc = densify_adjacency(build_compact_clusters(parts, nu, align=8),
                               dtype=jnp.float32)
        hybrid = _full_hybrid(tiny_data, cfg)
        params = init_params(jax.random.PRNGKey(3), nu, ni, cfg.model.dim)
        corr, neg_rest = build_boundary_correction(params, hybrid, cc, cfg, nu)
        cc = cc.with_correction(corr, neg_rest)
        if optname == "adam":
            state = create_train_state(cfg, nu, ni)
        else:
            state = TrainState(params=params,
                               opt_state=__import__(
                                   "movie_recommender_system_with_gnns_tpu.training.compact",
                                   fromlist=["init_lazy_adam"]).init_lazy_adam(params),
                               step=jnp.zeros((), jnp.int32))
        fn = make_compact_epoch_fn(cfg)
        key = jax.random.PRNGKey(0)
        losses = []
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, loss = fn(state, cc, sub)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


def test_lazy_item_adam_first_step_matches_hybrid(tiny_data):
    """lazy_item_adam's item update is the optax-form Adam on touched rows:
    from zero moments, the FIRST optimizer step's item table must match
    hybrid_adam's exactly (untouched rows have zero grad AND zero moments, so
    dense Adam also leaves them unchanged); user paths are identical."""
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        init_lazy_adam,
    )

    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 1)
             if p.shape[1] > 0]          # ONE cluster -> epoch == one step
    cc = build_compact_clusters(parts, nu, align=8)
    outs = {}
    for opt in ["hybrid_adam", "lazy_item_adam"]:
        # rebuild per run: the epoch fn DONATES its state buffers
        params = init_params(jax.random.PRNGKey(7), nu, ni, 8)
        cfg = Config(model=ModelConfig(num_layers=2, dim=8),
                     train=TrainConfig(lr=1e-2, optimizer=opt, num_clusters=1))
        state = TrainState(params=params, opt_state=init_lazy_adam(params),
                           step=jnp.zeros((), jnp.int32))
        fn = make_compact_epoch_fn(cfg)
        st, loss = fn(state, cc, jax.random.PRNGKey(4))
        outs[opt] = (np.asarray(st.params.item_emb),
                     np.asarray(st.params.user_emb), float(loss))
    np.testing.assert_allclose(outs["lazy_item_adam"][0],
                               outs["hybrid_adam"][0], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(outs["lazy_item_adam"][1],
                               outs["hybrid_adam"][1], rtol=1e-6, atol=1e-7)
    assert outs["lazy_item_adam"][2] == outs["hybrid_adam"][2]


def test_lazy_item_adam_trains(tiny_data):
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        init_lazy_adam,
    )

    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in partition_bipartite_greedy(tiny_data.edge_index, nu, n, 3)
             if p.shape[1] > 0]
    cc = build_compact_clusters(parts, nu, align=8)
    cfg = Config(model=ModelConfig(num_layers=2, dim=8),
                 train=TrainConfig(lr=1e-2, optimizer="lazy_item_adam"))
    params = init_params(jax.random.PRNGKey(8), nu, ni, 8)
    state = TrainState(params=params, opt_state=init_lazy_adam(params),
                       step=jnp.zeros((), jnp.int32))
    fn = make_compact_epoch_fn(cfg)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, loss = fn(state, cc, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
