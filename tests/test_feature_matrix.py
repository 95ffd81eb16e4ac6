"""Full trainer feature matrix: every TrainConfig combination must produce the
same math (round-1 verdict item — no warning-shaped holes).

Covered here:
  * compact trainer with ``num_negatives > 1`` ≡ full-node-space loss/grads
    (the out-of-cluster analytic finals extend to (B, K) negatives);
  * fused Pallas BPR with K>1 ≡ the XLA path (the kernel runs on B·K expanded
    triplets — equivalence derivation in training/compact.py::_triplet_loss);
  * fused BPR under lazy_adam (the kernel's custom VJP chains through the
    propagation to the gathered rows);
  * fused BPR under the data-parallel shard_map trainer (check_vma=False lets
    pallas_call lower inside the mesh body).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from movie_recommender_system_with_gnns_tpu.config import (
    Config, ModelConfig, TrainConfig,
)
from movie_recommender_system_with_gnns_tpu.data.graph import COOGraph
from movie_recommender_system_with_gnns_tpu.data.partition import (
    partition_bipartite_greedy,
)
from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
from movie_recommender_system_with_gnns_tpu.ops.sampling import (
    sample_negative, triplets_from_edges,
)
from movie_recommender_system_with_gnns_tpu.ops.spmm import DeviceCOO
from movie_recommender_system_with_gnns_tpu.parallel.mesh import make_mesh
from movie_recommender_system_with_gnns_tpu.training.compact import (
    build_compact_clusters, compact_cluster_loss, create_lazy_train_state,
    densify_adjacency, make_compact_epoch_fn,
)
from movie_recommender_system_with_gnns_tpu.training.compact_sharded import (
    make_compact_sharded_epoch_fn,
)
from movie_recommender_system_with_gnns_tpu.training.train import (
    TrainState, compute_loss, make_optimizer,
)


def _cfg(**train_kw):
    return Config(model=ModelConfig(num_layers=2, dim=8),
                  train=TrainConfig(lr=1e-2, **train_kw))


def _compact(tiny_data, num_parts=3, dense=False, align=8):
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = [p for p in
             partition_bipartite_greedy(tiny_data.edge_index, nu, n, num_parts)
             if p.shape[1] > 0]
    while len(parts) < num_parts:
        parts.append(parts[-1][:, :2])
    cc = build_compact_clusters(parts, nu, align=align)
    if dense:
        cc = densify_adjacency(cc, dtype=jnp.float32)
    return parts, cc


def _cluster(cc, ci):
    return (cc.user_ids[ci], cc.item_ids[ci], cc.src[ci], cc.dst[ci],
            cc.w[ci], cc.user_local[ci], cc.pos_local[ci], cc.mask[ci])


def test_compact_multineg_matches_full_space(tiny_data):
    """compact_cluster_loss with (B, K) negatives ≡ compute_loss on the same
    cluster with the same (B, K) negatives — loss AND grads."""
    cfg = _cfg(num_negatives=3)
    nu, ni = tiny_data.num_users, tiny_data.num_items
    parts, cc = _compact(tiny_data, num_parts=2)
    params = init_params(jax.random.PRNGKey(1), nu, ni, cfg.model.dim)

    part = parts[0]
    graph = DeviceCOO.from_host(COOGraph.build(part, nu + ni))
    batch = triplets_from_edges(part, nu)
    b = batch.user.shape[0]
    neg = sample_negative(jax.random.PRNGKey(5), b, ni, num=3)
    lf, g_full = jax.value_and_grad(compute_loss)(params, graph, batch, neg, cfg)

    b_pad = cc.user_local.shape[1]
    neg_pad = jnp.concatenate(
        [neg, jnp.zeros((b_pad - b, 3), jnp.int32)], axis=0)
    lc, g_comp = jax.value_and_grad(compact_cluster_loss)(
        params, _cluster(cc, 0), neg_pad, cfg, cc.u_pad, cc.i_pad)
    np.testing.assert_allclose(float(lc), float(lf), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_comp.user_emb),
                               np.asarray(g_full.user_emb), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_comp.item_emb),
                               np.asarray(g_full.item_emb), rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("loss_name", ["reference", "standard"])
def test_fused_multineg_matches_xla(tiny_data, loss_name):
    """Fused kernel on B·K expanded triplets ≡ XLA (B, K) path."""
    _, cc = _compact(tiny_data, num_parts=2, dense=True)
    nu, ni = tiny_data.num_users, tiny_data.num_items
    params = init_params(jax.random.PRNGKey(2), nu, ni, 8)
    cfg_x = _cfg(num_negatives=4, loss=loss_name)
    cfg_f = _cfg(num_negatives=4, loss=loss_name, fused_bpr=True)
    neg = sample_negative(jax.random.PRNGKey(6), cc.user_local.shape[1], ni,
                          num=4)
    adj = cc.adj[0]
    lx, gx = jax.value_and_grad(compact_cluster_loss)(
        params, _cluster(cc, 0), neg, cfg_x, cc.u_pad, cc.i_pad, adj)
    lf, gf = jax.value_and_grad(compact_cluster_loss)(
        params, _cluster(cc, 0), neg, cfg_f, cc.u_pad, cc.i_pad, adj)
    assert abs(float(lx) - float(lf)) < 5e-4
    for a, b in [(gx.user_emb, gf.user_emb), (gx.item_emb, gf.item_emb)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 1e-2, f"grad rel err {rel}"


def test_fused_k_identical_negatives_match_single(tiny_data):
    """K copies of the same negative through the fused expansion == K=1 loss
    (exact decomposition check for the B·K flattening)."""
    _, cc = _compact(tiny_data, num_parts=2, dense=True)
    nu, ni = tiny_data.num_users, tiny_data.num_items
    params = init_params(jax.random.PRNGKey(4), nu, ni, 8)
    neg1 = sample_negative(jax.random.PRNGKey(8), cc.user_local.shape[1], ni)
    negk = jnp.repeat(neg1[:, None], 5, axis=1)
    adj = cc.adj[0]
    cfg1 = _cfg(fused_bpr=True)
    cfgk = _cfg(fused_bpr=True, num_negatives=5)
    l1 = compact_cluster_loss(params, _cluster(cc, 0), neg1, cfg1,
                              cc.u_pad, cc.i_pad, adj)
    lk = compact_cluster_loss(params, _cluster(cc, 0), negk, cfgk,
                              cc.u_pad, cc.i_pad, adj)
    assert abs(float(l1) - float(lk)) < 1e-5


def test_lazy_adam_fused_matches_xla_path(tiny_data):
    """lazy_adam + fused_bpr: one epoch's parameters match the XLA-loss lazy
    epoch within bf16 MXU-gather rounding."""
    nu, ni = tiny_data.num_users, tiny_data.num_items
    _, cc = _compact(tiny_data, num_parts=3, dense=True)

    def run(fused):
        cfg = _cfg(optimizer="lazy_adam", fused_bpr=fused, num_clusters=3)
        params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
        state = create_lazy_train_state(cfg, params)
        fn = make_compact_epoch_fn(cfg)
        state, loss = fn(state, cc, jax.random.PRNGKey(42))
        return np.asarray(state.params.user_emb), float(loss)

    p_x, l_x = run(False)
    p_f, l_f = run(True)
    assert abs(l_x - l_f) < 5e-4
    # params moved by ~lr per touched row; bf16 gather rounding perturbs the
    # Adam direction slightly — bound the relative table difference
    rel = np.abs(p_x - p_f).max() / (np.abs(p_x).max() + 1e-12)
    assert rel < 5e-3, f"lazy fused vs xla param rel err {rel}"
    assert np.isfinite(l_f)


def test_lazy_adam_multineg_trains(tiny_data):
    nu, ni = tiny_data.num_users, tiny_data.num_items
    _, cc = _compact(tiny_data, num_parts=3)
    cfg = _cfg(optimizer="lazy_adam", num_negatives=4, num_clusters=3)
    params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
    state = create_lazy_train_state(cfg, params)
    fn = make_compact_epoch_fn(cfg)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, loss = fn(state, cc, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_compact_multineg_epoch_trains(tiny_data):
    nu, ni = tiny_data.num_users, tiny_data.num_items
    _, cc = _compact(tiny_data, num_parts=3)
    cfg = _cfg(num_negatives=4)
    params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
    opt = make_optimizer(cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    fn = make_compact_epoch_fn(cfg)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, loss = fn(state, cc, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_sharded_fused_bpr_matches_xla(tiny_data):
    """Data-parallel shard_map trainer with fused_bpr=True must lower (pallas
    inside the mesh body) and match the XLA-path superstep loss; K>1 rides
    along."""
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    nu, ni = tiny_data.num_users, tiny_data.num_items
    _, cc = _compact(tiny_data, num_parts=4, dense=True)

    def run(fused):
        cfg = _cfg(fused_bpr=fused, num_negatives=2)
        params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
        opt = make_optimizer(cfg)
        state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
        fn = make_compact_sharded_epoch_fn(cfg, mesh)(cc)
        state, loss = fn(state, cc, jax.random.PRNGKey(7))
        return np.asarray(state.params.user_emb), float(loss)

    p_x, l_x = run(False)
    p_f, l_f = run(True)
    assert abs(l_x - l_f) < 5e-4
    rel = np.abs(p_x - p_f).max() / (np.abs(p_x).max() + 1e-12)
    assert rel < 5e-3, f"sharded fused vs xla param rel err {rel}"
