"""Mesh-sharded trainer tests on the 8-virtual-CPU-device mesh (conftest sets
--xla_force_host_platform_device_count=8): the sharded step must match the
single-device trainer numerically, and sharded MIPS must match local MIPS."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from movie_recommender_system_with_gnns_tpu.config import Config, ModelConfig, TrainConfig
from movie_recommender_system_with_gnns_tpu.data.graph import COOGraph
from movie_recommender_system_with_gnns_tpu.models.lightgcn import LightGCNParams, init_params
from movie_recommender_system_with_gnns_tpu.ops.sampling import TripletBatch, triplets_from_edges
from movie_recommender_system_with_gnns_tpu.ops.spmm import DeviceCOO
from movie_recommender_system_with_gnns_tpu.ops.topk import mips_topk
from movie_recommender_system_with_gnns_tpu.parallel.mesh import make_mesh
from movie_recommender_system_with_gnns_tpu.parallel.sharding import (
    ShardPlan, make_sharded_mips, make_sharded_train_step, pad_params,
    shard_graph, unpad_params,
)
from movie_recommender_system_with_gnns_tpu.training.train import compute_loss


def _cfg():
    return Config(model=ModelConfig(num_layers=2, dim=8),
                  train=TrainConfig(lr=1e-2))


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(data_parallel=2, model_parallel=4)


def test_sharded_matches_single_device(tiny_data, mesh):
    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    e = tiny_data.edge_index
    plan = ShardPlan.create(nu, ni, pm=4)

    params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
    batch = triplets_from_edges(e, nu, pad_to=2048)
    neg = jax.random.randint(jax.random.PRNGKey(7), (2048,), 0, ni, dtype=jnp.int32)

    # --- single-device reference step (same math as training.train) ---
    coo = DeviceCOO.from_host(COOGraph.build(e, nu + ni))
    loss_ref, grads_ref = jax.value_and_grad(compute_loss)(params, coo, batch, neg, cfg)
    opt = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip_norm),
                      optax.adam(cfg.train.lr))
    upd, _ = opt.update(grads_ref, opt.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    # --- sharded step ---
    p_pad = pad_params(params, plan)
    adam = optax.adam(cfg.train.lr)
    state = (p_pad, adam.init(p_pad), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(cfg, mesh, plan, opt=adam)(state)
    g = shard_graph(e, plan)
    state2, loss_sh = step(state, g, batch, neg)
    p_new = unpad_params(state2[0], plan)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(p_new.user_emb),
                               np.asarray(params_ref.user_emb), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_new.item_emb),
                               np.asarray(params_ref.item_emb), rtol=2e-4, atol=1e-6)


def test_sharded_step_runs_multiple(tiny_data, mesh):
    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    plan = ShardPlan.create(nu, ni, pm=4)
    params = pad_params(init_params(jax.random.PRNGKey(1), nu, ni, cfg.model.dim), plan)
    adam = optax.adam(cfg.train.lr)
    state = (params, adam.init(params), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(cfg, mesh, plan, opt=adam)(state)
    g = shard_graph(tiny_data.edge_index, plan)
    batch = triplets_from_edges(tiny_data.edge_index, nu, pad_to=2048)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(3):
        key, sub = jax.random.split(key)
        neg = jax.random.randint(sub, (2048,), 0, ni, dtype=jnp.int32)
        state, loss = step(state, g, batch, neg)
        losses.append(float(loss))
    assert losses[2] < losses[0]
    assert int(state[2]) == 3


def test_sharded_mips_matches_local(mesh, rng):
    q = rng.standard_normal((6, 16)).astype(np.float32)
    c = rng.standard_normal((512, 16)).astype(np.float32)
    fn = make_sharded_mips(mesh, k=8, block=64)
    s_sh, i_sh = fn(jnp.asarray(q), jnp.asarray(c))
    s_loc, i_loc = mips_topk(jnp.asarray(q), jnp.asarray(c), k=8, block=64)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_loc), rtol=1e-4, atol=1e-5)


def test_sharded_driver_end_to_end(tiny_data, mesh, tmp_path):
    """train_model_sharded over the CPU mesh: losses fall, checkpoint fires."""
    from movie_recommender_system_with_gnns_tpu.config import Config, DataConfig
    from movie_recommender_system_with_gnns_tpu.data.movielens import split_edges
    from movie_recommender_system_with_gnns_tpu.training.distributed import (
        train_model_sharded,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import build_eval_batch

    cfg = Config(
        model=ModelConfig(num_layers=2, dim=8),
        train=TrainConfig(epochs=3, lr=1e-2, recall_sample_size=16,
                          recall_num_samples=2, eval_top_k=10),
    )
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    train_e, val_e, test_e = split_edges(tiny_data, str(tmp_path / "idx"))
    val = build_eval_batch(val_e, n, nu)
    test = build_eval_batch(test_e, n, nu)
    saved = {}
    params, hist = train_model_sharded(
        cfg, nu, ni, train_e, val, test, mesh=mesh,
        save_checkpoint=lambda p, r: saved.update(recall=r))
    assert params.user_emb.shape == (nu, 8)
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert "test_loss" in hist


def test_sharded_minibatch_and_chunked(tiny_data, mesh, tmp_path):
    """Milestone-3 knobs: triplet minibatching + chunked propagation."""
    from movie_recommender_system_with_gnns_tpu.data.movielens import split_edges
    from movie_recommender_system_with_gnns_tpu.training.distributed import (
        train_model_sharded,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import build_eval_batch

    cfg = Config(
        model=ModelConfig(num_layers=2, dim=8),
        train=TrainConfig(epochs=2, lr=1e-2, batch_size=256, spmm_chunks=2,
                          recall_sample_size=16, recall_num_samples=2,
                          eval_top_k=10),
    )
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    train_e, val_e, test_e = split_edges(tiny_data, str(tmp_path / "idx2"))
    val = build_eval_batch(val_e, n, nu)
    test = build_eval_batch(test_e, n, nu)
    params, hist = train_model_sharded(cfg, nu, ni, train_e, val, test, mesh=mesh)
    assert np.isfinite(hist["train_loss"][-1])
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def _node_part(tiny_data, parts=4):
    from movie_recommender_system_with_gnns_tpu.data.partition import (
        partition_assignments,
    )

    nu = tiny_data.num_users
    n = nu + tiny_data.num_items
    pu, pi = partition_assignments(tiny_data.edge_index, nu, n, parts)
    return np.concatenate([pu, pi])


def test_sharded_hybrid_matches_single_device_hybrid(tiny_data, mesh):
    """VERDICT r1 item 1: the mesh hybrid step must reproduce the single-chip
    hybrid trainer (dense MXU blocks + symmetric-A-hat VJP) numerically."""
    from movie_recommender_system_with_gnns_tpu.ops.spmm import (
        build_hybrid_graph, spmm_hybrid_sym,
    )
    from movie_recommender_system_with_gnns_tpu.parallel.sharding import (
        shard_hybrid_graph,
    )

    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    e = tiny_data.edge_index
    node_part = _node_part(tiny_data)
    plan = ShardPlan.create(nu, ni, pm=4)

    params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
    batch = triplets_from_edges(e, nu, pad_to=2048)
    neg = jax.random.randint(jax.random.PRNGKey(7), (2048,), 0, ni, dtype=jnp.int32)

    # --- single-device hybrid reference step (f32 blocks for exactness) ---
    h = build_hybrid_graph(e, n, node_part, 4, align=8, block_dtype=jnp.float32)
    loss_ref, grads_ref = jax.value_and_grad(compute_loss)(
        params, h, batch, neg, cfg, spmm_hybrid_sym)
    opt = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip_norm),
                      optax.adam(cfg.train.lr))
    upd, _ = opt.update(grads_ref, opt.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    # --- sharded hybrid step (symmetric VJP on) ---
    p_pad = pad_params(params, plan)
    adam = optax.adam(cfg.train.lr)
    state = (p_pad, adam.init(p_pad), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(cfg, mesh, plan, opt=adam, hybrid=True,
                                   symmetric=True)(state)
    g = shard_hybrid_graph(e, plan, node_part, 4, align=8,
                           block_dtype=jnp.float32)
    state2, loss_sh = step(state, g, batch, neg)
    p_new = unpad_params(state2[0], plan)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(p_new.user_emb),
                               np.asarray(params_ref.user_emb), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_new.item_emb),
                               np.asarray(params_ref.item_emb), rtol=2e-4, atol=1e-6)


def test_sharded_hybrid_ghost_columns_match_single_device(tiny_data, mesh):
    """r5 ghost source columns (VERDICT r4 item 3): absorbing off-part hub
    sources into the dense blocks must leave the GLOBAL operator exactly Â —
    one sharded train step with ghost_cap on equals the single-device hybrid
    reference step, and some edges must actually have moved off the ELL
    remainder for the test to mean anything."""
    from movie_recommender_system_with_gnns_tpu.ops.spmm import (
        build_hybrid_graph, spmm_hybrid_sym,
    )
    from movie_recommender_system_with_gnns_tpu.parallel.sharding import (
        shard_hybrid_graph,
    )

    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    e = tiny_data.edge_index
    node_part = _node_part(tiny_data)
    plan = ShardPlan.create(nu, ni, pm=4)

    params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
    batch = triplets_from_edges(e, nu, pad_to=2048)
    neg = jax.random.randint(jax.random.PRNGKey(7), (2048,), 0, ni,
                             dtype=jnp.int32)

    h = build_hybrid_graph(e, n, node_part, 4, align=8,
                           block_dtype=jnp.float32)
    loss_ref, grads_ref = jax.value_and_grad(compute_loss)(
        params, h, batch, neg, cfg, spmm_hybrid_sym)
    opt = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip_norm),
                      optax.adam(cfg.train.lr))
    upd, _ = opt.update(grads_ref, opt.init(params), params)
    params_ref = optax.apply_updates(params, upd)

    p_pad = pad_params(params, plan)
    adam = optax.adam(cfg.train.lr)
    state = (p_pad, adam.init(p_pad), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(cfg, mesh, plan, opt=adam, hybrid=True,
                                   symmetric=True)(state)
    g = shard_hybrid_graph(e, plan, node_part, 4, align=8,
                           block_dtype=jnp.float32,
                           ghost_cap=64, max_block_nodes=4096)
    stats = shard_hybrid_graph.last_stats
    assert stats["absorbed_edges"] > 0, stats
    assert stats["remainder_edges"] < stats["off_diag_edges"]
    state2, loss_sh = step(state, g, batch, neg)
    p_new = unpad_params(state2[0], plan)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(p_new.user_emb),
                               np.asarray(params_ref.user_emb), rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_new.item_emb),
                               np.asarray(params_ref.item_emb), rtol=2e-4,
                               atol=1e-6)


def test_sharded_hybrid_symmetric_vjp_matches_autodiff(tiny_data, mesh):
    """The sharded per-layer symmetric VJP (backward = forward collective
    program) must equal plain autodiff through the sharded hybrid layers."""
    from movie_recommender_system_with_gnns_tpu.parallel.sharding import (
        shard_hybrid_graph,
    )

    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    e = tiny_data.edge_index
    node_part = _node_part(tiny_data)
    plan = ShardPlan.create(nu, ni, pm=4)
    params = init_params(jax.random.PRNGKey(2), nu, ni, cfg.model.dim)
    batch = triplets_from_edges(e, nu, pad_to=2048)
    neg = jax.random.randint(jax.random.PRNGKey(9), (2048,), 0, ni, dtype=jnp.int32)
    g = shard_hybrid_graph(e, plan, node_part, 4, align=8,
                           block_dtype=jnp.float32)
    p_pad = pad_params(params, plan)
    adam = optax.adam(cfg.train.lr)
    state = (p_pad, adam.init(p_pad), jnp.zeros((), jnp.int32))

    outs = []
    for symmetric in (True, False):
        step = make_sharded_train_step(cfg, mesh, plan, opt=adam, hybrid=True,
                                       symmetric=symmetric)(state)
        st2, loss = step(state, g, batch, neg)
        outs.append((float(loss), np.asarray(unpad_params(st2[0], plan).user_emb)))
    assert abs(outs[0][0] - outs[1][0]) < 1e-6
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-7)


def test_sharded_epoch_fn_learns(tiny_data, mesh):
    """The fused scan epoch (shuffle + num_steps sharded hybrid steps in one
    program) runs and decreases the loss over epochs."""
    from movie_recommender_system_with_gnns_tpu.data.partition import forward_half
    from movie_recommender_system_with_gnns_tpu.parallel.sharding import (
        make_sharded_epoch_fn, shard_hybrid_graph,
    )

    cfg = Config(model=ModelConfig(num_layers=2, dim=8),
                 train=TrainConfig(lr=5e-2, fullgraph_steps=2))
    nu, ni = tiny_data.num_users, tiny_data.num_items
    e = tiny_data.edge_index
    node_part = _node_part(tiny_data)
    plan = ShardPlan.create(nu, ni, pm=4)
    g = shard_hybrid_graph(e, plan, node_part, 4, align=8)
    uv = forward_half(e, nu)
    user = jnp.asarray(uv[0].astype(np.int32))
    pos = jnp.asarray(uv[1].astype(np.int32))  # forward_half is item-space

    params = pad_params(init_params(jax.random.PRNGKey(0), nu, ni, 8), plan)
    adam = optax.adam(cfg.train.lr)
    state = (params, adam.init(params), jnp.zeros((), jnp.int32))
    epoch = make_sharded_epoch_fn(cfg, mesh, plan, opt=adam, hybrid=True,
                                  symmetric=True)(state)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(4):
        key, sub = jax.random.split(key)
        state, loss = epoch(state, g, user, pos, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_distributed_init_single_process_noop(capsys):
    """Multi-host bring-up smoke (round-1 verdict item 6): with no coordinator
    arg and no cluster env, distributed_init must return without touching
    jax.distributed; with an explicit coordinator on a single host it must
    swallow the RuntimeError/ValueError rather than crash the trainer."""
    import os

    from movie_recommender_system_with_gnns_tpu.parallel.mesh import (
        distributed_init,
    )

    for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"):
        assert k not in os.environ, f"test env unexpectedly has {k}"
    n_before = jax.device_count()
    distributed_init()                      # pure no-op path
    assert jax.device_count() == n_before

    # Explicit single-process bring-up: jax.distributed.initialize(addr, 1, 0)
    # either succeeds (single-host cluster of 1) or raises because a backend
    # already exists — both must leave the trainer able to proceed.
    distributed_init("localhost:0", num_processes=1, process_id=0)
    assert jax.device_count() == n_before
    out = capsys.readouterr().out
    # if it was skipped, the skip must be reported, not silent
    if "distributed_init skipped" in out:
        assert "skipped:" in out


def test_sharded_serving_tables_match_single_device(tiny_data, mesh):
    """compute_serving_tables(mode='propagated') must give the same tables
    whether it propagates on one device or row-sharded over the mesh."""
    from movie_recommender_system_with_gnns_tpu.serving.recommend import (
        compute_serving_tables,
    )

    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    params = init_params(jax.random.PRNGKey(3), nu, ni, cfg.model.dim)
    ref = compute_serving_tables(params, tiny_data.edge_index, cfg,
                                 mode="propagated")
    sh = compute_serving_tables(params, tiny_data.edge_index, cfg,
                                mode="propagated", mesh=mesh)
    np.testing.assert_allclose(np.asarray(sh.user_emb),
                               np.asarray(ref.user_emb), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh.item_emb),
                               np.asarray(ref.item_emb), rtol=2e-5, atol=1e-6)


def test_sharded_full_ranking_eval_parity(tiny_data, mesh, tmp_path):
    """evaluate_full_ranking with a mesh (catalog sharded over all 8 devices,
    per-shard top-k + merge) must reproduce the single-device metrics, for
    layer-0 and propagated scoring, and must report its timing breakdown."""
    from movie_recommender_system_with_gnns_tpu.data.movielens import split_edges
    from movie_recommender_system_with_gnns_tpu.training.evaluate import (
        evaluate_full_ranking,
    )

    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    params = init_params(jax.random.PRNGKey(5), nu, ni, cfg.model.dim)
    tr, va, te = split_edges(tiny_data, str(tmp_path / "idx"), seed=0)

    for prop in (False, True):
        r_ref, n_ref = evaluate_full_ranking(
            params, tr, te, nu, k=10, batch_users=64,
            use_propagated=prop, cfg=cfg)
        r_sh, n_sh = evaluate_full_ranking(
            params, tr, te, nu, k=10, batch_users=64,
            use_propagated=prop, cfg=cfg, mesh=mesh)
        assert abs(r_ref - r_sh) < 1e-6, (prop, r_ref, r_sh)
        assert abs(n_ref - n_sh) < 1e-6, (prop, n_ref, n_sh)
    t = evaluate_full_ranking.last_timings
    assert t["sharded"] is True and t["eval_users"] > 0
    assert t["total_s"] >= t["mask_build_s"] >= 0.0


@pytest.mark.parametrize("loss", ["reference", "standard"])
def test_sharded_multineg_and_loss_match_single_device(tiny_data, mesh, loss):
    """The mesh trainer honors num_negatives>1 and loss='standard' with the
    same numerics as the single-device compute_loss (feature-matrix parity on
    the scaling path)."""
    cfg = Config(model=ModelConfig(num_layers=2, dim=8),
                 train=TrainConfig(lr=1e-2, loss=loss, num_negatives=3))
    nu, ni = tiny_data.num_users, tiny_data.num_items
    e = tiny_data.edge_index
    plan = ShardPlan.create(nu, ni, pm=4)

    # std well above the reference 0.01: at tiny init the standard loss's
    # gradients are O(1e-6) (near-cancelling softplus'(0) terms), so a
    # post-Adam comparison would amplify float noise into sign flips
    params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim,
                         init_std=0.3)
    batch = triplets_from_edges(e, nu, pad_to=2048)
    neg = jax.random.randint(jax.random.PRNGKey(7), (2048, 3), 0, ni,
                             dtype=jnp.int32)

    coo = DeviceCOO.from_host(COOGraph.build(e, nu + ni))
    loss_ref, grads_ref = jax.value_and_grad(compute_loss)(
        params, coo, batch, neg, cfg)
    gn = np.sqrt(sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads_ref)))
    scale = min(1.0, float(cfg.train.grad_clip_norm) / max(gn, 1e-6))

    # SGD(1.0) makes the step's post-clip GRADIENT observable (params_before −
    # params_after); comparing post-Adam params instead would amplify float
    # noise on near-zero grad entries into ±lr sign flips (Adam's first step
    # is lr·sign(g))
    p_pad = pad_params(params, plan)
    sgd = optax.sgd(1.0)
    state = (p_pad, sgd.init(p_pad), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(cfg, mesh, plan, opt=sgd)(state)
    state2, loss_sh = step(state, shard_graph(e, plan), batch, neg)
    g_sh = unpad_params(jax.tree.map(lambda a, b: a - b, p_pad, state2[0]),
                        plan)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-5)
    # unclipped-gradient comparison: unlike post-Adam params it is NOT
    # invariant to a uniform grad rescale, so it catches reduction-factor
    # bugs (this test found grads = dp x true: the explicit psum(g, 'data')
    # double-counting the loss's internal psum transpose)
    np.testing.assert_allclose(np.asarray(g_sh.user_emb),
                               np.asarray(grads_ref.user_emb) * scale,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_sh.item_emb),
                               np.asarray(grads_ref.item_emb) * scale,
                               rtol=1e-4, atol=1e-6)
