"""Full-graph trainer (training/fullgraph.py): symmetric VJP + equivalence + e2e.

The full-graph regime removes the reference's Cluster-GCN edge-coverage
compromise (data/dataset_handler.py:256-288 keeps only intra-cluster edges):
every step propagates over ALL train edges. These tests prove

  * the symmetric-Â custom VJP equals XLA autodiff's gradient exactly
    (Â = Âᵀ for the undirected GCN-normalized adjacency);
  * the training loss + parameter gradients under hybrid propagation match the
    segment-sum oracle on the same triplets;
  * the end-to-end driver (prepare_training_data → train_model) runs the
    fullgraph trainer and learns.
"""

import jax
import jax.numpy as jnp
import numpy as np

from movie_recommender_system_with_gnns_tpu.config import (
    Config, DataConfig, ModelConfig, TrainConfig,
)


def _tiny_setup(seed=0, users=120, items=200, inter=4000, parts=4):
    from movie_recommender_system_with_gnns_tpu.data.movielens import (
        make_synthetic_movielens,
    )
    from movie_recommender_system_with_gnns_tpu.data.partition import (
        partition_assignments,
    )

    data = make_synthetic_movielens(users, items, inter, seed=seed)
    n = data.num_users + data.num_items
    pu, pi = partition_assignments(data.edge_index, data.num_users, n, parts)
    return data, n, np.concatenate([pu, pi])


def test_symmetric_vjp_matches_autodiff():
    from movie_recommender_system_with_gnns_tpu.ops.spmm import (
        build_hybrid_graph, spmm_hybrid, spmm_hybrid_sym,
    )

    data, n, node_part = _tiny_setup()
    h = build_hybrid_graph(data.edge_index, n, node_part, 4, align=8,
                           block_dtype=jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (n, 16))
    cot = jax.random.normal(jax.random.PRNGKey(2), (n, 16))

    _, vjp_sym = jax.vjp(lambda e: spmm_hybrid_sym(h, e), emb)
    _, vjp_ad = jax.vjp(lambda e: spmm_hybrid(h, e), emb)
    a = np.asarray(vjp_sym(cot)[0])
    b = np.asarray(vjp_ad(cot)[0])
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
    assert rel < 1e-5, rel


def test_chunked_ell_mulsum_combine_matches_einsum():
    """spmm_chunked_ell(combine='mulsum') is the same math as the einsum
    default (r5 A/B knob: measured wall-neutral on chip, kept as the
    documented alternative lowering)."""
    from movie_recommender_system_with_gnns_tpu.ops.spmm import (
        ChunkedEll, spmm_chunked_ell,
    )

    rng = np.random.default_rng(3)
    n, e = 64, 400
    src = rng.integers(0, n, e)
    dst = np.sort(rng.integers(0, n, e))
    w = rng.random(e).astype(np.float32)
    ell = ChunkedEll.build(src, dst, w, n, width=4, num_src=n)
    emb = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    a = np.asarray(spmm_chunked_ell(ell, emb))
    b = np.asarray(spmm_chunked_ell(ell, emb, combine="mulsum"))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_chunked_ell_matches_coo_remainder():
    """hybrid(off_format='ell') ≡ hybrid(off_format='coo') ≡ full segment-sum
    (chunk reduction only reorders f32 sums within a destination row)."""
    from movie_recommender_system_with_gnns_tpu.data.graph import COOGraph
    from movie_recommender_system_with_gnns_tpu.ops.spmm import (
        DeviceCOO, build_hybrid_graph, spmm_hybrid, spmm_segment,
    )

    data, n, node_part = _tiny_setup(seed=7)
    h_ell = build_hybrid_graph(data.edge_index, n, node_part, 4, align=8,
                               block_dtype=jnp.float32, off_format="ell",
                               ell_width=4)
    h_coo = build_hybrid_graph(data.edge_index, n, node_part, 4, align=8,
                               block_dtype=jnp.float32, off_format="coo")
    full = DeviceCOO.from_host(COOGraph.build(data.edge_index, n))
    emb = jax.random.normal(jax.random.PRNGKey(1), (n, 16))
    a = np.asarray(spmm_hybrid(h_ell, emb))
    b = np.asarray(spmm_hybrid(h_coo, emb))
    c = np.asarray(spmm_segment(full, emb))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-6)


def test_fullgraph_loss_and_grads_match_segment_oracle():
    from movie_recommender_system_with_gnns_tpu.data.graph import COOGraph
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
    from movie_recommender_system_with_gnns_tpu.ops.sampling import (
        sample_negative, triplets_from_edges,
    )
    from movie_recommender_system_with_gnns_tpu.ops.spmm import (
        DeviceCOO, build_hybrid_graph, spmm_hybrid_sym, spmm_segment,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import compute_loss

    data, n, node_part = _tiny_setup(seed=3)
    cfg = Config(model=ModelConfig(num_layers=2, dim=16))
    h = build_hybrid_graph(data.edge_index, n, node_part, 4, align=8,
                           block_dtype=jnp.float32)
    full = DeviceCOO.from_host(COOGraph.build(data.edge_index, n))
    params = init_params(jax.random.PRNGKey(0), data.num_users, data.num_items, 16)
    tb = triplets_from_edges(data.edge_index, data.num_users)
    neg = sample_negative(jax.random.PRNGKey(4), tb.user.shape[0], data.num_items)

    l_h, g_h = jax.value_and_grad(compute_loss)(params, h, tb, neg, cfg,
                                                spmm_hybrid_sym)
    l_s, g_s = jax.value_and_grad(compute_loss)(params, full, tb, neg, cfg,
                                                spmm_segment)
    assert abs(float(l_h) - float(l_s)) < 1e-5, (float(l_h), float(l_s))
    for a, b in zip(jax.tree_util.tree_leaves(g_h), jax.tree_util.tree_leaves(g_s)):
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
            np.abs(np.asarray(b)).max() + 1e-12)
        assert rel < 1e-4, rel


def test_bf16_compute_dtype_close_to_f32():
    """compute_dtype='bfloat16' rounds only the gathered propagation operands
    (accumulation stays f32 — ops/spmm.py), so fullgraph loss/grads stay
    within bf16 rounding of the f32 path."""
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
    from movie_recommender_system_with_gnns_tpu.ops.sampling import (
        sample_negative, triplets_from_edges,
    )
    from movie_recommender_system_with_gnns_tpu.training.fullgraph import (
        build_fullgraph_data, make_fullgraph_epoch_fn,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import (
        create_train_state,
    )

    data, n, _ = _tiny_setup(seed=9)
    losses = {}
    for cd in ("float32", "bfloat16"):
        cfg = Config(model=ModelConfig(num_layers=2, dim=16, compute_dtype=cd),
                     train=TrainConfig(trainer="fullgraph", fullgraph_steps=2,
                                       loss="standard"))
        fg = build_fullgraph_data(cfg, data.edge_index, data.num_users, n)
        state = create_train_state(cfg, data.num_users, data.num_items)
        epoch = make_fullgraph_epoch_fn(cfg, fg)
        state, loss = epoch(state, fg, jax.random.PRNGKey(0))
        losses[cd] = float(loss)
    assert abs(losses["bfloat16"] - losses["float32"]) < 5e-3, losses


def test_microbatched_loss_grads_match_full_batch():
    """compute_loss_grads_microbatched ≡ value_and_grad(compute_loss): the
    mask-count-weighted average of per-chunk masked means equals the global
    masked mean, and the accumulated table cotangents drive one propagation
    backward — both losses, K>1 negatives, padded (masked) rows."""
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
    from movie_recommender_system_with_gnns_tpu.ops.sampling import (
        sample_negative, triplets_from_edges,
    )
    from movie_recommender_system_with_gnns_tpu.ops.spmm import (
        build_hybrid_graph, spmm_hybrid_sym,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import (
        compute_loss, compute_loss_grads_microbatched,
    )

    data, n, node_part = _tiny_setup(seed=5)
    h = build_hybrid_graph(data.edge_index, n, node_part, 4, align=8,
                           block_dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(0), data.num_users,
                         data.num_items, 16)
    e_fwd = int((data.edge_index[0] < data.num_users).sum())
    pad_to = -(-e_fwd // 8) * 8          # padded rows => masked chunks differ
    tb = triplets_from_edges(data.edge_index, data.num_users, pad_to=pad_to)
    assert not bool(tb.mask.all()), "fixture must exercise masked padding"
    for loss_name, k_neg in (("reference", 1), ("reference", 4),
                             ("standard", 4)):
        cfg = Config(model=ModelConfig(num_layers=2, dim=16),
                     train=TrainConfig(loss=loss_name, num_negatives=k_neg))
        neg = sample_negative(jax.random.PRNGKey(4), pad_to, data.num_items,
                              k_neg)
        l_f, g_f = jax.value_and_grad(compute_loss)(
            params, h, tb, neg, cfg, spmm_hybrid_sym)
        l_m, g_m = compute_loss_grads_microbatched(
            params, h, tb, neg, cfg, spmm_hybrid_sym, num_micro=8)
        assert abs(float(l_f) - float(l_m)) < 1e-6, (loss_name, k_neg)
        for a, b in zip(jax.tree_util.tree_leaves(g_m),
                        jax.tree_util.tree_leaves(g_f)):
            rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
                np.abs(np.asarray(b)).max() + 1e-12)
            assert rel < 1e-5, (loss_name, k_neg, rel)


def test_fullgraph_trainer_end_to_end(tmp_path):
    from movie_recommender_system_with_gnns_tpu.training.fullgraph import (
        FullGraphTrainData,
    )
    from movie_recommender_system_with_gnns_tpu.training.pipeline import (
        prepare_training_data,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import (
        create_train_state, train_model,
    )

    cfg = Config(
        data=DataConfig(dataset="synthetic", synthetic_users=120,
                        synthetic_items=200, synthetic_interactions=4000,
                        indexes_dir=str(tmp_path / "fg_idx")),
        model=ModelConfig(num_layers=2, dim=16),
        train=TrainConfig(epochs=2, trainer="fullgraph", fullgraph_steps=3,
                          num_clusters=4, resume=False),
    )
    data, train_obj, val, test = prepare_training_data(cfg)
    assert isinstance(train_obj, FullGraphTrainData)
    # steps derive from the lane-aligned batch: ceil(e_real/batch), never more
    # than requested, and NO step may be entirely padding (ghost Adam updates)
    assert train_obj.batch % 1024 == 0
    assert train_obj.num_steps == -(-train_obj.e_real // train_obj.batch)
    assert train_obj.num_steps <= 3
    assert (train_obj.num_steps - 1) * train_obj.batch < train_obj.e_real
    assert train_obj.user.shape[0] == train_obj.num_steps * train_obj.batch

    state = create_train_state(cfg, data.num_users, data.num_items)
    p0 = np.asarray(state.params.user_emb).copy()
    state, hist = train_model(cfg, state, train_obj, val, test)
    assert len(hist["train_loss"]) == 2
    assert np.isfinite(hist["train_loss"]).all()
    assert np.abs(np.asarray(state.params.user_emb) - p0).max() > 0


def test_asymmetric_train_graph_disables_symmetric_vjp():
    """Edge-level splits keep single directions of some pairs: the build-time
    symmetry check must flag it, warn, and the epoch fn must fall back to the
    autodiff kernel (ADVICE r1: silently-wrong gradients otherwise)."""
    import warnings

    from movie_recommender_system_with_gnns_tpu.training.fullgraph import (
        build_fullgraph_data,
    )

    data, n, _ = _tiny_setup()
    cfg = Config(model=ModelConfig(num_layers=2, dim=16),
                 train=TrainConfig(trainer="fullgraph", fullgraph_steps=2,
                                   num_clusters=4))

    # symmetric (full undirected) adjacency: no warning, flag set
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        fg = build_fullgraph_data(cfg, data.edge_index, data.num_users, n)
    assert fg.symmetric_ok

    # drop 10% of directed edges -> asymmetric
    rng = np.random.default_rng(0)
    keep = rng.random(data.edge_index.shape[1]) > 0.1
    asym = data.edge_index[:, keep]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        fg2 = build_fullgraph_data(cfg, asym, data.num_users, n)
    assert not fg2.symmetric_ok
    assert any("asymmetric" in str(x.message) for x in w)


def test_feasible_negative_sampling_excludes_train_pairs():
    """negatives='feasible' (reference sketches it, helpers.py:11-62, but
    never wires it): drawn negatives must avoid the train pair set; shape
    contract matches sample_negative for K=1 and K>1."""
    from movie_recommender_system_with_gnns_tpu.ops.sampling import (
        build_member_table, sample_negative, sample_negative_feasible,
    )

    rng = np.random.default_rng(0)
    num_items = 50
    b = 4096
    user_np = rng.integers(0, 8, b).astype(np.int32)
    user = jnp.asarray(user_np)
    # each of the 8 users interacted with 20/50 items -> uniform collides 40%
    pos_u, pos_i = [], []
    for u in range(8):
        its = rng.choice(num_items, size=20, replace=False)
        pos_u += [u] * 20
        pos_i += list(its)
    mh = jnp.asarray(build_member_table(np.asarray(pos_u), np.asarray(pos_i)))
    pair_set = set(zip(pos_u, pos_i))

    def collisions(neg):
        n = np.asarray(neg)
        u = user_np if n.ndim == 1 else np.broadcast_to(user_np[:, None], n.shape)
        return sum(1 for a, c in zip(u.ravel(), n.ravel()) if (a, c) in pair_set)

    key = jax.random.PRNGKey(1)
    uni = collisions(sample_negative(key, b, num_items))
    assert uni > 0.3 * b                      # uniform collides ~40% here
    fea = collisions(sample_negative_feasible(key, user, num_items, mh,
                                              num_rounds=8))
    # residual rate (20/50)^9 ~ 2.6e-4 -> expect ~1 of 4096; allow slack
    assert fea < 0.01 * b, f"feasible sampler left {fea}/{b} collisions"
    k3 = sample_negative_feasible(key, user, num_items, mh, num_rounds=8, num=3)
    assert k3.shape == (b, 3)
    assert collisions(k3) < 0.01 * b * 3


def test_fullgraph_trainer_feasible_negatives_learns(tmp_path):
    """cfg.train.negatives='feasible' end-to-end through the fullgraph epoch."""
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
    from movie_recommender_system_with_gnns_tpu.training.fullgraph import (
        build_fullgraph_data, make_fullgraph_epoch_fn,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import (
        TrainState, make_optimizer,
    )

    data, n, _ = _tiny_setup()
    cfg = Config(model=ModelConfig(num_layers=2, dim=16),
                 train=TrainConfig(trainer="fullgraph", fullgraph_steps=4,
                                   negatives="feasible", num_negatives=2,
                                   lr=5e-2))
    fg = build_fullgraph_data(cfg, data.edge_index, data.num_users, n)
    assert fg.member_table is not None
    params = init_params(jax.random.PRNGKey(0), data.num_users, data.num_items, 16)
    opt = make_optimizer(cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    epoch = make_fullgraph_epoch_fn(cfg, fg)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, loss = epoch(state, fg, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses)) and losses[-1] < losses[0], losses


def test_feasible_negatives_warn_on_full_space_trainer(tmp_path):
    """Only the legacy full-node-space trainer still downgrades (compact and
    fullgraph both sample exactly now)."""
    import warnings

    from movie_recommender_system_with_gnns_tpu.config import DataConfig
    from movie_recommender_system_with_gnns_tpu.training.pipeline import (
        prepare_training_data,
    )

    cfg = Config(
        data=DataConfig(dataset="synthetic", synthetic_users=50,
                        synthetic_items=80, synthetic_interactions=1500,
                        indexes_dir=str(tmp_path / "idx")),
        model=ModelConfig(num_layers=2, dim=8),
        train=TrainConfig(trainer="full", num_clusters=2,
                          negatives="feasible"),
    )
    with warnings.catch_warnings(record=True) as wlog:
        warnings.simplefilter("always")
        prepare_training_data(cfg)
    assert any("negatives='feasible'" in str(w.message) for w in wlog)


def test_compact_feasible_negatives_all_optimizers(tmp_path):
    """negatives='feasible' on the compact trainer: the member table rides the
    cluster set, every epoch fn (adam / lazy / hybrid) trains, and drawn
    negatives avoid the user's train items exactly."""
    from movie_recommender_system_with_gnns_tpu.config import DataConfig
    from movie_recommender_system_with_gnns_tpu.ops.sampling import _member_probe
    from movie_recommender_system_with_gnns_tpu.training.compact import (
        _step_negatives, create_lazy_train_state, make_compact_epoch_fn,
    )
    from movie_recommender_system_with_gnns_tpu.training.pipeline import (
        prepare_training_data,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import (
        create_train_state,
    )
    from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params

    base = dict(trainer="compact", num_clusters=2, negatives="feasible", lr=1e-2)
    for opt in ("adam", "lazy_adam", "hybrid_adam"):
        cfg = Config(
            data=DataConfig(dataset="synthetic", synthetic_users=50,
                            synthetic_items=80, synthetic_interactions=1500,
                            indexes_dir=str(tmp_path / f"idx_{opt}")),
            model=ModelConfig(num_layers=2, dim=8),
            train=TrainConfig(optimizer=opt, **base),
        )
        data, cc, val, test = prepare_training_data(cfg)
        assert cc.member_table is not None
        if opt == "adam":
            state = create_train_state(cfg, data.num_users, data.num_items)
        else:
            state = create_lazy_train_state(
                cfg, init_params(jax.random.PRNGKey(0), data.num_users,
                                 data.num_items, 8))
        fn = make_compact_epoch_fn(cfg)
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, loss = fn(state, cc, sub)
            losses.append(float(loss))
        assert np.isfinite(losses).all() and losses[-1] < losses[0], (opt, losses)

    # drawn negatives are never train pairs (probe the sampler directly)
    neg = _step_negatives(cfg, jax.random.PRNGKey(2), cc.user_ids[0],
                          cc.user_local[0], data.num_items, cc.member_table)
    users = cc.user_ids[0][cc.user_local[0]]
    hits = _member_probe(cc.member_table, users, neg)
    valid = np.asarray(cc.mask[0])
    assert not bool(np.asarray(hits)[valid].any())


def test_member_probe_exact_at_ml25m_id_scale():
    """Regression: the device membership probe must be exact at ML-25M id
    magnitudes (u≈162K, i≈59K). A Cantor pairing hash needs 35+ bits there and
    JAX truncates int64→int32 on device, which silently turned 'feasible'
    sampling into uniform on the first real-scale run — the (2,L) int32 pair
    table + lexicographic binary search cannot overflow."""
    from movie_recommender_system_with_gnns_tpu.ops.sampling import (
        _member_probe, build_member_table,
    )

    rng = np.random.default_rng(0)
    u = rng.integers(0, 162_541, 5000).astype(np.int64)
    i = rng.integers(0, 59_047, 5000).astype(np.int64)
    tab = jnp.asarray(build_member_table(u, i))
    hit = _member_probe(tab, jnp.asarray(u.astype(np.int32)),
                        jnp.asarray(i.astype(np.int32)))
    assert bool(jnp.all(hit)), "known pairs must probe True"
    # perturb items by +1 (mod I): overwhelmingly non-members
    i2 = (i + 1) % 59_047
    pairs = set(zip(u.tolist(), i.tolist()))
    expect = np.array([(a, b) in pairs for a, b in zip(u.tolist(), i2.tolist())])
    hit2 = np.asarray(_member_probe(tab, jnp.asarray(u.astype(np.int32)),
                                    jnp.asarray(i2.astype(np.int32))))
    np.testing.assert_array_equal(hit2, expect)


def test_popularity_negatives_law_and_trains(tiny_data):
    """negatives='popularity' draws ∝ count^0.75 (alias table) and the
    fullgraph trainer runs with it."""
    import jax
    import jax.numpy as jnp

    from movie_recommender_system_with_gnns_tpu.ops.sampling import (
        build_alias_table, item_popularity, sample_negative_alias,
    )
    from movie_recommender_system_with_gnns_tpu.training.fullgraph import (
        build_fullgraph_data, make_fullgraph_epoch_fn,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import (
        create_train_state,
    )

    nu, ni = tiny_data.num_users, tiny_data.num_items
    counts = item_popularity(tiny_data.edge_index, nu, ni)
    prob, alias = build_alias_table(counts, 0.75)
    draws = sample_negative_alias(jax.random.PRNGKey(0), 100_000, ni,
                                  jnp.asarray(prob), jnp.asarray(alias))
    emp = np.bincount(np.asarray(draws), minlength=ni) / 100_000
    w = counts.astype(np.float64) ** 0.75
    exp = w / w.sum()
    assert np.abs(emp - exp).max() < 0.01

    cfg = Config(model=ModelConfig(num_layers=2, dim=8),
                 train=TrainConfig(trainer="fullgraph", lr=1e-2,
                                   negatives="popularity", fullgraph_steps=2,
                                   loss="standard"))
    fg = build_fullgraph_data(cfg, tiny_data.edge_index, nu, nu + ni)
    assert fg.alias_table is not None
    state = create_train_state(cfg, nu, ni)
    fn = make_fullgraph_epoch_fn(cfg, fg)
    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, loss = fn(state, fg, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
