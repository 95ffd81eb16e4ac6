"""Multi-negative BPR (num_negatives > 1) — a quality extension beyond the
reference's single uniform negative (helpers.py:79-80).

Invariants: (a) K identical negatives reproduce the single-negative loss
exactly (the pairwise term averages over K); (b) the train step runs and
differentiates with (B, K) negatives end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from movie_recommender_system_with_gnns_tpu.config import (
    Config, DataConfig, ModelConfig, TrainConfig,
)


def _rand_embs(key, b, d):
    ks = jax.random.split(key, 6)
    return [jax.random.normal(k, (b, d)) for k in ks]


def test_k_identical_negatives_match_single():
    from movie_recommender_system_with_gnns_tpu.ops.bpr import (
        bpr_loss, bpr_loss_standard,
    )

    b, d, k = 32, 8, 5
    uf, u0, pf, p0, nf, n0 = _rand_embs(jax.random.PRNGKey(0), b, d)
    mask = jnp.arange(b) < 27
    nf_k = jnp.repeat(nf[:, None, :], k, axis=1)
    n0_k = jnp.repeat(n0[:, None, :], k, axis=1)
    for fn in (bpr_loss, bpr_loss_standard):
        a = float(fn(uf, u0, pf, p0, nf, n0, mask=mask))
        bb = float(fn(uf, u0, pf, p0, nf_k, n0_k, mask=mask))
        assert abs(a - bb) < 1e-6, (fn.__name__, a, bb)


def test_multineg_train_step_runs(tmp_path):
    from movie_recommender_system_with_gnns_tpu.training.pipeline import (
        prepare_training_data,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import (
        create_train_state, train_model,
    )

    cfg = Config(
        data=DataConfig(dataset="synthetic", synthetic_users=100,
                        synthetic_items=150, synthetic_interactions=3000,
                        indexes_dir=str(tmp_path / "mn_idx")),
        model=ModelConfig(num_layers=2, dim=16),
        train=TrainConfig(epochs=1, trainer="fullgraph", fullgraph_steps=2,
                          num_clusters=4, num_negatives=4, loss="standard",
                          resume=False),
    )
    data, fg, val, test = prepare_training_data(cfg)
    state = create_train_state(cfg, data.num_users, data.num_items)
    p0 = np.asarray(state.params.item_emb).copy()
    state, hist = train_model(cfg, state, fg, val, test)
    assert np.isfinite(hist["train_loss"]).all()
    assert np.abs(np.asarray(state.params.item_emb) - p0).max() > 0
