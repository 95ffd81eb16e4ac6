"""End-to-end convergence test (SURVEY §4 item d): on a community-structured
synthetic ML-100K-scale dataset, a short training run must beat random ranking
by a wide margin on full-ranking Recall@10."""

import numpy as np
import jax
import pytest

from movie_recommender_system_with_gnns_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from movie_recommender_system_with_gnns_tpu.training.evaluate import evaluate_full_ranking
from movie_recommender_system_with_gnns_tpu.training.pipeline import prepare_training_data
from movie_recommender_system_with_gnns_tpu.training.train import create_train_state, train_model


@pytest.mark.slow
def test_e2e_convergence_beats_random(tmp_path):
    cfg = Config(
        data=DataConfig(dataset="synthetic", synthetic_users=600,
                        synthetic_items=900, synthetic_interactions=60_000,
                        synthetic_communities=12, synthetic_power=0.8,
                        indexes_dir=str(tmp_path / "idx")),
        model=ModelConfig(num_layers=2, dim=32),
        train=TrainConfig(epochs=12, num_clusters=4, lr=5e-3,
                          recall_sample_size=64, recall_num_samples=2),
    )
    bundle = prepare_training_data(cfg)
    data, clusters, val, test = bundle
    state = create_train_state(cfg, data.num_users, data.num_items)
    state, hist = train_model(cfg, state, clusters, val, test)

    # loss must fall substantially (negative-going reference loss)
    assert hist["train_loss"][-1] < hist["train_loss"][0] - 0.2

    train_e, val_e, test_e = bundle.splits
    recall, ndcg = evaluate_full_ranking(state.params, train_e, test_e,
                                         data.num_users, k=10)
    # random ranking recall@10 ≈ k / num_items ≈ 0.011; trained model must be
    # several times better on the community-structured data
    random_level = 10.0 / data.num_items
    assert recall > 4 * random_level, (recall, random_level)
    assert ndcg > 0.0
