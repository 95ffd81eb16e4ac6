"""Elastic recovery driver (SURVEY §5 failure detection/recovery — beyond the
reference, which keeps no training state at all): a transient mid-run failure
must resume from the periodic full-state checkpoint and reproduce the
uninterrupted run BIT-EXACTLY (params, moments, histories)."""

import dataclasses

import jax
import numpy as np
import pytest

from movie_recommender_system_with_gnns_tpu.config import (
    Config, DataConfig, ModelConfig, TrainConfig,
)
from movie_recommender_system_with_gnns_tpu.training.pipeline import (
    prepare_training_data,
)
from movie_recommender_system_with_gnns_tpu.training.recovery import (
    is_transient_error, train_with_recovery,
)
from movie_recommender_system_with_gnns_tpu.training.train import (
    create_train_state, train_model,
)


def _cfg(tmp_path, epochs=6, ckpt=True):
    return Config(
        data=DataConfig(dataset="synthetic", synthetic_users=120,
                        synthetic_items=80, synthetic_interactions=2000,
                        indexes_dir=str(tmp_path / "idx")),
        model=ModelConfig(num_layers=2, dim=8),
        train=TrainConfig(
            epochs=epochs, num_clusters=2, eval_top_k=10,
            state_checkpoint_path=(str(tmp_path / "state.npz") if ckpt else ""),
            state_checkpoint_every=(1 if ckpt else 0)),
    )


@pytest.fixture(scope="module")
def tiny_bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("recovery")
    cfg = _cfg(tmp)
    data, clusters, val, test = prepare_training_data(cfg)
    return tmp, cfg, data, clusters, val, test


def test_transient_classifier():
    assert is_transient_error(RuntimeError("UNAVAILABLE: Socket closed"))
    assert is_transient_error(RuntimeError("DEADLINE_EXCEEDED: rpc timeout"))
    assert not is_transient_error(ValueError("shape mismatch (3,) vs (4,)"))
    assert not is_transient_error(RuntimeError("RESOURCE_EXHAUSTED: OOM"))


def test_recovery_is_bitexact_vs_uninterrupted(tiny_bundle):
    tmp, cfg, data, clusters, val, test = tiny_bundle

    # uninterrupted reference run
    st0 = create_train_state(cfg, data.num_users, data.num_items)
    ref_state, ref_hist = train_model(cfg, st0, clusters, val, test)

    # interrupted run: a fake transient tunnel drop after epoch 2's checkpoint
    boom = {"armed": True}

    def fail_once(epoch, metrics):
        if epoch == 2 and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("UNAVAILABLE: Socket closed (fake tunnel drop)")

    st1 = create_train_state(cfg, data.num_users, data.num_items)
    rec_state, rec_hist = train_with_recovery(
        cfg, st1, clusters, val, test, retry_backoff_s=0.0,
        on_epoch_end=fail_once)

    for a, b in zip(jax.tree_util.tree_leaves(ref_state),
                    jax.tree_util.tree_leaves(rec_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in ("train_loss", "val_loss", "val_recall"):
        np.testing.assert_array_equal(np.asarray(ref_hist[k]),
                                      np.asarray(rec_hist[k]))
    assert rec_hist["test_recall"] == ref_hist["test_recall"]
    assert len(rec_hist["train_loss"]) == cfg.train.epochs


def test_recovery_failure_before_first_checkpoint(tiny_bundle):
    """A drop in epoch 0 (no checkpoint yet) restarts from scratch."""
    tmp, cfg, data, clusters, val, test = tiny_bundle
    cfg2 = cfg.replace(train=dataclasses.replace(
        cfg.train, state_checkpoint_path=str(tmp / "state2.npz")))
    boom = {"armed": True}

    def fail_at_zero(epoch, metrics):
        if epoch == 0 and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("ABORTED: preempted")

    st = create_train_state(cfg2, data.num_users, data.num_items)
    # epoch-0 checkpoint IS written before on_epoch_end fires, so resume
    # starts at epoch 1; the point is: no crash, full-length histories
    rec_state, rec_hist = train_with_recovery(
        cfg2, st, clusters, val, test, retry_backoff_s=0.0,
        on_epoch_end=fail_at_zero)
    assert len(rec_hist["train_loss"]) == cfg2.train.epochs


def test_recovery_bitexact_on_compact_hybrid_adam(tmp_path):
    """The fused compact trainer swaps optax state for LazyAdamState inside
    train_model; recovery must reload into THAT structure and still match the
    uninterrupted run bit for bit."""
    cfg = _cfg(tmp_path, epochs=5)
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, trainer="compact", optimizer="hybrid_adam"))
    data, clusters, val, test = prepare_training_data(cfg)

    st0 = create_train_state(cfg, data.num_users, data.num_items)
    ref_state, ref_hist = train_model(cfg, st0, clusters, val, test)

    boom = {"armed": True}

    def fail_once(epoch, metrics):
        if epoch == 1 and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("UNAVAILABLE: Socket closed (fake tunnel drop)")

    st1 = create_train_state(cfg, data.num_users, data.num_items)
    rec_state, rec_hist = train_with_recovery(
        cfg, st1, clusters, val, test, retry_backoff_s=0.0,
        on_epoch_end=fail_once)

    for a, b in zip(jax.tree_util.tree_leaves(ref_state),
                    jax.tree_util.tree_leaves(rec_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ref_hist["train_loss"]),
                                  np.asarray(rec_hist["train_loss"]))


def test_recovery_propagates_permanent_errors(tiny_bundle):
    tmp, cfg, data, clusters, val, test = tiny_bundle

    def always_bad(epoch, metrics):
        raise ValueError("deterministic bug — must NOT be retried")

    st = create_train_state(cfg, data.num_users, data.num_items)
    with pytest.raises(ValueError, match="deterministic bug"):
        train_with_recovery(cfg, st, clusters, val, test,
                            retry_backoff_s=0.0, on_epoch_end=always_bad)


def test_recovery_exhausts_retries(tiny_bundle):
    tmp, cfg, data, clusters, val, test = tiny_bundle

    def always_drop(epoch, metrics):
        raise RuntimeError("UNAVAILABLE: Socket closed")

    st = create_train_state(cfg, data.num_users, data.num_items)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        train_with_recovery(cfg, st, clusters, val, test, max_retries=2,
                            retry_backoff_s=0.0, on_epoch_end=always_drop)
