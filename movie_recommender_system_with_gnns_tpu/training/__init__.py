from .checkpoint import (
    load_params, load_params_if_exists, load_train_state, save_params,
    save_train_state,
)
from .compact import CompactClusters, build_compact_clusters, make_compact_epoch_fn
from .evaluate import evaluate_full_ranking
from .pipeline import TrainingBundle, prepare_training_data
from .train import (
    ClusterBatch, StackedClusters, TrainState, create_train_state,
    make_epoch_fn, make_eval_step, make_train_step, save_histories,
    train_epoch, train_model,
)

__all__ = [
    "TrainState", "ClusterBatch", "StackedClusters", "CompactClusters",
    "TrainingBundle", "prepare_training_data", "build_compact_clusters",
    "create_train_state", "make_train_step", "make_epoch_fn",
    "make_compact_epoch_fn", "make_eval_step", "train_epoch", "train_model",
    "save_histories", "evaluate_full_ranking", "save_params", "load_params",
    "load_params_if_exists", "save_train_state", "load_train_state",
]
