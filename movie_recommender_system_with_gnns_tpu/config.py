"""Central configuration for the TPU-native LightGCN recommender framework.

The reference repo has no config system at all — every hyperparameter lives as a
function default or a hard-coded ``__main__`` override (reference
utils/train_test.py:274,:287, data/dataset_handler.py:144,:256, models/light_gcn.py:14).
This module replaces that with one frozen dataclass tree so every experiment is
reproducible from a single object.

Reference defaults captured here:
  * ``num_layers=4, dim_h=64``            — models/light_gcn.py:14
  * training override ``num_layers=3``    — utils/train_test.py:274
  * ``train_size=0.9`` (then 50/50 val/test) — data/dataset_handler.py:144,:167-168
  * ``num_train_clusters=100``            — data/dataset_handler.py:256
  * ``bpr_coeff=5e-3``                    — utils/train_test.py:21
  * ``lr=1e-3``, Adam                     — utils/train_test.py:216,:236
  * grad-clip global-norm 1.0             — utils/train_test.py:95
  * eval ``top_k=100``; recall sampling 10 draws x 100 users — utils/train_test.py:136,:165
  * rating filter ``>= 4.0``              — data/dataset_handler.py:106
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Dataset ingest + split configuration (reference data/dataset_handler.py)."""

    dataset: str = "ml-25m"           # ml-100k | ml-1m | ml-25m | synthetic
    data_dir: str = "data/movielens-25m"
    indexes_dir: str = "data/indexes"
    min_rating: float = 4.0           # dataset_handler.py:106
    train_size: float = 0.9           # dataset_handler.py:144
    val_test_ratio: float = 0.5       # dataset_handler.py:168
    split_seed: int = 0
    # "edge" reproduces the reference exactly: the 90/5/5 split permutes the
    # direction-DOUBLED edge list (dataset_handler.py:167-168), so ~train_size
    # of held-out (u,i) pairs keep their mirrored (i,u) copy inside the train
    # graph — fine for parity, but it leaks held-out interactions into
    # propagation and makes the train graph asymmetric (weakening the
    # symmetric-Â VJP assumption). "interaction" splits unique (u,i) PAIRS and
    # doubles each split afterward: leakage-free standard metrics, exactly
    # symmetric train graph. Use it for quality (non-parity) runs.
    split_level: str = "edge"
    # synthetic-dataset knobs (used when no network egress / tests)
    synthetic_users: int = 1000
    synthetic_items: int = 1700
    synthetic_interactions: int = 100_000
    synthetic_communities: int = 0     # >0 plants taste communities
    synthetic_power: float = 1.1


@dataclass(frozen=True)
class ModelConfig:
    """LightGCN model hyperparameters (reference models/light_gcn.py:13-26)."""

    num_layers: int = 3               # training value, train_test.py:274
    dim: int = 64                     # dim_h, light_gcn.py:14
    init_std: float = 0.01            # light_gcn.py:25-26
    # "reference" readout keeps the double 1/(K+1) factor of light_gcn.py:36;
    # "standard" is the LightGCN-paper mean over layers.
    readout: str = "reference"
    param_dtype: str = "float32"
    compute_dtype: str = "float32"    # bfloat16 supported for propagation


@dataclass(frozen=True)
class TrainConfig:
    """Optimization loop configuration (reference utils/train_test.py)."""

    epochs: int = 3                   # train_test.py:287
    lr: float = 1e-3                  # train_test.py:216
    # learning-rate schedule: "constant" (the reference's fixed Adam lr) or
    # "cosine" — linear warmup over lr_warmup_steps then cosine decay from lr
    # to lr*lr_final_frac across lr_total_steps optimizer updates. Drivers set
    # lr_total_steps once the per-epoch step count is known (e.g.
    # steps_per_epoch * epochs); leaving it 0 with "cosine" is an error.
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 0
    lr_total_steps: int = 0
    lr_final_frac: float = 0.0
    bpr_coeff: float = 5e-3           # train_test.py:21
    # "reference" keeps the quirky cosine-softplus loss with its negative sign
    # (train_test.py:18-51); "standard" is textbook BPR (-log sigmoid margin)
    loss: str = "reference"
    grad_clip_norm: float = 1.0       # train_test.py:95
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    seed: int = 0
    num_clusters: int = 100           # dataset_handler.py:256
    use_clusters: bool = True
    # "greedy" = degree-balanced + label-propagation node partition (METIS
    # analog, keeps ~46% intra-cluster edges at 100 parts on ml-25m-like data);
    # "random_edges" = uniform edge partition (keeps 100% of edges across the
    # epoch at the cost of subgraph locality)
    partitioner: str = "greedy"
    # >0 adds a kept-edge balance pass to the greedy partitioner capping every
    # cluster's intra-edge count at tol× the mean (native gc_partition_balance;
    # the LARGEST cluster sets the padded triplet width of every train step,
    # so e.g. 1.1 trades a few % edge retention for ~25% faster epochs)
    partition_balance_tol: float = 0.0
    # "compact" propagates each cluster in its local node space (fast,
    # provably equivalent — training/compact.py); "full" keeps the reference's
    # full-node-space propagation (training/train.py); "fullgraph" drops the
    # Cluster-GCN edge-coverage compromise entirely — every step propagates
    # over ALL train edges via the hybrid block-diagonal kernel
    # (training/fullgraph.py)
    trainer: str = "compact"
    # fullgraph-trainer knobs: optimizer updates per epoch (each one full
    # propagation + one shuffled triplet minibatch), the node-partition count
    # behind the hybrid dense blocks (0 = reuse num_clusters), and the
    # symmetric-Â custom VJP (backward reuses the forward kernel; exact for
    # the undirected GCN-normalized adjacency)
    fullgraph_steps: int = 16
    hybrid_parts: int = 0
    symmetric_vjp: bool = True
    # >1 splits each fullgraph step's triplet loss into this many scanned
    # microbatches with ONE propagation forward/backward per step (exact same
    # loss/grads up to fp reassociation — training/train.py::
    # compute_loss_grads_microbatched). The (B, K, d) loss temps shrink by the
    # factor, which is what lets d>=512 x K=8 full-batch steps fit one chip's
    # HBM (d=512 unchunked needs ~21 GB of triplet temps vs 15.75 GB HBM).
    # Must divide the lane-aligned batch (any power of two <= 1024 works).
    loss_microbatches: int = 0
    # dense-block operand precision for the hybrid kernel: bf16 is the MXU's
    # native operand type (f32 accumulation); "float32" for exactness studies
    hybrid_block_dtype: str = "bfloat16"
    # off-diagonal remainder layout for the hybrid propagation: "ell" =
    # chunked-ELL (scatter rows cut ~16x — TPU scatter costs ~4x a gather per
    # row; ops/spmm.py::ChunkedEll), "coo" = dst-sorted segment-sum (r2 path,
    # golden oracle)
    hybrid_off_format: str = "ell"
    hybrid_ell_width: int = 16
    # negatives per positive (reference draws exactly 1, helpers.py:79-80).
    # K>1 averages the pairwise term over K — richer gradient per update,
    # which pays most where updates are expensive (the fullgraph trainer).
    # Honored by every trainer (compact/full/fullgraph, fused or XLA path).
    num_negatives: int = 1
    # negative sampling law: "uniform" = the reference's no-collision-check
    # simplification (helpers.py:68,79-80); "feasible" = exact rejection
    # resampling against the train pair set (the variant the reference
    # sketches but never wires in, helpers.py:11-62); "popularity" =
    # count^0.75 (word2vec law) via an O(1)-per-draw Walker alias table
    # (ops/sampling.py::sample_negative_alias) — fullgraph trainer
    negatives: str = "uniform"
    # exponent of the popularity law (negatives="popularity"): 0 = uniform,
    # 0.75 = word2vec default, 1.0 = raw counts. Measured at ML-25M d=256
    # (README quality detail): 0.75 beats uniform on both metrics
    negatives_power: float = 0.75
    # "adam" = dense per-step Adam over both full tables (torch reference
    # semantics, train_test.py:236); "lazy_adam" = rows-touched-only moments
    # (torch SparseAdam analog; see training/compact.py for exact semantics);
    # "hybrid_adam" = exact dense Adam on the ITEM table + lazy user rows —
    # the compact trainer's fast path (a cluster touches ~1% of user rows but
    # its uniform negatives hit the whole item catalog; profiled rationale in
    # training/compact.py::make_compact_hybrid_epoch_fn);
    # "lazy_item_adam" = hybrid_adam with ROW-SPARSE item moments too
    # (touched-rows-only Adam via run-length-compressed keys — drops the
    # per-step dense (num_items, d) grad write + 3-table sweep at the price
    # of SparseAdam staleness on untouched item rows)
    optimizer: str = "adam"
    # full-graph regime knobs (milestone-3 scale: 4-layer d=128 on ML-25M):
    # triplet minibatch per step (None = all train triplets in one step — only
    # viable for small graphs), and edge-chunked propagation to bound the
    # (E, d) gather memory (1 = unchunked)
    batch_size: Optional[int] = None
    spmm_chunks: int = 1
    # fuse the BPR loss + gradients into one Pallas kernel (ops/pallas_bpr.py):
    # one-hot MXU gathers over VMEM-resident cluster tables replace ~10
    # row-granular XLA gather/scatter ops per step. Gathered values round to
    # bfloat16 (MXU operand precision); reference loss only.
    fused_bpr: bool = False
    # densify each compact cluster's adjacency into an MXU-matmul block when
    # the local node count allows (training/compact.py::densify_adjacency)
    dense_adjacency: bool = True
    dense_adjacency_max_nodes: int = 4096
    # eval / metric knobs
    eval_top_k: int = 100             # train_test.py:136
    recall_num_samples: int = 10      # train_test.py:165
    recall_sample_size: int = 100     # train_test.py:165
    checkpoint_path: str = "best_model.npz"
    histories_dir: str = "data/histories"
    resume: bool = True               # train_test.py:279-280
    # periodic FULL train-state checkpoints (params + Adam moments + step) for
    # bit-exact crash recovery — beyond the reference's best-params-only policy
    state_checkpoint_path: Optional[str] = None
    state_checkpoint_every: int = 0   # epochs; 0 = off


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / sharding configuration (no analog in the reference, which is
    single-device: dataset_handler.py:85)."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = 1
    model_parallel: int = 1

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.data_parallel, self.model_parallel)


@dataclass(frozen=True)
class ServeConfig:
    """Retrieval serving configuration (reference utils/recommend.py)."""

    top_k: int = 10                   # recommend.py:59-60 stops at 10
    block_items: int = 8192           # item-catalog blocking for the MIPS kernel
    checkpoint_path: str = "best_model.npz"


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    serve: ServeConfig = field(default_factory=ServeConfig)

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(text: str) -> "Config":
        raw = json.loads(text)
        return Config(
            data=DataConfig(**raw.get("data", {})),
            model=ModelConfig(**raw.get("model", {})),
            train=TrainConfig(**raw.get("train", {})),
            mesh=MeshConfig(**raw.get("mesh", {})),
            serve=ServeConfig(**raw.get("serve", {})),
        )


def ml100k_config() -> Config:
    """Milestone config 1 from BASELINE.json: 3-layer d=64 on an ML-100K-scale graph."""
    return Config(
        data=DataConfig(dataset="ml-100k", data_dir="data/movielens-100k",
                        synthetic_users=943, synthetic_items=1682,
                        synthetic_interactions=100_000),
        train=TrainConfig(num_clusters=4),
    )


def ml25m_config() -> Config:
    """Milestone config 3 from BASELINE.json: 4-layer d=128 on ML-25M."""
    return Config(
        data=DataConfig(dataset="ml-25m"),
        model=ModelConfig(num_layers=4, dim=128),
        train=TrainConfig(num_clusters=100),
    )
