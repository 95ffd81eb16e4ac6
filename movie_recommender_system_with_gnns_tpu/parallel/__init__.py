from .mesh import (
    DATA_AXIS, MODEL_AXIS, batch_sharding, distributed_init, make_mesh,
    replicated, table_sharding,
)
from .sharding import (
    ShardPlan, ShardedGraph, ShardedHybrid, make_sharded_epoch_fn,
    make_sharded_mips, make_sharded_propagate, make_sharded_train_step,
    pad_batch, pad_params, shard_graph, shard_hybrid_graph, unpad_params,
)

__all__ = [
    "make_mesh", "distributed_init", "DATA_AXIS", "MODEL_AXIS",
    "table_sharding", "batch_sharding", "replicated",
    "ShardPlan", "ShardedGraph", "ShardedHybrid", "shard_graph",
    "shard_hybrid_graph", "pad_params", "unpad_params",
    "pad_batch", "make_sharded_train_step", "make_sharded_epoch_fn",
    "make_sharded_mips", "make_sharded_propagate",
]
