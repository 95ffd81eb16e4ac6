"""movie_recommender_system_with_gnns_tpu — a TPU-native LightGCN recommender
framework (JAX / XLA / Pallas / shard_map).

Brand-new implementation with the capabilities of the reference
``YuriPaglierani/Movie-Recommender-System-with-GNNs`` (PyTorch + PyG, single-GPU),
re-designed TPU-first: static-shape graph structures, scatter-free propagation,
jitted training, mesh-sharded tables, and a sharded MIPS retrieval path.
"""

from .config import Config, DataConfig, MeshConfig, ModelConfig, ServeConfig, TrainConfig
from .models.lightgcn import LightGCNParams, get_embeddings, init_params, propagate

__version__ = "0.1.0"

__all__ = [
    "Config", "DataConfig", "ModelConfig", "TrainConfig", "MeshConfig", "ServeConfig",
    "LightGCNParams", "init_params", "propagate", "get_embeddings",
]
