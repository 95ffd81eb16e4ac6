from .handler import MovieLensDataHandler
from .graph import COOGraph, EllGraph, build_csr, compute_degrees, gcn_norm
from .movielens import (
    MovieLensData, download_and_extract_dataset, load_movielens,
    make_synthetic_movielens, split_edges, to_undirected,
)
from .partition import (
    edge_retention, partition_bipartite_greedy, partition_edges_random,
)

__all__ = [
    "MovieLensDataHandler",
    "MovieLensData", "load_movielens", "make_synthetic_movielens",
    "split_edges", "to_undirected", "download_and_extract_dataset",
    "COOGraph", "EllGraph", "build_csr", "gcn_norm", "compute_degrees",
    "partition_bipartite_greedy", "partition_edges_random", "edge_retention",
]
