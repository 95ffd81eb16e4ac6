from .bpr import bpr_loss, bpr_loss_standard, normalize_embedding
from .metrics import recall_ndcg_at_k, sampled_recall_at_k
from .sampling import (
    TripletBatch, cantor_hash_pair, get_user_items, is_in_feasible,
    sample_negative, sample_negative_feasible, triplets_from_edges,
)
from .spmm import (DeviceCOO, DeviceELL, HybridGraph, build_hybrid_graph,
                   make_spmm_chunked, spmm_ell, spmm_hybrid, spmm_hybrid_sym,
                   spmm_segment, spmm_segment_sym, spmm_symmetric)
from .pallas_mips import mips_topk_pallas
from .topk import full_sort_scores, merge_topk, mips_topk

__all__ = [
    "bpr_loss", "bpr_loss_standard", "normalize_embedding",
    "sampled_recall_at_k", "recall_ndcg_at_k",
    "TripletBatch", "triplets_from_edges", "sample_negative",
    "sample_negative_feasible", "cantor_hash_pair", "get_user_items",
    "is_in_feasible",
    "DeviceCOO", "DeviceELL", "HybridGraph", "build_hybrid_graph",
    "spmm_segment", "spmm_ell", "spmm_hybrid", "make_spmm_chunked",
    "spmm_symmetric", "spmm_hybrid_sym", "spmm_segment_sym",
    "mips_topk", "mips_topk_pallas", "merge_topk", "full_sort_scores",
]
