"""ctypes bindings for the native graphcore runtime (native/graphcore.cpp).

Provides C++-speed host-side graph preprocessing — CSR build, Cluster-GCN-style
greedy partitioning, undirected doubling, membership hashing — with transparent
NumPy fallbacks when the shared library hasn't been built. This is the
TPU-framework analog of the reference's external native graph machinery
(PyG ClusterData → METIS C, torch-sparse CSR; SURVEY §2.3).

Build: ``make -C native`` (g++ only; no pybind11 needed — plain C ABI).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOAD_FAILED = False  # memo a failed build/load so we don't re-spawn make per call
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libgraphcore.so",
)


def _try_build() -> None:
    """Best-effort one-shot `make -C native` so a fresh checkout self-builds."""
    import subprocess

    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                       capture_output=True, timeout=120, check=False)
    except (OSError, subprocess.TimeoutExpired):
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_FAILED
    if _LIB is not None:
        return _LIB
    if _LOAD_FAILED:
        return None
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        _LOAD_FAILED = True
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.gc_build_csr.restype = ctypes.c_int64
    lib.gc_build_csr.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int64,
                                 i64p, i32p, f32p]
    lib.gc_partition_greedy.restype = ctypes.c_int64
    lib.gc_partition_greedy.argtypes = [i32p, i32p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int32, ctypes.c_uint64,
                                        i32p, i32p]
    lib.gc_partition_refine.restype = ctypes.c_int64
    lib.gc_partition_refine.argtypes = [i32p, i32p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int32, ctypes.c_int32,
                                        ctypes.c_double, i32p, i32p]
    lib.gc_partition_balance.restype = ctypes.c_int64
    lib.gc_partition_balance.argtypes = [i32p, i32p, ctypes.c_int64,
                                         ctypes.c_int64, ctypes.c_int32,
                                         ctypes.c_double, i32p, i32p]
    lib.gc_to_undirected.restype = ctypes.c_int64
    lib.gc_to_undirected.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int64,
                                     i32p, i32p]
    lib.gc_member_hashes.restype = ctypes.c_int64
    lib.gc_member_hashes.argtypes = [i32p, i32p, ctypes.c_int64, u64p]
    lib.gc_count_csv_lines.restype = ctypes.c_int64
    lib.gc_count_csv_lines.argtypes = [ctypes.c_char_p]
    lib.gc_load_ratings_csv.restype = ctypes.c_int64
    lib.gc_load_ratings_csv.argtypes = [ctypes.c_char_p, ctypes.c_float,
                                        i32p, i32p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_csr(src: np.ndarray, dst: np.ndarray, num_nodes: int
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dst-sorted GCN-normalized CSR; native when built, NumPy otherwise."""
    lib = _load()
    e = src.shape[0]
    if lib is None:
        from .graph import build_csr as np_csr

        return np_csr(np.stack([src, dst]), num_nodes)
    rowptr = np.zeros(num_nodes + 1, np.int64)
    col = np.zeros(e, np.int32)
    w = np.zeros(e, np.float32)
    lib.gc_build_csr(np.ascontiguousarray(src, np.int32),
                     np.ascontiguousarray(dst, np.int32), e, num_nodes,
                     rowptr, col, w)
    return rowptr, col, w


def partition_greedy(u: np.ndarray, it: np.ndarray, num_users: int,
                     num_items: int, num_parts: int, seed: int = 0,
                     refine_rounds: int = 4, slack: float = 1.15,
                     balance_tol: float = 0.0
                     ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Node partition assignment (users, items) + kept-half-edge count.

    Greedy degree-balanced init + ``refine_rounds`` of capacity-constrained
    label propagation (the METIS-quality step; gc_partition_refine). With
    ``balance_tol`` > 0 a final kept-edge balance pass caps every part's
    intra-cluster edge count at tol× the mean (gc_partition_balance) — that
    count sets the padded triplet width of every train step."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native graphcore not built — run `make -C native`")
    u32 = np.ascontiguousarray(u, np.int32)
    it32 = np.ascontiguousarray(it, np.int32)
    pu = np.zeros(num_users, np.int32)
    pi = np.zeros(num_items, np.int32)
    kept = lib.gc_partition_greedy(u32, it32, u.shape[0], num_users, num_items,
                                   num_parts, seed, pu, pi)
    if refine_rounds > 0:
        kept = lib.gc_partition_refine(u32, it32, u.shape[0], num_users,
                                       num_items, num_parts, refine_rounds,
                                       slack, pu, pi)
    if balance_tol > 0:
        kept = lib.gc_partition_balance(u32, it32, u.shape[0], num_users,
                                        num_parts, balance_tol, pu, pi)
    return pu, pi, int(kept)


def to_undirected(src: np.ndarray, dst: np.ndarray, num_nodes: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        from .movielens import to_undirected as np_undirected

        return np_undirected(np.stack([src, dst]), num_nodes)
    out_s = np.zeros(2 * src.shape[0], np.int32)
    out_d = np.zeros(2 * src.shape[0], np.int32)
    m = lib.gc_to_undirected(np.ascontiguousarray(src, np.int32),
                             np.ascontiguousarray(dst, np.int32),
                             src.shape[0], num_nodes, out_s, out_d)
    return np.stack([out_s[:m], out_d[:m]])


def member_hashes(u: np.ndarray, it: np.ndarray) -> np.ndarray:
    """Sorted unique Cantor hashes of (user, item) pairs (exact negative-
    sampling feasibility probes)."""
    lib = _load()
    if lib is None:
        s = u.astype(np.uint64) + it.astype(np.uint64)
        h = np.unique(s * (s + 1) // 2 + it.astype(np.uint64))
        return h
    out = np.zeros(u.shape[0], np.uint64)
    m = lib.gc_member_hashes(np.ascontiguousarray(u, np.int32),
                             np.ascontiguousarray(it, np.int32), u.shape[0], out)
    return out[:m]


def load_ratings_csv(path: str, min_rating: float) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native ratings.csv ingest: mmap + threaded parse with the
    rating>=min filter fused in, file order preserved (gc_load_ratings_csv).
    Returns (userId, movieId) int32 arrays, or None when the native lib is
    unavailable (caller falls back to pandas)."""
    lib = _load()
    if lib is None:
        return None
    n = lib.gc_count_csv_lines(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    users = np.empty(n, np.int32)
    movies = np.empty(n, np.int32)
    kept = lib.gc_load_ratings_csv(path.encode(), min_rating, users, movies)
    if kept < 0:
        raise FileNotFoundError(path)
    return users[:kept], movies[:kept]
