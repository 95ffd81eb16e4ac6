"""TPU-friendly graph structures: normalized COO (for segment-sum propagation) and
degree-bucketed ELL (for gather-based / Pallas propagation).

The reference delegates graph storage to PyG's ``edge_index`` tensors and the
propagation to ``LGConv``'s scatter-add CUDA kernels (reference models/light_gcn.py:4,
:24,:33 → torch-scatter/torch-sparse). On TPU, scatter is hostile and static shapes
are mandatory, so we precompute on host:

  * ``COOGraph`` — edges sorted by destination with symmetric-GCN weights
    ``w(s,d) = deg(s)^-1/2 · deg(d)^-1/2`` (LGConv's gcn_norm with no self-loops),
    padded to a static edge count. Propagation = gather + ``segment_sum`` with
    ``indices_are_sorted=True``.
  * ``EllGraph`` — nodes sorted by degree and grouped into buckets; each bucket is a
    dense (rows × width) neighbor-index/weight matrix padded to the bucket's max
    degree. Propagation = dense gather + weighted reduction, fully static, no
    scatter at all. This is the Pallas-kernel-ready layout.

Zero-degree nodes get weight 0 (LGConv masks inf → 0 in gcn_norm).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np


def compute_degrees(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """In-degree per node over the given (2, E) edge list."""
    return np.bincount(edge_index[1], minlength=num_nodes).astype(np.int64)


def gcn_norm(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Symmetric GCN edge weights, no self-loops (PyG LGConv semantics).

    ``w(e) = deg(src)^-1/2 * deg(dst)^-1/2`` with zero-degree → 0.
    """
    deg = compute_degrees(edge_index, num_nodes).astype(np.float64)
    with np.errstate(divide="ignore"):
        dinv = 1.0 / np.sqrt(deg)
    dinv[~np.isfinite(dinv)] = 0.0
    return (dinv[edge_index[0]] * dinv[edge_index[1]]).astype(np.float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class COOGraph:
    """Destination-sorted, weight-normalized, pad-to-static COO edge list.

    ``src``/``dst`` are int32 (E_pad,); ``w`` float32 (E_pad,) with zeros on the
    padding tail (pad edges are (0, num_nodes-1? no → (0,0) with w=0, harmless
    under segment-sum since their contribution is zero). ``num_edges`` is the
    true edge count.
    """

    src: np.ndarray
    dst: np.ndarray
    w: np.ndarray
    num_nodes: int
    num_edges: int

    @staticmethod
    def build(edge_index: np.ndarray, num_nodes: int, pad_to: int | None = None) -> "COOGraph":
        w = gcn_norm(edge_index, num_nodes)
        order = np.argsort(edge_index[1], kind="stable")
        src = edge_index[0, order].astype(np.int32)
        dst = edge_index[1, order].astype(np.int32)
        w = w[order]
        e = src.shape[0]
        pad = _round_up(max(e, 1), 128) if pad_to is None else pad_to
        if pad < e:
            raise ValueError(f"pad_to={pad} < num_edges={e}")
        if pad > e:
            # pad with zero-weight edges targeting the LAST node id so
            # indices_are_sorted stays true for segment_sum.
            src = np.concatenate([src, np.zeros(pad - e, np.int32)])
            dst = np.concatenate([dst, np.full(pad - e, num_nodes - 1, np.int32)])
            w = np.concatenate([w, np.zeros(pad - e, np.float32)])
        return COOGraph(src=src, dst=dst, w=w, num_nodes=num_nodes, num_edges=e)


@dataclass(frozen=True)
class EllBlock:
    """One degree bucket: ``rows`` nodes, each padded to ``width`` neighbors.

    ``nbr`` (rows, width) int32 — neighbor node ids, padding entries point at the
    phantom row ``num_nodes`` (callers append one zero row to the embedding
    matrix before gathering). ``w`` (rows, width) float32 — edge weights, zero on
    padding.
    """

    node_ids: np.ndarray      # (rows,) int32 — global node id of each row
    nbr: np.ndarray           # (rows, width) int32
    w: np.ndarray             # (rows, width) float32

    @property
    def rows(self) -> int:
        return int(self.node_ids.shape[0])

    @property
    def width(self) -> int:
        return int(self.nbr.shape[1])


@dataclass(frozen=True)
class EllGraph:
    """Degree-bucketed ELL adjacency: concatenation of blocks covers every node
    exactly once; ``inv_perm`` maps concatenated-row order back to node order."""

    blocks: List[EllBlock]
    inv_perm: np.ndarray      # (num_nodes,) int32: node id -> row in concat output
    num_nodes: int
    num_edges: int

    @staticmethod
    def build(
        edge_index: np.ndarray,
        num_nodes: int,
        width_buckets: Sequence[int] = (8, 32, 128, 512, 2048, 8192, 32768),
        row_align: int = 8,
    ) -> "EllGraph":
        """Bucket nodes by degree; each node lands in the smallest bucket whose
        width holds its full neighbor list (no neighbor is dropped — the last
        bucket width is grown to the true max degree if needed)."""
        w_all = gcn_norm(edge_index, num_nodes)
        dst = edge_index[1].astype(np.int64)
        order = np.argsort(dst, kind="stable")
        dst_s = dst[order]
        src_s = edge_index[0, order].astype(np.int64)
        ws = w_all[order]
        deg = np.bincount(dst_s, minlength=num_nodes)
        rowptr = np.concatenate([[0], np.cumsum(deg)])
        max_deg = int(deg.max(initial=0))
        widths = sorted(set(int(w) for w in width_buckets if w < max_deg)) + [max(_round_up(max_deg, 8), 8)]

        # position of each edge within its destination's neighbor run
        pos_in_row = np.arange(dst_s.shape[0], dtype=np.int64) - rowptr[dst_s]

        blocks: List[EllBlock] = []
        perm_rows: List[np.ndarray] = []
        lo = 0
        for wd in widths:
            sel = np.flatnonzero((deg > lo) & (deg <= wd)) if lo > 0 else np.flatnonzero(deg <= wd)
            lo = wd
            if sel.size == 0:
                continue
            rows = _round_up(sel.size, row_align)
            nbr = np.full((rows, wd), num_nodes, dtype=np.int32)
            bw = np.zeros((rows, wd), dtype=np.float32)
            # vectorized fill: every edge whose destination is in this bucket
            row_of = np.full(num_nodes, -1, dtype=np.int64)
            row_of[sel] = np.arange(sel.size)
            emask = row_of[dst_s] >= 0
            r = row_of[dst_s[emask]]
            c = pos_in_row[emask]
            nbr[r, c] = src_s[emask]
            bw[r, c] = ws[emask]
            node_ids = np.concatenate([sel, np.full(rows - sel.size, num_nodes, np.int64)])
            blocks.append(EllBlock(node_ids=node_ids.astype(np.int32), nbr=nbr, w=bw))
            perm_rows.append(node_ids)

        concat = np.concatenate(perm_rows) if perm_rows else np.zeros(0, np.int64)
        inv_perm = np.zeros(num_nodes, dtype=np.int32)
        valid = concat < num_nodes
        inv_perm[concat[valid]] = np.flatnonzero(valid)
        return EllGraph(
            blocks=blocks,
            inv_perm=inv_perm,
            num_nodes=num_nodes,
            num_edges=int(edge_index.shape[1]),
        )

    @property
    def padding_ratio(self) -> float:
        slots = sum(b.rows * b.width for b in self.blocks)
        return slots / max(self.num_edges, 1)


def build_csr(edge_index: np.ndarray, num_nodes: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(rowptr, col, w) CSR of the normalized adjacency — the on-disk /
    native-runtime interchange format."""
    w = gcn_norm(edge_index, num_nodes)
    order = np.argsort(edge_index[1], kind="stable")
    col = edge_index[0, order].astype(np.int32)
    w = w[order]
    deg = np.bincount(edge_index[1], minlength=num_nodes)
    rowptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    return rowptr, col, w


def adjacency_is_symmetric(edge_index: np.ndarray, num_nodes: int) -> bool:
    """True iff every directed edge has its mirror (multiset equality).

    The symmetric-Â custom VJP (ops/spmm.py::spmm_symmetric) and its sharded
    counterpart assume Â = Âᵀ, which holds exactly when the edge list is
    mirror-complete; edge-level 90/5/5 splits (reference
    data/dataset_handler.py:167-168) break this for ~2·p·(1−p) of pairs."""
    kf = edge_index[0].astype(np.int64) * num_nodes + edge_index[1]
    kb = edge_index[1].astype(np.int64) * num_nodes + edge_index[0]
    return bool(np.array_equal(np.sort(kf), np.sort(kb)))
