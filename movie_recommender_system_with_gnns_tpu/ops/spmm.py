"""Sparse·dense propagation kernels for LightGCN: ``out = Â @ emb``.

This is THE hot kernel of training (reference models/light_gcn.py:33 → PyG LGConv →
torch-scatter CUDA scatter-add; see SURVEY §3.3). TPU-native paths:

  * :func:`spmm_ell`      — degree-bucketed dense gather + weighted reduction over
                            static ELL blocks. No scatter; XLA lowers the gather to
                            efficient dynamic-gather and fuses the multiply-reduce.
  * ``ops.pallas_spmm``   — hand-tiled Pallas kernel for the same ELL layout.
  * :func:`spmm_segment`  — destination-sorted COO gather + ``segment_sum``; the
                            reference-semantics oracle (golden-test baseline).

Graph containers are registered pytrees whose array fields are traced while the
shape metadata (``num_nodes``) stays static — required because ``segment_sum``'s
segment count and the output row count must be compile-time constants.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import COOGraph, EllGraph


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceCOO:
    """COOGraph on device: dst-sorted edges with static padded length."""

    src: jax.Array   # (E_pad,) int32
    dst: jax.Array   # (E_pad,) int32, sorted ascending
    w: jax.Array     # (E_pad,) float32, zero on padding
    num_nodes: int   # static

    def tree_flatten(self):
        return (self.src, self.dst, self.w), self.num_nodes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_nodes=aux)

    @staticmethod
    def from_host(g: COOGraph) -> "DeviceCOO":
        return DeviceCOO(
            src=jnp.asarray(g.src),
            dst=jnp.asarray(g.dst),
            w=jnp.asarray(g.w),
            num_nodes=g.num_nodes,
        )


class DeviceEllBlock(NamedTuple):
    node_ids: jax.Array  # (rows,) int32
    nbr: jax.Array       # (rows, width) int32 — padding points at row num_nodes
    w: jax.Array         # (rows, width) float32


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceELL:
    """Degree-bucketed ELL adjacency on device (scatter-free propagation)."""

    blocks: Tuple[DeviceEllBlock, ...]
    inv_perm: jax.Array  # (num_nodes,) int32
    num_nodes: int       # static

    def tree_flatten(self):
        return (self.blocks, self.inv_perm), self.num_nodes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(blocks=children[0], inv_perm=children[1], num_nodes=aux)

    @staticmethod
    def from_host(g: EllGraph) -> "DeviceELL":
        return DeviceELL(
            blocks=tuple(
                DeviceEllBlock(jnp.asarray(b.node_ids), jnp.asarray(b.nbr), jnp.asarray(b.w))
                for b in g.blocks
            ),
            inv_perm=jnp.asarray(g.inv_perm),
            num_nodes=g.num_nodes,
        )


def spmm_segment(coo: DeviceCOO, emb: jax.Array) -> jax.Array:
    """Reference-semantics propagation: ``out[d] = Σ_e w[e]·emb[src[e]]``.

    Equivalent math to PyG LGConv's normalized scatter-add (light_gcn.py:33).
    Edges are pre-sorted by destination so XLA can use the sorted segment path.
    """
    gathered = emb[coo.src] * coo.w[:, None].astype(emb.dtype)
    return jax.ops.segment_sum(
        gathered, coo.dst, num_segments=coo.num_nodes,
        indices_are_sorted=True,
    )


def make_spmm_chunked(num_chunks: int):
    """Edge-chunked segment-sum propagation for memory-bounded full-graph steps.

    The plain path materializes the full (E, d) gathered-message tensor — at
    ML-25M with d=128 that is ~12.7 GB per layer and overflows one chip's HBM.
    This variant scans ``num_chunks`` edge blocks, accumulating into the (N, d)
    output, so peak extra memory is (E/num_chunks, d). Edges are dst-sorted, so
    every chunk's scatter-add touches a contiguous row range.
    """

    def spmm_chunked(coo: DeviceCOO, emb: jax.Array) -> jax.Array:
        e_pad = coo.src.shape[0]
        if e_pad % num_chunks != 0:
            raise ValueError(f"padded edge count {e_pad} not divisible by "
                             f"num_chunks={num_chunks}")
        c = e_pad // num_chunks
        src = coo.src.reshape(num_chunks, c)
        dst = coo.dst.reshape(num_chunks, c)
        w = coo.w.reshape(num_chunks, c)

        def body(acc, x):
            s, d, wt = x
            msg = emb[s] * wt[:, None].astype(emb.dtype)
            return acc.at[d].add(msg), None

        acc0 = jnp.zeros((coo.num_nodes, emb.shape[1]), emb.dtype)
        out, _ = jax.lax.scan(body, acc0, (src, dst, w))
        return out

    return spmm_chunked


def spmm_ell(ell: DeviceELL, emb: jax.Array) -> jax.Array:
    """Scatter-free propagation over degree-bucketed ELL blocks.

    For each bucket: gather (rows, width, d) neighbor embeddings, multiply by
    edge weights, reduce over width. Block outputs concatenate in permuted node
    order; a single inverse-permutation gather restores node order.
    """
    emb_pad = jnp.concatenate([emb, jnp.zeros((1, emb.shape[1]), emb.dtype)], axis=0)
    outs: List[jax.Array] = []
    for blk in ell.blocks:
        g = emb_pad[blk.nbr]                      # (rows, width, d)
        outs.append(
            jnp.einsum("rw,rwd->rd", blk.w.astype(emb.dtype), g)
        )
    stacked = jnp.concatenate(outs, axis=0)       # (Σ rows, d)
    return stacked[ell.inv_perm]
