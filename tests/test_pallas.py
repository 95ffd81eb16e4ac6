"""Pallas one-hot SpMM kernel: golden tests vs the segment-sum oracle.

Runs in interpreter mode on the CPU test platform; the same kernel compiles and
matches on real TPU (verified on v5e — see ops/pallas_spmm.py docstring for the
measured numbers).
"""

import numpy as np
import jax.numpy as jnp

from movie_recommender_system_with_gnns_tpu.data.graph import COOGraph, EllGraph
from movie_recommender_system_with_gnns_tpu.ops.pallas_spmm import (
    select_spmm, spmm_ell_pallas,
)
from movie_recommender_system_with_gnns_tpu.ops.spmm import (
    DeviceCOO, DeviceELL, spmm_ell, spmm_segment,
)


def test_pallas_spmm_matches_segment(tiny_graph, rng):
    e, n = tiny_graph
    x = rng.standard_normal((n, 16)).astype(np.float32)
    coo = DeviceCOO.from_host(COOGraph.build(e, n))
    ell = DeviceELL.from_host(EllGraph.build(e, n, row_align=128))
    ref = np.asarray(spmm_segment(coo, jnp.asarray(x)))
    out = np.asarray(spmm_ell_pallas(ell, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_pallas_spmm_wide_bucket_split(rng):
    """A node with degree > W_UNROLL_MAX exercises the width-splitting path."""
    hub_edges = np.stack([
        np.arange(1, 120, dtype=np.int64),
        np.zeros(119, dtype=np.int64),
    ])
    back = hub_edges[::-1]
    e = np.concatenate([hub_edges, back], axis=1)
    n = 120
    x = rng.standard_normal((n, 8)).astype(np.float32)
    coo = DeviceCOO.from_host(COOGraph.build(e, n))
    ell = DeviceELL.from_host(EllGraph.build(e, n, row_align=128))
    assert any(b.nbr.shape[1] > 32 for b in ell.blocks)
    ref = np.asarray(spmm_segment(coo, jnp.asarray(x)))
    out = np.asarray(spmm_ell_pallas(ell, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_select_spmm_default_is_xla():
    assert select_spmm(1000, 64) is spmm_ell
    assert select_spmm(1000, 64, use_pallas=True) is spmm_ell_pallas


def test_pallas_mips_matches_flat(rng):
    """Fused MIPS kernel (interpret mode on CPU; exact-match verified on v5e)."""
    from movie_recommender_system_with_gnns_tpu.ops.pallas_mips import mips_topk_pallas

    q = rng.standard_normal((8, 16)).astype(np.float32)
    c = rng.standard_normal((1000, 16)).astype(np.float32)
    s_p, i_p = mips_topk_pallas(jnp.asarray(q), jnp.asarray(c), k=7, block=256)
    from movie_recommender_system_with_gnns_tpu.ops.topk import mips_topk

    s_x, i_x = mips_topk(jnp.asarray(q), jnp.asarray(c), k=7, method="flat")
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))


def test_pallas_mips_padding_masked(rng):
    """Catalog sizes not divisible by block: padding rows must never win."""
    from movie_recommender_system_with_gnns_tpu.ops.pallas_mips import mips_topk_pallas

    q = rng.standard_normal((4, 8)).astype(np.float32)
    c = rng.standard_normal((130, 8)).astype(np.float32)
    s, i = mips_topk_pallas(jnp.asarray(q), jnp.asarray(c), k=5, block=64)
    assert np.all(np.asarray(i) < 130)


def test_pallas_mips_exclusion(rng):
    from movie_recommender_system_with_gnns_tpu.ops.pallas_mips import mips_topk_pallas
    from movie_recommender_system_with_gnns_tpu.ops.topk import full_sort_scores

    q = rng.standard_normal((4, 8)).astype(np.float32)
    c = rng.standard_normal((300, 8)).astype(np.float32)
    ref = np.asarray(full_sort_scores(jnp.asarray(q), jnp.asarray(c)))
    banned = ref.argmax(axis=1)
    mask = np.zeros((4, 300), bool)
    mask[np.arange(4), banned] = True
    s, i = mips_topk_pallas(jnp.asarray(q), jnp.asarray(c), k=5, block=64,
                            exclude_mask=jnp.asarray(mask))
    i = np.asarray(i)
    for r in range(4):
        assert banned[r] not in i[r]
        # best unbanned item must win
        exp = np.argsort(-ref[r])
        exp = exp[exp != banned[r]][0]
        assert i[r][0] == exp


def test_pallas_spmm_unaligned_rows(tiny_graph, rng):
    """row_align=4 can yield bucket row counts that are NOT multiples of the
    8-row tile; the kernel must pad rather than silently truncate the tail
    rows (regression: floored grid left them unwritten)."""
    e, n = tiny_graph
    x = rng.standard_normal((n, 16)).astype(np.float32)
    coo = DeviceCOO.from_host(COOGraph.build(e, n))
    ell = DeviceELL.from_host(EllGraph.build(e, n, row_align=4))
    assert any(b.nbr.shape[0] % 8 != 0 for b in ell.blocks), \
        "fixture no longer produces unaligned buckets; lower row_align"
    ref = np.asarray(spmm_segment(coo, jnp.asarray(x)))
    out = np.asarray(spmm_ell_pallas(ell, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
