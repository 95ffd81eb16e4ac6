"""Native graphcore (C++) vs NumPy parity tests."""

import numpy as np
import pytest

from movie_recommender_system_with_gnns_tpu.data import native
from movie_recommender_system_with_gnns_tpu.data.graph import build_csr as np_csr
from movie_recommender_system_with_gnns_tpu.data.movielens import to_undirected as np_undirected

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libgraphcore.so not built")


def test_csr_matches_numpy(tiny_graph):
    e, n = tiny_graph
    rp_n, col_n, w_n = np_csr(e, n)
    rp_c, col_c, w_c = native.build_csr(e[0], e[1], n)
    np.testing.assert_array_equal(rp_n, rp_c)
    # within a row, edge order may differ (counting sort vs argsort); compare
    # as sorted per row
    for r in range(n):
        a, b = rp_n[r], rp_n[r + 1]
        np.testing.assert_array_equal(np.sort(col_n[a:b]), np.sort(col_c[a:b]))
    np.testing.assert_allclose(np.sort(w_n), np.sort(w_c), rtol=1e-6)


def test_to_undirected_matches_numpy(rng):
    src = rng.integers(0, 50, 500).astype(np.int32)
    dst = rng.integers(50, 120, 500).astype(np.int32)
    a = np_undirected(np.stack([src, dst]), 120)
    b = native.to_undirected(src, dst, 120)
    np.testing.assert_array_equal(a, b)


def test_partition_greedy_native(tiny_data):
    e = tiny_data.edge_index
    nu = tiny_data.num_users
    ni = tiny_data.num_items
    fwd = (e[0] < nu) & (e[1] >= nu)
    u = e[0][fwd].astype(np.int64)
    it = (e[1][fwd] - nu).astype(np.int64)
    pu, pi, kept = native.partition_greedy(u, it, nu, ni, 4)
    assert pu.shape == (nu,) and pi.shape == (ni,)
    assert set(np.unique(pu)) <= set(range(4))
    assert kept == int((pu[u] == pi[it]).sum())
    # degree balance: no part should hold more than ~2x the mean user degree mass
    deg = np.bincount(u, minlength=nu)
    mass = np.array([deg[pu == p].sum() for p in range(4)])
    assert mass.max() <= 2.5 * mass.mean()


def test_member_hashes(rng):
    u = rng.integers(0, 100, 1000).astype(np.int32)
    it = rng.integers(0, 200, 1000).astype(np.int32)
    h = native.member_hashes(u, it)
    s = u.astype(np.uint64) + it.astype(np.uint64)
    expect = np.unique(s * (s + 1) // 2 + it.astype(np.uint64))
    np.testing.assert_array_equal(h, expect)


def test_partition_balance_caps_kept_edges(tiny_data):
    """gc_partition_balance must cap every part's kept-edge count near
    tol x mean without collapsing retention (native and NumPy paths agree on
    the invariants)."""
    from movie_recommender_system_with_gnns_tpu.data.partition import (
        partition_bipartite_greedy,
    )

    e = tiny_data.edge_index
    nu = tiny_data.num_users
    n = nu + tiny_data.num_items
    base = partition_bipartite_greedy(e, nu, n, 4, balance_tol=0.0)
    bal = partition_bipartite_greedy(e, nu, n, 4, balance_tol=1.1)
    kept_base = sum(p.shape[1] for p in base)
    kept_bal = sum(p.shape[1] for p in bal)
    sizes = np.array([p.shape[1] for p in bal if p.shape[1] > 0])
    # cap holds up to single-user granularity (a user's whole edge bundle
    # moves at once, so allow one max-degree user's edges of slack)
    fwd = (e[0] < nu) & (e[1] >= nu)
    max_user_edges = 2 * int(np.bincount(e[0][fwd], minlength=nu).max())
    assert sizes.max() <= 1.1 * sizes.mean() + max_user_edges
    # retention must not collapse
    assert kept_bal >= 0.7 * kept_base
    # every balanced part is still a valid intra-cluster edge set
    for p in bal:
        if p.shape[1] == 0:
            continue
        assert p.shape[0] == 2
        heads = p[0]
        tails = p[1]
        fwd = heads < nu
        assert (tails[fwd] >= nu).all()


def test_partition_balance_numpy_fallback(tiny_data, monkeypatch):
    """The NumPy fallback honors the same cap when the native lib is absent."""
    from movie_recommender_system_with_gnns_tpu.data import partition as P

    monkeypatch.setattr(native, "available", lambda: False)
    e = tiny_data.edge_index
    nu = tiny_data.num_users
    n = nu + tiny_data.num_items
    bal = P.partition_bipartite_greedy(e, nu, n, 4, balance_tol=1.1)
    sizes = np.array([p.shape[1] for p in bal if p.shape[1] > 0])
    fwd = (e[0] < nu) & (e[1] >= nu)
    max_user_edges = 2 * int(np.bincount(e[0][fwd], minlength=nu).max())
    assert sizes.max() <= 1.1 * sizes.mean() + max_user_edges
