"""Graph-structure tests: undirected doubling, GCN norm, COO/ELL equivalence."""

import numpy as np
import jax.numpy as jnp

from movie_recommender_system_with_gnns_tpu.data.graph import (
    COOGraph, EllGraph, build_csr, compute_degrees, gcn_norm,
)
from movie_recommender_system_with_gnns_tpu.data.movielens import to_undirected
from movie_recommender_system_with_gnns_tpu.ops.spmm import (
    DeviceCOO, DeviceELL, spmm_ell, spmm_segment,
)


def _dense_ahat(edge_index, num_nodes):
    """NumPy oracle: Â = D^{-1/2} A D^{-1/2} as a dense matrix."""
    a = np.zeros((num_nodes, num_nodes))
    a[edge_index[1], edge_index[0]] = 1.0  # row = dst, col = src
    deg = a.sum(axis=1)
    with np.errstate(divide="ignore"):
        d = 1.0 / np.sqrt(deg)
    d[~np.isfinite(d)] = 0.0
    return d[:, None] * a * d[None, :]


def test_to_undirected_doubles_and_dedups():
    e = np.array([[0, 1, 0], [2, 3, 2]])  # duplicate (0,2)
    out = to_undirected(e, 4)
    # {(0,2),(1,3),(2,0),(3,1)}
    assert out.shape == (2, 4)
    pairs = set(map(tuple, out.T.tolist()))
    assert pairs == {(0, 2), (1, 3), (2, 0), (3, 1)}


def test_gcn_norm_matches_dense_oracle(tiny_graph):
    e, n = tiny_graph
    w = gcn_norm(e, n)
    ahat = _dense_ahat(e, n)
    np.testing.assert_allclose(w, ahat[e[1], e[0]], rtol=1e-6)


def test_spmm_segment_matches_dense(tiny_graph, rng):
    e, n = tiny_graph
    x = rng.standard_normal((n, 16)).astype(np.float32)
    coo = DeviceCOO.from_host(COOGraph.build(e, n))
    out = np.asarray(spmm_segment(coo, jnp.asarray(x)))
    ref = _dense_ahat(e, n) @ x
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_spmm_ell_matches_segment(tiny_graph, rng):
    e, n = tiny_graph
    x = rng.standard_normal((n, 16)).astype(np.float32)
    coo = DeviceCOO.from_host(COOGraph.build(e, n))
    ell = DeviceELL.from_host(EllGraph.build(e, n))
    a = np.asarray(spmm_segment(coo, jnp.asarray(x)))
    b = np.asarray(spmm_ell(ell, jnp.asarray(x)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_coo_padding_is_neutral(tiny_graph, rng):
    e, n = tiny_graph
    x = rng.standard_normal((n, 8)).astype(np.float32)
    small = DeviceCOO.from_host(COOGraph.build(e, n))
    big = DeviceCOO.from_host(COOGraph.build(e, n, pad_to=4 * e.shape[1]))
    np.testing.assert_allclose(
        np.asarray(spmm_segment(small, jnp.asarray(x))),
        np.asarray(spmm_segment(big, jnp.asarray(x))),
        rtol=1e-5, atol=1e-6,
    )


def test_ell_covers_every_edge(tiny_graph):
    e, n = tiny_graph
    ell = EllGraph.build(e, n)
    total = sum(int((b.w != 0).sum()) for b in ell.blocks)
    w = gcn_norm(e, n)
    assert total == int((w != 0).sum())


def test_csr_roundtrip(tiny_graph):
    e, n = tiny_graph
    rowptr, col, w = build_csr(e, n)
    assert rowptr[-1] == e.shape[1]
    deg = compute_degrees(e, n)
    np.testing.assert_array_equal(np.diff(rowptr), deg)


def test_spmm_chunked_matches_segment(tiny_graph, rng):
    from movie_recommender_system_with_gnns_tpu.ops.spmm import make_spmm_chunked

    e, n = tiny_graph
    x = rng.standard_normal((n, 16)).astype(np.float32)
    coo = DeviceCOO.from_host(COOGraph.build(e, n))   # padded to mult of 128
    ref = np.asarray(spmm_segment(coo, jnp.asarray(x)))
    for k in (1, 2, 4):
        if coo.src.shape[0] % k:
            continue
        out = np.asarray(make_spmm_chunked(k)(coo, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_spmm_chunked_gradients(tiny_graph, rng):
    from movie_recommender_system_with_gnns_tpu.ops.spmm import make_spmm_chunked
    import jax

    e, n = tiny_graph
    x = rng.standard_normal((n, 8)).astype(np.float32)
    coo = DeviceCOO.from_host(COOGraph.build(e, n))
    f_ref = lambda x: jnp.sum(spmm_segment(coo, x) ** 2)
    f_chk = lambda x: jnp.sum(make_spmm_chunked(2)(coo, x) ** 2)
    g_ref = np.asarray(jax.grad(f_ref)(jnp.asarray(x)))
    g_chk = np.asarray(jax.grad(f_chk)(jnp.asarray(x)))
    np.testing.assert_allclose(g_chk, g_ref, rtol=1e-4, atol=1e-5)


def test_partition_edges_random_keeps_everything(tiny_data):
    from movie_recommender_system_with_gnns_tpu.data.partition import (
        edge_retention, partition_edges_random,
    )

    e = tiny_data.edge_index
    parts = partition_edges_random(e, tiny_data.num_users, 5)
    assert len(parts) == 5
    assert edge_retention(parts, e.shape[1]) == 1.0
    sizes = np.array([p.shape[1] for p in parts])
    assert sizes.max() < 2 * sizes.mean()


def test_hybrid_spmm_matches_segment():
    """Â = Â_diag + Â_off decomposition must reproduce spmm_segment exactly
    (f32 blocks on CPU; bf16 blocks are the TPU perf configuration)."""
    import jax
    import jax.numpy as jnp

    from movie_recommender_system_with_gnns_tpu.data.graph import COOGraph
    from movie_recommender_system_with_gnns_tpu.data.movielens import (
        make_synthetic_movielens,
    )
    from movie_recommender_system_with_gnns_tpu.data.partition import (
        partition_assignments,
    )
    from movie_recommender_system_with_gnns_tpu.ops.spmm import (
        DeviceCOO, build_hybrid_graph, spmm_hybrid, spmm_segment,
    )

    data = make_synthetic_movielens(300, 500, 20_000, seed=4)
    n = 800
    pu, pi = partition_assignments(data.edge_index, 300, n, 4)
    node_part = np.concatenate([pu, pi])
    h = build_hybrid_graph(data.edge_index, n, node_part, 4, align=8,
                           block_dtype=jnp.float32)
    full = DeviceCOO.from_host(COOGraph.build(data.edge_index, n))
    emb = jax.random.normal(jax.random.PRNGKey(0), (n, 16))
    a = np.asarray(spmm_segment(full, emb))
    b = np.asarray(spmm_hybrid(h, emb))
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
    assert rel < 1e-5, rel
    # differentiable: grads flow through both the dense blocks and the COO path
    g = jax.grad(lambda e: spmm_hybrid(h, e).sum())(emb)
    gref = jax.grad(lambda e: spmm_segment(full, e).sum())(emb)
    rel_g = np.abs(np.asarray(g) - np.asarray(gref)).max() / (
        np.abs(np.asarray(gref)).max() + 1e-12)
    assert rel_g < 1e-5, rel_g
