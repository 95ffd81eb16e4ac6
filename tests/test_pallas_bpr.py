"""Golden tests for the fused Pallas BPR kernel (ops/pallas_bpr.py).

Runs in interpret mode on the CPU mesh (tests/conftest.py pins JAX_PLATFORMS=cpu);
the same code path compiles via Mosaic on the real TPU. Reference semantics per
reference utils/train_test.py:18-64; tolerance covers the kernel's documented
bfloat16 MXU gather rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from movie_recommender_system_with_gnns_tpu.config import Config, ModelConfig, TrainConfig
from movie_recommender_system_with_gnns_tpu.data.movielens import make_synthetic_movielens
from movie_recommender_system_with_gnns_tpu.data.partition import partition_bipartite_greedy
from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
from movie_recommender_system_with_gnns_tpu.ops.sampling import sample_negative
from movie_recommender_system_with_gnns_tpu.training.compact import (
    build_compact_clusters,
    compact_cluster_loss,
    densify_adjacency,
)


def _problem(seed=0):
    data = make_synthetic_movielens(96, 160, 4000, seed=seed)
    parts = [p for p in partition_bipartite_greedy(data.edge_index, 96, 256, 3)
             if p.shape[1] > 0]
    cc = densify_adjacency(build_compact_clusters(parts, 96, align=8),
                           dtype=jnp.float32)
    params = init_params(jax.random.PRNGKey(seed), 96, 160, 16)
    return cc, params


@pytest.mark.parametrize("cluster_idx", [0, 1])
def test_fused_matches_xla_loss_and_grads(cluster_idx):
    cc, params = _problem()
    cluster = tuple(x[cluster_idx] for x in (
        cc.user_ids, cc.item_ids, cc.src, cc.dst, cc.w,
        cc.user_local, cc.pos_local, cc.mask))
    neg = sample_negative(jax.random.PRNGKey(7 + cluster_idx),
                          cluster[5].shape[0], 160)
    adj = cc.adj[cluster_idx]
    cfg_x = Config(model=ModelConfig(num_layers=2, dim=16))
    cfg_f = cfg_x.replace(train=TrainConfig(fused_bpr=True))

    lx, gx = jax.value_and_grad(compact_cluster_loss)(
        params, cluster, neg, cfg_x, cc.u_pad, cc.i_pad, adj)
    lf, gf = jax.value_and_grad(compact_cluster_loss)(
        params, cluster, neg, cfg_f, cc.u_pad, cc.i_pad, adj)

    # loss matches tightly; grads within bf16 MXU-gather rounding
    assert abs(float(lx) - float(lf)) < 5e-4
    for a, b in [(gx.user_emb, gf.user_emb), (gx.item_emb, gf.item_emb)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 1e-2, f"grad rel err {rel}"


def test_fused_handles_in_cluster_negatives():
    """Negatives that fall inside the cluster must use the propagated row
    (training/compact.py membership-probe semantics), same as the XLA path."""
    cc, params = _problem(seed=3)
    cluster = tuple(x[0] for x in (
        cc.user_ids, cc.item_ids, cc.src, cc.dst, cc.w,
        cc.user_local, cc.pos_local, cc.mask))
    # force ALL negatives in-cluster: sample from the cluster's own item ids
    b = cluster[5].shape[0]
    neg = cluster[1][jax.random.randint(jax.random.PRNGKey(0), (b,), 0,
                                        int(cc.item_valid[0].sum()))]
    adj = cc.adj[0]
    cfg_x = Config(model=ModelConfig(num_layers=2, dim=16))
    cfg_f = cfg_x.replace(train=TrainConfig(fused_bpr=True))
    lx = compact_cluster_loss(params, cluster, neg, cfg_x, cc.u_pad, cc.i_pad, adj)
    lf = compact_cluster_loss(params, cluster, neg, cfg_f, cc.u_pad, cc.i_pad, adj)
    assert abs(float(lx) - float(lf)) < 5e-4


def test_fused_padding_neutral():
    """Rows beyond the valid edge count (mask=False) must not change the loss:
    compare a cluster against the same cluster with extra masked rows."""
    cc, params = _problem(seed=5)
    cluster = list(tuple(x[0] for x in (
        cc.user_ids, cc.item_ids, cc.src, cc.dst, cc.w,
        cc.user_local, cc.pos_local, cc.mask)))
    adj = cc.adj[0]
    cfg_f = Config(model=ModelConfig(num_layers=2, dim=16),
                   train=TrainConfig(fused_bpr=True))
    b = cluster[5].shape[0]
    neg = sample_negative(jax.random.PRNGKey(1), b, 160)
    base = compact_cluster_loss(params, tuple(cluster), neg, cfg_f,
                                cc.u_pad, cc.i_pad, adj)

    # append 64 garbage-but-masked triplet rows
    pad = 64
    cluster2 = cluster.copy()
    cluster2[5] = jnp.concatenate([cluster[5], jnp.zeros((pad,), jnp.int32)])
    cluster2[6] = jnp.concatenate([cluster[6], jnp.zeros((pad,), jnp.int32)])
    cluster2[7] = jnp.concatenate([cluster[7], jnp.zeros((pad,), bool)])
    neg2 = jnp.concatenate([neg, jnp.full((pad,), 3, jnp.int32)])
    padded = compact_cluster_loss(params, tuple(cluster2), neg2, cfg_f,
                                  cc.u_pad, cc.i_pad, adj)
    assert abs(float(base) - float(padded)) < 1e-5


def test_fused_standard_loss_matches_xla():
    """The fused kernel's 'standard' variant must match bpr_loss_standard."""
    cc, params = _problem(seed=9)
    cluster = tuple(x[0] for x in (
        cc.user_ids, cc.item_ids, cc.src, cc.dst, cc.w,
        cc.user_local, cc.pos_local, cc.mask))
    neg = sample_negative(jax.random.PRNGKey(4), cluster[5].shape[0], 160)
    adj = cc.adj[0]
    cfg_x = Config(model=ModelConfig(num_layers=2, dim=16),
                   train=TrainConfig(loss="standard"))
    cfg_f = cfg_x.replace(train=TrainConfig(loss="standard", fused_bpr=True))
    lx, gx = jax.value_and_grad(compact_cluster_loss)(
        params, cluster, neg, cfg_x, cc.u_pad, cc.i_pad, adj)
    lf, gf = jax.value_and_grad(compact_cluster_loss)(
        params, cluster, neg, cfg_f, cc.u_pad, cc.i_pad, adj)
    assert abs(float(lx) - float(lf)) < 5e-4
    for a, b in [(gx.user_emb, gf.user_emb), (gx.item_emb, gf.item_emb)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 1e-2, f"grad rel err {rel}"
