"""Data-parallel compact-cluster trainer over the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from movie_recommender_system_with_gnns_tpu.config import Config, ModelConfig, TrainConfig
from movie_recommender_system_with_gnns_tpu.data.partition import partition_bipartite_greedy
from movie_recommender_system_with_gnns_tpu.models.lightgcn import init_params
from movie_recommender_system_with_gnns_tpu.ops.sampling import sample_negative
from movie_recommender_system_with_gnns_tpu.parallel.mesh import make_mesh
from movie_recommender_system_with_gnns_tpu.training.compact import (
    build_compact_clusters, compact_cluster_loss, densify_adjacency,
)
from movie_recommender_system_with_gnns_tpu.training.compact_sharded import (
    make_compact_sharded_epoch_fn,
)
from movie_recommender_system_with_gnns_tpu.training.train import (
    TrainState, make_optimizer,
)


def _cfg():
    return Config(model=ModelConfig(num_layers=2, dim=8), train=TrainConfig(lr=1e-2))


@pytest.fixture(scope="module")
def dmesh():
    return make_mesh(data_parallel=4, model_parallel=2)


def _setup(tiny_data, num_parts=4, dense=False):
    cfg = _cfg()
    nu, ni = tiny_data.num_users, tiny_data.num_items
    n = nu + ni
    parts = partition_bipartite_greedy(tiny_data.edge_index, nu, n, num_parts)
    parts = [p for p in parts if p.shape[1] > 0]
    # pad part list to the requested count with tiny leftovers if needed
    while len(parts) < num_parts:
        parts.append(parts[-1][:, :2])
    cc = build_compact_clusters(parts, nu, align=8)
    if dense:
        cc = densify_adjacency(cc, dtype=jnp.float32)
    return cfg, nu, ni, cc


def test_sharded_compact_trains(tiny_data, dmesh):
    cfg, nu, ni, cc = _setup(tiny_data, dense=True)
    params = init_params(jax.random.PRNGKey(0), nu, ni, cfg.model.dim)
    opt = make_optimizer(cfg)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    fn = make_compact_sharded_epoch_fn(cfg, dmesh)(cc)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(4):
        key, sub = jax.random.split(key)
        state, loss = fn(state, cc, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 4 * (cc.num_clusters // 4)


def test_sharded_compact_matches_manual_batched_update(tiny_data, dmesh):
    """One superstep == one Adam update on the edge-weighted mean of the
    per-cluster grads, computed by hand on a single device."""
    cfg, nu, ni, cc = _setup(tiny_data, dense=False)
    params = init_params(jax.random.PRNGKey(1), nu, ni, cfg.model.dim)
    opt = make_optimizer(cfg)
    # epoch_fn donates its input state — keep an independent copy for the
    # manual reference computation
    copy = lambda p: jax.tree.map(lambda x: jnp.array(np.asarray(x)), p)
    state_params = copy(params)
    state = TrainState(state_params, opt.init(state_params), jnp.zeros((), jnp.int32))

    key = jax.random.PRNGKey(3)
    fn = make_compact_sharded_epoch_fn(cfg, dmesh)(cc)
    # k == pd -> the epoch is exactly ONE superstep; replicate its key math
    assert cc.num_clusters == 4
    state2, loss_sh = fn(state, cc, key)

    perm_key, neg_key = jax.random.split(key)
    perm = np.asarray(jax.random.permutation(perm_key, cc.num_clusters))
    keys = jax.random.split(neg_key, cc.num_clusters)
    ec = np.asarray(cc.edge_counts)
    wsum = ec[perm].sum()
    grads_acc = None
    loss_acc = 0.0
    for j, ci in enumerate(perm):
        cluster = (cc.user_ids[ci], cc.item_ids[ci], cc.src[ci], cc.dst[ci],
                   cc.w[ci], cc.user_local[ci], cc.pos_local[ci], cc.mask[ci])
        neg = sample_negative(keys[ci], cc.user_local.shape[1], ni)
        loss, g = jax.value_and_grad(compact_cluster_loss)(
            params, cluster, neg, cfg, cc.u_pad, cc.i_pad)
        wgt = ec[ci] / wsum
        g = jax.tree.map(lambda x: x * wgt, g)
        grads_acc = g if grads_acc is None else jax.tree.map(jnp.add, grads_acc, g)
        loss_acc += float(loss) * ec[ci]
    upd, _ = opt.update(grads_acc, opt.init(params), params)
    manual = optax.apply_updates(params, upd)

    np.testing.assert_allclose(float(loss_sh), loss_acc / ec.sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state2.params.user_emb),
                               np.asarray(manual.user_emb), rtol=2e-4, atol=1e-6)
