"""Golden parity tests vs a torch-CPU oracle re-expressing the reference math.

The oracle re-implements (not copies) the reference's exact formulas:
LGConv propagation with symmetric GCN norm (reference models/light_gcn.py:28-40),
the quirky double-normalized readout, and bpr_loss (utils/train_test.py:18-51).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from movie_recommender_system_with_gnns_tpu.data.graph import COOGraph
from movie_recommender_system_with_gnns_tpu.models.lightgcn import (
    LightGCNParams, propagate,
)
from movie_recommender_system_with_gnns_tpu.ops.bpr import bpr_loss
from movie_recommender_system_with_gnns_tpu.ops.spmm import DeviceCOO, spmm_segment


def torch_lightgcn_forward(user_w, item_w, edge_index, num_layers):
    """Torch oracle of LightGCN.forward (light_gcn.py:28-40) incl. the extra
    1/(K+1) factor at :36."""
    emb = torch.cat([user_w, item_w])
    n = emb.shape[0]
    src = torch.tensor(edge_index[0], dtype=torch.long)
    dst = torch.tensor(edge_index[1], dtype=torch.long)
    deg = torch.zeros(n).index_add_(0, dst, torch.ones_like(dst, dtype=torch.float))
    dinv = deg.pow(-0.5)
    dinv[torch.isinf(dinv)] = 0.0
    w = dinv[src] * dinv[dst]
    embs = [emb]
    for _ in range(num_layers):
        out = torch.zeros_like(emb)
        out.index_add_(0, dst, emb[src] * w[:, None])
        emb = out
        embs.append(emb)
    final = 1.0 / (num_layers + 1) * torch.stack(embs, dim=1).mean(dim=1)
    return final[: user_w.shape[0]], final[user_w.shape[0]:]


def torch_bpr_loss(uf, ui, pf, pi, nf, ni, coeff=5e-3):
    """Torch oracle of bpr_loss (train_test.py:18-51)."""
    reg = coeff * (ui * ui + pi * pi + ni * ni).mean()
    nu = uf / uf.norm(dim=1, keepdim=True)
    np_ = pf / pf.norm(dim=1, keepdim=True)
    nn_ = nf / nf.norm(dim=1, keepdim=True)
    cp = (nu * np_).sum(dim=1)
    cn = (nu * nn_).sum(dim=1)
    score = torch.nn.functional.softplus(10 * (cp - cn)).mean() / 10.0
    return -score + reg


@pytest.mark.parametrize("num_layers", [1, 3])
def test_propagation_parity(tiny_data, num_layers):
    n_u, n_i = tiny_data.num_users, tiny_data.num_items
    e = tiny_data.edge_index
    rng = np.random.default_rng(1)
    uw = rng.standard_normal((n_u, 16)).astype(np.float32)
    iw = rng.standard_normal((n_i, 16)).astype(np.float32)

    tu, ti = torch_lightgcn_forward(torch.tensor(uw), torch.tensor(iw), e, num_layers)

    params = LightGCNParams(jnp.asarray(uw), jnp.asarray(iw))
    coo = DeviceCOO.from_host(COOGraph.build(e, n_u + n_i))
    ju, ji = propagate(params, coo, spmm_segment, num_layers, readout="reference")

    np.testing.assert_allclose(np.asarray(ju), tu.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ji), ti.numpy(), rtol=1e-4, atol=1e-5)


def test_bpr_loss_parity(rng):
    b, d = 64, 16
    arrs = [rng.standard_normal((b, d)).astype(np.float32) for _ in range(6)]
    t = torch_bpr_loss(*[torch.tensor(a) for a in arrs])
    j = bpr_loss(*[jnp.asarray(a) for a in arrs])
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)


def test_bpr_loss_padding_neutral(rng):
    """Masked padded batch must equal the unpadded loss exactly."""
    b, d, pad = 50, 8, 128
    arrs = [rng.standard_normal((b, d)).astype(np.float32) for _ in range(6)]
    unpadded = bpr_loss(*[jnp.asarray(a) for a in arrs])
    padded_arrs = [np.concatenate([a, np.ones((pad - b, d), np.float32)]) for a in arrs]
    mask = np.zeros(pad, bool)
    mask[:b] = True
    padded = bpr_loss(*[jnp.asarray(a) for a in padded_arrs], mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(padded), float(unpadded), rtol=1e-5)


def test_readout_standard_differs(tiny_data):
    n_u, n_i = tiny_data.num_users, tiny_data.num_items
    params = LightGCNParams(
        jnp.ones((n_u, 4)), jnp.ones((n_i, 4))
    )
    coo = DeviceCOO.from_host(COOGraph.build(tiny_data.edge_index, n_u + n_i))
    ref_u, _ = propagate(params, coo, spmm_segment, 2, readout="reference")
    std_u, _ = propagate(params, coo, spmm_segment, 2, readout="standard")
    np.testing.assert_allclose(np.asarray(std_u), np.asarray(ref_u) * 3.0, rtol=1e-5)


def test_sampled_recall_parity_in_expectation(rng):
    """SURVEY §4(b): recall oracle parity. Randomness sources differ (np vs
    jax PRNG), so compare expectations over several draws of the MC metric on
    identical embeddings — a planted structure gives a known separation."""
    import jax

    b, d = 400, 16
    # planted: users identical to their positive item => pos always ranked high
    pos = rng.standard_normal((b, d)).astype(np.float32)
    users = pos + 0.01 * rng.standard_normal((b, d)).astype(np.float32)
    neg = rng.standard_normal((b, d)).astype(np.float32)

    def torch_recall(k=50, num_samples=20, sample_size=100, seed=0):
        np_rng = np.random.default_rng(seed)
        pos_n = pos / np.linalg.norm(pos, axis=1, keepdims=True)
        neg_n = neg / np.linalg.norm(neg, axis=1, keepdims=True)
        items = np.concatenate([pos_n, neg_n])
        total = 0.0
        for _ in range(num_samples):
            idx = np_rng.choice(b, sample_size, replace=False)
            u = users[idx]
            u = u / np.linalg.norm(u, axis=1, keepdims=True)
            scores = u @ items.T
            topk = np.argsort(-scores, axis=1)[:, :k]
            hits = (topk < b).sum(axis=1)
            total += float(np.mean(hits / b))
        return total / num_samples

    from movie_recommender_system_with_gnns_tpu.ops.metrics import sampled_recall_at_k

    ours = float(sampled_recall_at_k(
        jax.random.PRNGKey(0), jnp.asarray(users), jnp.asarray(pos),
        jnp.asarray(neg), k=50, num_samples=20, sample_size=100))
    oracle = torch_recall()
    # same metric semantics => same expectation (both ≈ k_eff/b); allow MC noise
    assert abs(ours - oracle) / oracle < 0.15, (ours, oracle)
