"""Training engine: jitted train step, cluster-epoch loop, evaluation, driver.

Capability parity with reference ``utils/train_test.py`` redesigned TPU-first:

  * one pure jitted ``train_step(state, graph, batch, key)`` replacing the
    eager per-cluster loop body (train_test.py:86-101): propagation + triplet
    gather + negative sampling + BPR + global-norm clip (max 1.0,
    train_test.py:95) + Adam (train_test.py:236) all fuse into one XLA program.
  * cluster batches are padded to shared static shapes, so the whole epoch runs
    a handful of compiled programs (no per-shape recompiles).
  * evaluation (train_test.py:136-163) propagates on the *eval* edge set — the
    reference's semantics: ``model(val_data.edge_index)`` — and computes both
    the parity sampled-recall metric and standard Recall@k/NDCG@k.
  * the multi-epoch driver (train_test.py:214-256) keeps histories, saves the
    best checkpoint on val-recall improvement, and runs a final test eval.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models.lightgcn import LightGCNParams, init_params, propagate
from ..ops.bpr import bpr_loss, select_bpr_loss
from ..ops.metrics import sampled_recall_at_k
from ..ops.sampling import TripletBatch, sample_negative, triplets_from_edges
from ..ops.spmm import DeviceCOO, spmm_segment
from ..data.graph import COOGraph


class TrainState(NamedTuple):
    params: LightGCNParams
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """clip-by-global-norm(1.0) → Adam, matching train_test.py:95,:236.

    ``lr_schedule="cosine"`` swaps the reference's fixed lr for linear warmup
    + cosine decay (see TrainConfig). Note the optimizer-state pytree gains a
    schedule-count leaf under "cosine", so full train-state checkpoints are
    only resumable under the same schedule setting.
    """
    tc = cfg.train
    if tc.lr_schedule == "constant":
        lr = tc.lr
    elif tc.lr_schedule == "cosine":
        if tc.lr_total_steps <= 0:
            raise ValueError(
                "lr_schedule='cosine' needs lr_total_steps > 0 "
                "(set it to steps_per_epoch * epochs)")
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if tc.lr_warmup_steps > 0 else tc.lr,
            peak_value=tc.lr, warmup_steps=tc.lr_warmup_steps,
            decay_steps=tc.lr_total_steps,
            end_value=tc.lr * tc.lr_final_frac)
    else:
        raise ValueError(f"unknown lr_schedule {tc.lr_schedule!r}")
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip_norm),
        optax.adam(lr, b1=tc.adam_b1, b2=tc.adam_b2, eps=tc.adam_eps),
    )


def create_train_state(cfg: Config, num_users: int, num_items: int,
                       key: Optional[jax.Array] = None) -> TrainState:
    if key is None:
        key = jax.random.PRNGKey(cfg.train.seed)
    params = init_params(key, num_users, num_items, cfg.model.dim, cfg.model.init_std)
    opt = make_optimizer(cfg)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def compute_embeddings(
    params: LightGCNParams,
    graph: DeviceCOO,
    batch: TripletBatch,
    neg_item: jax.Array,
    cfg: Config,
    spmm: Callable = spmm_segment,
):
    """(final_user, initial_user, final_pos, initial_pos, final_neg,
    initial_neg) — the reference's ``compute_embeddings`` 6-tuple contract
    (train_test.py:105-134), as a pure function."""
    users_final, items_final = propagate(
        params, graph, spmm, cfg.model.num_layers, cfg.model.readout,
    )
    # gather (final ‖ initial) per index set in ONE row op: TPU gather cost is
    # per-row and width-independent to 128 lanes (see training/compact.py)
    d = params.user_emb.shape[1]
    u_cat = jnp.concatenate([users_final, params.user_emb], axis=1)[batch.user]
    i_cat = jnp.concatenate([items_final, params.item_emb], axis=1)
    p_cat = i_cat[batch.pos_item]
    n_cat = i_cat[neg_item]          # (B, 2d) or (B, K, 2d) for multi-negative
    return (
        u_cat[:, :d], u_cat[:, d:],
        p_cat[:, :d], p_cat[:, d:],
        n_cat[..., :d], n_cat[..., d:],
    )


def compute_loss(
    params: LightGCNParams,
    graph: DeviceCOO,
    batch: TripletBatch,
    neg_item: jax.Array,
    cfg: Config,
    spmm: Callable = spmm_segment,
) -> jax.Array:
    """Propagate on the batch graph and evaluate the reference BPR loss on the
    (user, pos, neg) triplets — ``compute_embeddings`` + ``bpr_loss``
    (train_test.py:105-134, :18-51) in one pure function."""
    embs = compute_embeddings(params, graph, batch, neg_item, cfg, spmm)
    loss_fn = select_bpr_loss(cfg.train.loss)
    return loss_fn(*embs, cfg.train.bpr_coeff, mask=batch.mask)


def compute_loss_grads_microbatched(
    params: LightGCNParams,
    graph,
    batch: TripletBatch,
    neg_item: jax.Array,
    cfg: Config,
    spmm: Callable,
    num_micro: int,
):
    """(loss, grads) of :func:`compute_loss`, with the triplet loss evaluated
    in ``num_micro`` scanned microbatches over ONE propagation.

    Exact (up to fp reassociation): the reference loss is a masked mean, and a
    mask-count-weighted average of per-chunk masked means equals the global
    masked mean — Σ_c w_c·(S_c/w_c) / Σ_c w_c = ΣS/Σw — for both the pairwise
    and the reg term (each chunk's denominator scales linearly in w_c). The
    propagation (the reference hot kernel, light_gcn.py:33) runs once; its
    backward runs once on the accumulated table cotangents via ``jax.vjp``.
    Peak memory: one chunk's (B/num_micro, K, d) triplet temps + four (N, d)
    cotangent accumulators, vs the full-batch (B, K, d) temps that OOM one
    chip at d=512, K=8, B=349K.
    """
    b = batch.user.shape[0]
    if b % num_micro:
        raise ValueError(f"loss_microbatches={num_micro} must divide the "
                         f"padded batch {b}")
    loss_fn = select_bpr_loss(cfg.train.loss)
    coeff = cfg.train.bpr_coeff

    def fwd(p):
        return propagate(p, graph, spmm, cfg.model.num_layers,
                         cfg.model.readout)

    (users_final, items_final), vjp_fn = jax.vjp(fwd, params)
    total_w = jnp.maximum(batch.mask.sum().astype(jnp.float32), 1.0)

    bc = b // num_micro
    uu = batch.user.reshape(num_micro, bc)
    pp = batch.pos_item.reshape(num_micro, bc)
    mm = batch.mask.reshape(num_micro, bc)
    nn = neg_item.reshape((num_micro, bc) + neg_item.shape[1:])

    def chunk_loss(uf, itf, ue, ie, u_c, p_c, n_c, m_c):
        # direct per-table gathers (no (N, 2d) concat temp per chunk); the
        # backward scatter-adds land straight in the (N, d) accumulators
        l = loss_fn(uf[u_c], ue[u_c], itf[p_c], ie[p_c], itf[n_c], ie[n_c],
                    coeff, mask=m_c)
        w = m_c.sum().astype(jnp.float32)
        return l * w / total_w, (l, w)

    grad_chunk = jax.value_and_grad(chunk_loss, argnums=(0, 1, 2, 3),
                                    has_aux=True)

    def body(carry, x):
        guf, gitf, gue, gie, lsum = carry
        (_, (l, w)), gs = grad_chunk(users_final, items_final,
                                     params.user_emb, params.item_emb, *x)
        return (guf + gs[0], gitf + gs[1], gue + gs[2], gie + gs[3],
                lsum + l * w), None

    init = (jnp.zeros_like(users_final), jnp.zeros_like(items_final),
            jnp.zeros_like(params.user_emb), jnp.zeros_like(params.item_emb),
            jnp.zeros((), jnp.float32))
    (guf, gitf, gue, gie, lsum), _ = jax.lax.scan(body, init, (uu, pp, nn, mm))
    loss = lsum / total_w
    (gprop,) = vjp_fn((guf, gitf))
    grads = LightGCNParams(user_emb=gprop.user_emb + gue,
                           item_emb=gprop.item_emb + gie)
    return loss, grads


def make_train_step(cfg: Config, spmm: Callable = spmm_segment):
    """Build the jitted train step. ``graph``/``batch`` arrive as device arrays
    with static shapes; ``num_items`` is closed over via params shape."""
    opt = make_optimizer(cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, graph: DeviceCOO, batch: TripletBatch,
                   key: jax.Array) -> Tuple[TrainState, jax.Array]:
        num_items = state.params.item_emb.shape[0]
        neg = sample_negative(key, batch.user.shape[0], num_items,
                              cfg.train.num_negatives)
        loss, grads = jax.value_and_grad(compute_loss)(
            state.params, graph, batch, neg, cfg, spmm
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


# ---------------------------------------------------------------------------
# Epoch loop over cluster batches (reference train(), train_test.py:66-103)
# ---------------------------------------------------------------------------


class ClusterBatch(NamedTuple):
    """One padded training subgraph: device graph + its positive pairs."""

    graph: DeviceCOO
    batch: TripletBatch
    num_edges: int          # true (unpadded) edge count — the loss weight w
                            # (train_test.py:98-101)


def train_epoch(
    state: TrainState,
    clusters: List[ClusterBatch],
    train_step,
    key: jax.Array,
    shuffle: bool = True,
) -> Tuple[TrainState, float]:
    """One epoch over shuffled cluster batches; returns edge-weighted mean loss
    (train_test.py:98-103)."""
    order = np.arange(len(clusters))
    if shuffle:
        skey, key = jax.random.split(key)
        order = np.asarray(jax.random.permutation(skey, len(clusters)))
    # pre-split step keys once; keep losses on device until the epoch ends so
    # the hot loop never blocks on a host sync
    keys = jax.random.split(key, len(order))
    losses = []
    total_w = 0
    for j, i in enumerate(order):
        cb = clusters[int(i)]
        state, loss = train_step(state, cb.graph, cb.batch, keys[j])
        losses.append(loss * cb.num_edges)
        total_w += cb.num_edges
    total = jnp.sum(jnp.stack(losses)) if losses else jnp.zeros(())
    return state, float(total) / max(total_w, 1)


# ---------------------------------------------------------------------------
# Whole-epoch fused trainer: lax.scan over stacked cluster batches
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class StackedClusters:
    """Every cluster batch stacked on a leading axis (all share one padded
    shape): one ``lax.scan`` consumes the whole epoch in a single XLA program,
    eliminating the per-cluster dispatch overhead of the reference's eager
    loop (train_test.py:86) — ~10-25 ms/step on this platform's tunnel."""

    def __init__(self, src, dst, w, user, pos_item, mask, edge_counts, num_nodes):
        self.src, self.dst, self.w = src, dst, w
        self.user, self.pos_item, self.mask = user, pos_item, mask
        self.edge_counts = edge_counts          # (K,) f32 true edge counts
        self.num_nodes = num_nodes              # static

    def tree_flatten(self):
        return ((self.src, self.dst, self.w, self.user, self.pos_item,
                 self.mask, self.edge_counts), self.num_nodes)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, num_nodes=aux)

    @property
    def num_clusters(self) -> int:
        return int(self.src.shape[0])

    @staticmethod
    def from_batches(clusters: List[ClusterBatch]) -> "StackedClusters":
        shapes = {(c.graph.src.shape, c.batch.user.shape) for c in clusters}
        if len(shapes) != 1:
            raise ValueError(f"clusters must share one padded shape, got {shapes}")
        stk = lambda xs: jnp.stack(xs)
        return StackedClusters(
            src=stk([c.graph.src for c in clusters]),
            dst=stk([c.graph.dst for c in clusters]),
            w=stk([c.graph.w for c in clusters]),
            user=stk([c.batch.user for c in clusters]),
            pos_item=stk([c.batch.pos_item for c in clusters]),
            mask=stk([c.batch.mask for c in clusters]),
            edge_counts=jnp.asarray([float(c.num_edges) for c in clusters]),
            num_nodes=clusters[0].graph.num_nodes,
        )


def make_epoch_fn(cfg: Config, spmm: Callable = spmm_segment):
    """Build ``epoch_fn(state, stacked, key) -> (state, mean_loss)``: shuffled
    pass over all clusters fused into one compiled program."""
    opt = make_optimizer(cfg)

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, stacked: StackedClusters, key: jax.Array):
        num_items = state.params.item_emb.shape[0]
        k = stacked.src.shape[0]
        perm_key, neg_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, k)
        keys = jax.random.split(neg_key, k)

        xs = (
            stacked.src[perm], stacked.dst[perm], stacked.w[perm],
            stacked.user[perm], stacked.pos_item[perm], stacked.mask[perm],
            stacked.edge_counts[perm], keys,
        )

        def body(carry, x):
            st = carry
            src, dst, w, user, pos, mask, ecount, nk = x
            graph = DeviceCOO(src, dst, w, num_nodes=stacked.num_nodes)
            batch = TripletBatch(user, pos, mask)
            neg = sample_negative(nk, user.shape[0], num_items,
                                  cfg.train.num_negatives)
            loss, grads = jax.value_and_grad(compute_loss)(
                st.params, graph, batch, neg, cfg, spmm)
            updates, opt_state = opt.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(params, opt_state, st.step + 1), loss * ecount

        state, wlosses = jax.lax.scan(body, state, xs)
        mean_loss = jnp.sum(wlosses) / jnp.maximum(jnp.sum(stacked.edge_counts), 1.0)
        return state, mean_loss

    return epoch_fn


# ---------------------------------------------------------------------------
# Evaluation (reference evaluate(), train_test.py:136-163)
# ---------------------------------------------------------------------------


def make_eval_step(cfg: Config, spmm: Callable = spmm_segment):
    @jax.jit
    def eval_step(params: LightGCNParams, graph: DeviceCOO, batch: TripletBatch,
                  key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        num_items = params.item_emb.shape[0]
        nkey, rkey = jax.random.split(key)
        neg = sample_negative(nkey, batch.user.shape[0], num_items)
        loss = compute_loss(params, graph, batch, neg, cfg, spmm)
        # parity recall on initial embeddings (train_test.py:157-159)
        recall = sampled_recall_at_k(
            rkey,
            params.user_emb[batch.user],
            params.item_emb[batch.pos_item],
            params.item_emb[neg],
            k=cfg.train.eval_top_k,
            num_samples=cfg.train.recall_num_samples,
            sample_size=cfg.train.recall_sample_size,
        )
        return loss, recall

    return eval_step


def build_eval_batch(edge_index: np.ndarray, num_nodes: int, num_users: int
                     ) -> Tuple[DeviceCOO, TripletBatch]:
    """Eval graphs propagate over their own edge set (train_test.py:150-153)."""
    g = DeviceCOO.from_host(COOGraph.build(edge_index, num_nodes))
    b = triplets_from_edges(edge_index, num_users)
    return g, b


# ---------------------------------------------------------------------------
# Multi-epoch driver (reference train_model(), train_test.py:214-256)
# ---------------------------------------------------------------------------


def _callback_takes_state(cb: Callable) -> bool:
    """True if ``cb`` can accept a third positional arg (the live TrainState).

    Keeps the ``(epoch, metrics)`` callback contract intact: metrics stays a
    pure Dict[str, float]; callers that want mid-run state opt in by declaring
    a third parameter.
    """
    import inspect

    try:
        params = list(inspect.signature(cb).parameters.values())
    except (TypeError, ValueError):
        return False
    positional = [p for p in params
                  if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
    has_varargs = any(p.kind == p.VAR_POSITIONAL for p in params)
    return has_varargs or len(positional) >= 3


def train_model(
    cfg: Config,
    state: TrainState,
    clusters: List[ClusterBatch],
    val: Tuple[DeviceCOO, TripletBatch],
    test: Tuple[DeviceCOO, TripletBatch],
    spmm: Callable = spmm_segment,
    on_epoch_end: Optional[Callable] = None,  # (epoch, metrics[, state]) -> None
    save_checkpoint: Optional[Callable[[TrainState, float], None]] = None,
    metrics_logger=None,
    start_epoch: int = 0,
    best_recall: float = 0.0,
) -> Tuple[TrainState, Dict[str, List[float]]]:
    """``start_epoch``/``best_recall`` support mid-run resume (training/
    recovery.py): the per-epoch PRNG splits are fast-forwarded so a resumed
    run consumes exactly the keys the uninterrupted run would have — combined
    with the bit-exact full-state checkpoint this makes recovery reproduce
    the uninterrupted run bit for bit (tests/test_recovery.py)."""
    eval_step = make_eval_step(cfg, spmm)
    key = jax.random.PRNGKey(cfg.train.seed + 1)
    for _ in range(start_epoch):
        key, _, _ = jax.random.split(key, 3)

    # trainer selection:
    #  - CompactClusters  → fused compact-space epoch scan (training/compact.py)
    #  - list of batches sharing one padded shape → fused full-space epoch scan
    #  - otherwise → eager per-cluster loop
    from .compact import CompactClusters, make_compact_epoch_fn
    from .fullgraph import FullGraphTrainData, make_fullgraph_epoch_fn

    stacked = None
    epoch_fn = None
    train_step = None
    if isinstance(clusters, FullGraphTrainData):
        stacked = clusters
        epoch_fn = make_fullgraph_epoch_fn(cfg, clusters)
    elif isinstance(clusters, CompactClusters):
        stacked = clusters
        epoch_fn = make_compact_epoch_fn(cfg)
        if cfg.train.optimizer in ("lazy_adam", "hybrid_adam", "lazy_item_adam"):
            from .compact import LazyAdamState, init_lazy_adam

            if not isinstance(state.opt_state, LazyAdamState):
                state = TrainState(state.params, init_lazy_adam(state.params),
                                   state.step)
    else:
        try:
            stacked = StackedClusters.from_batches(clusters)
            epoch_fn = make_epoch_fn(cfg, spmm)
        except ValueError:
            train_step = make_train_step(cfg, spmm)

    hist: Dict[str, List[float]] = {"train_loss": [], "val_loss": [], "val_recall": [],
                                    "epoch_time_s": []}
    for epoch in range(start_epoch, cfg.train.epochs):
        key, ek, vk = jax.random.split(key, 3)
        t0 = time.perf_counter()
        if stacked is not None:
            state, train_loss = epoch_fn(state, stacked, ek)
            train_loss = float(train_loss)
        else:
            state, train_loss = train_epoch(state, clusters, train_step, ek)
        val_loss, val_recall = eval_step(state.params, val[0], val[1], vk)
        val_loss, val_recall = float(val_loss), float(val_recall)
        dt = time.perf_counter() - t0
        hist["train_loss"].append(train_loss)
        hist["val_loss"].append(val_loss)
        hist["val_recall"].append(val_recall)
        hist["epoch_time_s"].append(dt)
        print(
            f"Epoch: {epoch:03d}, Train Loss: {train_loss:.4f}, "
            f"Val Loss: {val_loss:.4f}, Recall@k: {val_recall:.6f}, "
            f"k={cfg.train.eval_top_k} ({dt:.2f}s)"
        )
        if metrics_logger is not None:
            metrics_logger.log(epoch, train_loss=train_loss, val_loss=val_loss,
                               val_recall=val_recall, epoch_time_s=dt)
        if (cfg.train.state_checkpoint_path
                and cfg.train.state_checkpoint_every > 0
                and (epoch + 1) % cfg.train.state_checkpoint_every == 0):
            from .checkpoint import save_train_state

            save_train_state(cfg.train.state_checkpoint_path, state,
                             meta={"epoch": epoch})
        if val_recall > best_recall:
            best_recall = val_recall
            if save_checkpoint is not None:
                save_checkpoint(state, val_recall)
        if on_epoch_end is not None:
            m = {k: v[-1] for k, v in hist.items()}
            if _callback_takes_state(on_epoch_end):
                on_epoch_end(epoch, m, state)  # live state for mid-run eval
            else:
                on_epoch_end(epoch, m)

    key, tk = jax.random.split(key)
    test_loss, test_recall = eval_step(state.params, test[0], test[1], tk)
    print(f"Test Loss: {float(test_loss):.4f}, Recall@k: {float(test_recall):.6f}, "
          f"k={cfg.train.eval_top_k}")
    hist["test_loss"] = [float(test_loss)]
    hist["test_recall"] = [float(test_recall)]
    return state, hist


def save_histories(hist: Dict[str, List[float]], histories_dir: str) -> None:
    """Persist training curves as .npy, mirroring train_test.py:289-291."""
    os.makedirs(histories_dir, exist_ok=True)
    np.save(os.path.join(histories_dir, "hist_train_loss.npy"), np.asarray(hist["train_loss"]))
    np.save(os.path.join(histories_dir, "hist_val_loss.npy"), np.asarray(hist["val_loss"]))
    np.save(os.path.join(histories_dir, "hist_val_recall.npy"), np.asarray(hist["val_recall"]))
