"""Full-graph trainer: every step propagates over ALL train edges.

The reference's Cluster-GCN regime (data/dataset_handler.py:256-288) trades
edge coverage for tractability: at 100 parts only ~40% of ML-25M's edge mass
survives inside clusters, and the dropped inter-cluster edges never produce a
gradient. This trainer removes that compromise the TPU way:

  * propagation runs on the FULL training adjacency via the hybrid
    block-diagonal kernel (:func:`ops.spmm.spmm_hybrid`) — intra-cluster mass
    as dense (K, P, P) MXU blocks, the remainder on the sorted segment-sum
    gather path;
  * the backward pass reuses the same kernel through the symmetric-Â custom
    VJP (:func:`ops.spmm.spmm_symmetric`): Â = Âᵀ for the undirected
    GCN-normalized graph, so XLA's unsorted transpose-scatter never appears;
  * BPR triplets are minibatched: each epoch shuffles all train positives on
    device and scans ``num_steps`` static-shape batches in ONE compiled
    program (reference regime = 100 optimizer updates/epoch; here the step
    count is a knob, ``TrainConfig.fullgraph_steps``).

Semantics: identical loss math to :mod:`training.train` — same
``compute_loss`` (reference compute_embeddings + bpr_loss,
utils/train_test.py:18-134), same clip-1.0 + Adam (train_test.py:95,:236) —
but with 100% edge retention in every propagation.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..ops.sampling import (TripletBatch, sample_negative,
                            sample_negative_alias, sample_negative_feasible)
from ..ops.spmm import (HybridGraph, build_hybrid_graph, spmm_hybrid,
                        spmm_hybrid_sym)
from .train import (TrainState, compute_loss, compute_loss_grads_microbatched,
                    make_optimizer)


class FullGraphTrainData:
    """Device-resident full-graph training set: hybrid adjacency + all positives.

    ``user``/``pos_item`` are the user→item half of the train edge set, padded
    to ``num_steps * batch`` (padding is masked out of the loss). Everything —
    including the hybrid graph — is passed into the jitted epoch program as
    explicit arguments: the platform's remote-compile path serializes closure
    constants into the HLO payload, which a 25M-scale adjacency overflows.
    """

    def __init__(self, hybrid: HybridGraph, user: jax.Array, pos_item: jax.Array,
                 e_real: int, num_steps: int, batch: int,
                 symmetric_ok: bool = True, member_table=None,
                 alias_table=None):
        self.hybrid = hybrid
        self.user = user
        self.pos_item = pos_item
        self.e_real = e_real
        self.num_steps = num_steps
        self.batch = batch
        # False when the train adjacency failed the build-time symmetry check
        # (edge-level split) — the epoch fn then ignores cfg.train.symmetric_vjp
        self.symmetric_ok = symmetric_ok
        # sorted (2, L) int32 (user, item) pair table, present only when
        # cfg.train.negatives == "feasible" (exact negative sampling)
        self.member_table = member_table
        # (prob (N,), alias (N,)) Walker table, present only when
        # cfg.train.negatives == "popularity" (count^negatives_power law)
        self.alias_table = alias_table


def build_fullgraph_data(
    cfg: Config,
    train_edge_index: np.ndarray,
    num_users: int,
    num_nodes: int,
) -> FullGraphTrainData:
    """Host-side build: node partition → hybrid adjacency → padded positives."""
    from ..data.partition import forward_half, partition_assignments

    if cfg.train.partitioner != "greedy":
        import warnings

        warnings.warn(
            f"fullgraph trainer ignores partitioner={cfg.train.partitioner!r}: "
            "hybrid block-diagonal propagation always uses the greedy NODE "
            "partition (every edge is retained regardless)", stacklevel=2)
    num_parts = cfg.train.hybrid_parts or cfg.train.num_clusters
    uv = forward_half(train_edge_index, num_users)
    part_of_user, part_of_item = partition_assignments(
        train_edge_index, num_users, num_nodes, num_parts,
        seed=cfg.data.split_seed, balance_tol=cfg.train.partition_balance_tol,
        uv=uv,
    )
    node_part = np.concatenate([part_of_user, part_of_item])
    # dense Â blocks ride the MXU: bf16 operands are its native precision with
    # f32 accumulation (the same trade the compact trainer's dense blocks make)
    block_dtype = (jnp.float32 if cfg.train.hybrid_block_dtype == "float32"
                   else jnp.bfloat16)
    hybrid = build_hybrid_graph(
        train_edge_index, num_nodes, node_part, num_parts,
        block_dtype=block_dtype,
        max_block_nodes=cfg.train.dense_adjacency_max_nodes,
        off_format=cfg.train.hybrid_off_format,
        ell_width=cfg.train.hybrid_ell_width,
    )

    users = uv[0].astype(np.int32)
    pos = uv[1].astype(np.int32)
    e_real = int(users.shape[0])

    # The symmetric-Â custom VJP assumes Â = Âᵀ. The reference's edge-level
    # split (dataset_handler.py:167-168) permutes the direction-DOUBLED edge
    # list, so ~2·p·(1−p) of train pairs keep only one direction and the train
    # adjacency is NOT symmetric — the VJP's backward Â·g would then be wrong
    # for those edges. Verify symmetry at build time and fall back to the
    # autodiff hybrid kernel (exact for any adjacency) when it fails.
    symmetric_ok = True
    if cfg.train.symmetric_vjp:
        from ..data.graph import adjacency_is_symmetric

        symmetric_ok = adjacency_is_symmetric(train_edge_index, num_nodes)
        if not symmetric_ok:
            import warnings

            warnings.warn(
                "fullgraph trainer: train adjacency is asymmetric (edge-level "
                "split keeps single directions — config.py split_level docs); "
                "symmetric_vjp is DISABLED for this run, backward uses the "
                "autodiff hybrid kernel (exact, ~2x backward propagation "
                "cost). Use split_level='interaction' for a symmetric train "
                "graph.", stacklevel=2)

    # explicit batch_size wins over the steps knob; both paths lane-align the
    # static width, then RE-derive the step count from the aligned batch so no
    # scan step is all-padding (a zero-grad Adam step still moves params via
    # decaying moments, and each step pays a full-graph propagation)
    if cfg.train.batch_size:
        batch = int(cfg.train.batch_size)
    else:
        batch = -(-e_real // max(1, cfg.train.fullgraph_steps))
    batch_aligned = ((batch + 1023) // 1024) * 1024  # lane-aligned static width
    if cfg.train.batch_size and batch_aligned != batch:
        import warnings

        warnings.warn(
            f"fullgraph trainer: batch_size={batch} lane-aligned up to "
            f"{batch_aligned} (the static scan width must be a multiple of "
            "1024; batch_size overrides fullgraph_steps)", stacklevel=2)
    batch = batch_aligned
    num_steps = max(1, -(-e_real // batch))
    e_pad = num_steps * batch
    member_table = None
    alias_table = None
    if cfg.train.negatives == "popularity":
        from ..ops.sampling import build_alias_table, item_popularity

        counts = item_popularity(train_edge_index, num_users,
                                 num_nodes - num_users)
        prob, alias = build_alias_table(counts,
                                        power=cfg.train.negatives_power)
        alias_table = (jnp.asarray(prob), jnp.asarray(alias))
    elif cfg.train.negatives == "feasible":
        from ..ops.sampling import build_member_table

        # (2, L) int32 sorted pair table — int32-exact at any MovieLens scale
        # (a Cantor hash needs 35+ bits here and x64 is disabled on device)
        member_table = jnp.asarray(build_member_table(users, pos))
    elif cfg.train.negatives != "uniform":
        raise ValueError(f"unknown negatives law {cfg.train.negatives!r}")
    users = np.concatenate([users, np.zeros(e_pad - e_real, np.int32)])
    pos = np.concatenate([pos, np.zeros(e_pad - e_real, np.int32)])
    return FullGraphTrainData(
        hybrid=hybrid, user=jnp.asarray(users), pos_item=jnp.asarray(pos),
        e_real=e_real, num_steps=num_steps, batch=batch,
        symmetric_ok=symmetric_ok, member_table=member_table,
        alias_table=alias_table,
    )


def make_fullgraph_epoch_fn(cfg: Config, fg: FullGraphTrainData):
    """One compiled program per epoch: shuffle → scan(num_steps × train_step).

    Returned callable matches the driver's epoch signature
    ``epoch_fn(state, fg, key) -> (state, mean_loss)``.
    """
    opt = make_optimizer(cfg)
    cdtype = jnp.dtype(cfg.model.compute_dtype)
    if cdtype == jnp.float32:
        base = spmm_hybrid
    else:
        # cast the gather-source operand per layer (accumulations stay f32 —
        # ops/spmm.py): halves the HBM-bound per-edge/block gather traffic,
        # the trade cfg.model.compute_dtype="bfloat16" opts into. The
        # symmetric wrapper then applies the same rounding to cotangents.
        def base(g, e):
            return spmm_hybrid(g, e.astype(cdtype))
    if cfg.train.symmetric_vjp and fg.symmetric_ok:
        from ..ops.spmm import spmm_symmetric

        spmm = spmm_symmetric(base) if cdtype != jnp.float32 else spmm_hybrid_sym
    else:
        spmm = base

    @partial(jax.jit, donate_argnums=(0,),
             static_argnames=("e_real", "num_steps", "batch"))
    def epoch_inner(state: TrainState, hybrid: HybridGraph, user: jax.Array,
                    pos_item: jax.Array, key: jax.Array,
                    member_table=None, alias_table=None, *,
                    e_real: int, num_steps: int, batch: int
                    ) -> Tuple[TrainState, jax.Array]:
        pkey, skey = jax.random.split(key)
        # shuffle real positives; padding stays at the tail (masked)
        perm = jax.random.permutation(pkey, e_real).astype(jnp.int32)
        idx = jnp.concatenate(
            [perm, jnp.arange(e_real, num_steps * batch, dtype=jnp.int32)])
        u = user[idx].reshape(num_steps, batch)
        p = pos_item[idx].reshape(num_steps, batch)
        m = (idx < e_real).reshape(num_steps, batch)
        keys = jax.random.split(skey, num_steps)

        def body(st: TrainState, x):
            uu, pp, mm, k = x
            if member_table is not None:
                neg = sample_negative_feasible(
                    k, uu, st.params.item_emb.shape[0], member_table,
                    num=cfg.train.num_negatives)
            elif alias_table is not None:
                neg = sample_negative_alias(
                    k, batch, st.params.item_emb.shape[0], alias_table[0],
                    alias_table[1], num=cfg.train.num_negatives)
            else:
                neg = sample_negative(k, batch, st.params.item_emb.shape[0],
                                      cfg.train.num_negatives)
            tb = TripletBatch(user=uu, pos_item=pp, mask=mm)
            if cfg.train.loss_microbatches > 1:
                loss, grads = compute_loss_grads_microbatched(
                    st.params, hybrid, tb, neg, cfg, spmm,
                    cfg.train.loss_microbatches)
            else:
                loss, grads = jax.value_and_grad(compute_loss)(
                    st.params, hybrid, tb, neg, cfg, spmm)
            updates, opt_state = opt.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            new = TrainState(params, opt_state, st.step + 1)
            return new, loss * mm.sum()

        st, wlosses = jax.lax.scan(body, state, (u, p, m, keys))
        return st, jnp.sum(wlosses) / e_real

    def epoch_fn(state: TrainState, fg_: FullGraphTrainData, key: jax.Array):
        # shape constants come from the ARGUMENT (static jit args, not closure
        # state): calling with a differently-shaped FullGraphTrainData retraces
        # correctly instead of silently misindexing
        return epoch_inner(state, fg_.hybrid, fg_.user, fg_.pos_item, key,
                           fg_.member_table, fg_.alias_table,
                           e_real=fg_.e_real, num_steps=fg_.num_steps,
                           batch=fg_.batch)

    return epoch_fn
