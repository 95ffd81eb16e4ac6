"""Bridge recipe: fast compact-cluster epochs + periodic full-graph refresh.

VERDICT r2 item 3: the compact trainer is fast (~0.15-0.3 s/epoch at ML-25M
scale) but plateaus near recall@10 ≈ 0.10 — the Cluster-GCN partition drops
~60% of the edge mass, so inter-cluster signal never produces a gradient
(reference data/dataset_handler.py:256-288 has the same compromise). The
full-graph trainer fixes quality (0.29 leakage-free recall@10 at d=256) but
costs ~16 s/epoch. This driver interleaves them: mostly compact epochs, with
one full-graph epoch every ``--refresh-every`` epochs injecting the dropped
inter-cluster gradients. One optax Adam state is shared by both epoch fns
(identical pytrees), so moments carry across the switch.

Usage:
  python examples/train_bridge.py --epochs 60 --refresh-every 5 \
      --dim 128 --split interaction --loss standard --out runs/bridge
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movie_recommender_system_with_gnns_tpu.utils.compilation_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax
import numpy as np

from movie_recommender_system_with_gnns_tpu.config import (
    Config, DataConfig, ModelConfig, TrainConfig,
)
from movie_recommender_system_with_gnns_tpu.data.movielens import split_edges
from movie_recommender_system_with_gnns_tpu.training.checkpoint import save_params
from movie_recommender_system_with_gnns_tpu.training.compact import (
    attach_member_table, build_compact_clusters, densify_adjacency,
    make_compact_epoch_fn,
)
from movie_recommender_system_with_gnns_tpu.training.evaluate import (
    evaluate_full_ranking,
)
from movie_recommender_system_with_gnns_tpu.training.fullgraph import (
    build_fullgraph_data, make_fullgraph_epoch_fn,
)
from movie_recommender_system_with_gnns_tpu.training.pipeline import (
    prepare_training_data,
)
from movie_recommender_system_with_gnns_tpu.training.train import create_train_state
from movie_recommender_system_with_gnns_tpu.utils.observability import MetricsLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--refresh-every", type=int, default=5,
                    help="every Nth epoch is a full-graph epoch (0 = never)")
    ap.add_argument("--out", default="runs/bridge")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--num-negatives", type=int, default=8)
    ap.add_argument("--loss", default="standard", choices=["reference", "standard"])
    ap.add_argument("--split", default="interaction", choices=["edge", "interaction"])
    ap.add_argument("--negatives", default="uniform", choices=["uniform", "feasible", "popularity"])
    ap.add_argument("--fullgraph-steps", type=int, default=16)
    ap.add_argument("--compact-lr-scale", type=float, default=1.0,
                    help="lr multiplier for compact epochs only. Cluster "
                    "gradients are biased (39%% edge retention drops every "
                    "inter-cluster message/negative): at full lr the 100 "
                    "biased updates/epoch overfit intra-cluster structure "
                    "faster than the 16 unbiased full-graph updates per "
                    "refresh can correct (measured collapse 0.23->0.11 over "
                    "epochs 19-59, runs/bridge_d128_r5_naive_collapse.log); "
                    "shrinking only the biased steps bounds that drift")
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"],
                    help="cosine decays over the WHOLE recipe (compact + "
                    "fullgraph steps share one Adam/schedule state), which "
                    "bounds the biased-compact-gradient drift the same way "
                    "it closed the fullgraph runs' best-vs-final gap")
    ap.add_argument("--lr-warmup-epochs", type=float, default=0.0)
    ap.add_argument("--correction", default="boundary",
                    choices=["none", "boundary"],
                    help="'boundary' rebuilds the frozen inter-cluster "
                    "correction (training/compact.py::"
                    "build_boundary_correction) at every full-graph refresh "
                    "so compact gradients are evaluated at the true forward "
                    "point; 'none' keeps raw Cluster-GCN semantics (the r8 "
                    "recipe, which converged below its own best-val)")
    ap.add_argument("--compact-optimizer", default="adam",
                    choices=["adam", "hybrid_adam", "lazy_item_adam"],
                    help="optimizer for the COMPACT epochs. hybrid_adam / "
                    "lazy_item_adam are the fused fast paths (training/"
                    "compact.py); the shared Adam moments convert losslessly "
                    "at each trainer switch (lazy_state_from_optax/"
                    "_to_optax) so the recipe still advances one schedule")
    ap.add_argument("--eval-propagated", type=int, default=1,
                    help="1 = rank with K-layer propagated tables (protocol-"
                    "consistent: loss='standard' optimizes propagated inner "
                    "products, and it is the LightGCN-paper serving protocol "
                    "— measured +0.014 test recall@10 over layer-0 at the "
                    "d=128 bridge point); 0 = raw layer-0 tables (the "
                    "reference's serving contract)")
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--eval-users", type=int, default=5000)
    ap.add_argument("--final-eval-users", type=int, default=0,
                    help="user count for the final test eval (0 = ALL users)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--users", type=int, default=162_541)
    ap.add_argument("--items", type=int, default=59_047)
    ap.add_argument("--interactions", type=int, default=18_000_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    print("argv:", " ".join(sys.argv[1:]))

    base_train = dict(
        num_clusters=100, loss=args.loss,
        num_negatives=args.num_negatives, negatives=args.negatives,
        fullgraph_steps=args.fullgraph_steps, seed=args.seed,
        partition_balance_tol=1.1, fused_bpr=(args.loss == "reference"),
    )
    cfg_c = Config(
        data=DataConfig(dataset="synthetic",
                        synthetic_users=args.users, synthetic_items=args.items,
                        synthetic_interactions=args.interactions,
                        synthetic_communities=200, synthetic_power=0.9,
                        split_level=args.split,
                        indexes_dir=os.path.join(args.out, "indexes")),
        model=ModelConfig(num_layers=args.layers, dim=args.dim),
        train=TrainConfig(trainer="compact", epochs=args.epochs,
                          lr=args.lr * args.compact_lr_scale,
                          optimizer=args.compact_optimizer, **base_train),
    )
    cfg_f = cfg_c.replace(train=TrainConfig(trainer="fullgraph",
                                            epochs=args.epochs, lr=args.lr,
                                            **base_train))

    print(f"devices: {jax.devices()}")
    t0 = time.time()
    bundle = prepare_training_data(cfg_c)
    data, cc, val, test = bundle
    train_e, val_e, test_e = bundle.splits
    print(f"data ready in {time.time()-t0:.0f}s: {data.num_users} users, "
          f"{data.edge_index.shape[1]} edges (train {train_e.shape[1]})")

    t0 = time.time()
    fg = build_fullgraph_data(cfg_f, train_e, data.num_users,
                              data.num_users + data.num_items)
    print(f"fullgraph data built in {time.time()-t0:.0f}s "
          f"({fg.num_steps} steps x {fg.batch})")

    if args.lr_schedule == "cosine":
        from dataclasses import replace

        nf = (sum(1 for e in range(args.epochs)
                  if (e + 1) % args.refresh_every == 0)
              if args.refresh_every > 0 else 0)
        nc = args.epochs - nf
        total_steps = nc * cfg_c.train.num_clusters + nf * fg.num_steps
        warm = int(args.lr_warmup_epochs * cfg_c.train.num_clusters)
        # ONE decay horizon across both trainers: the shared Adam state's
        # step count advances by 100 per compact epoch and fg.num_steps per
        # refresh, so each epoch fn reads the same schedule position
        cfg_c = cfg_c.replace(train=replace(
            cfg_c.train, lr_schedule="cosine", lr_total_steps=total_steps,
            lr_warmup_steps=warm))
        cfg_f = cfg_f.replace(train=replace(
            cfg_f.train, lr_schedule="cosine", lr_total_steps=total_steps,
            lr_warmup_steps=warm))
        print(f"cosine lr: {total_steps} total steps ({nc} compact + {nf} "
              f"fullgraph epochs), {warm} warmup")

    compact_epoch = make_compact_epoch_fn(cfg_c)
    fullgraph_epoch = make_fullgraph_epoch_fn(cfg_f, fg)

    state = create_train_state(cfg_c, data.num_users, data.num_items)

    # fused compact fast paths keep Adam moments in LazyAdamState form; the
    # fullgraph refresh runs on the optax chain — convert losslessly at each
    # switch (same update law, same schedule position)
    optax_template = None
    if args.compact_optimizer != "adam":
        from movie_recommender_system_with_gnns_tpu.training.compact import (
            lazy_state_from_optax, lazy_state_to_optax,
        )
        from movie_recommender_system_with_gnns_tpu.training.train import (
            TrainState, make_optimizer,
        )

        # eval_shape: the template only contributes STRUCTURE (node types +
        # count dtype) — every array leaf is replaced at conversion time, so
        # no zero-moment buffers are held alive across the run
        optax_template = jax.eval_shape(make_optimizer(cfg_f).init,
                                        state.params)
        from movie_recommender_system_with_gnns_tpu.training.compact import (
            init_lazy_adam,
        )

        state = TrainState(state.params, init_lazy_adam(state.params),
                           state.step)

    if args.correction == "boundary":
        from movie_recommender_system_with_gnns_tpu.training.compact import (
            build_boundary_correction,
        )

        def refresh_corr(cc_, params):
            t = time.time()
            corr, neg_rest = build_boundary_correction(
                params, fg.hybrid, cc_, cfg_c, data.num_users)
            corr.block_until_ready()
            return cc_.with_correction(corr, neg_rest), time.time() - t

        cc, dt_corr = refresh_corr(cc, state.params)
        print(f"boundary correction built in {dt_corr:.2f}s "
              f"(corr {tuple(cc.corr.shape)}, neg_rest {tuple(cc.neg_rest.shape)})")
    else:
        refresh_corr = None
    logger = MetricsLogger(os.path.join(args.out, "metrics.jsonl"))
    eval_normalize = args.loss != "standard"
    best = {"r": -1.0, "epoch": -1}
    key = jax.random.PRNGKey(args.seed + 1)

    t_compact = []
    t_full = []
    for epoch in range(args.epochs):
        key, ek = jax.random.split(key)
        is_refresh = (args.refresh_every > 0
                      and (epoch + 1) % args.refresh_every == 0)
        t0 = time.time()
        if is_refresh:
            if optax_template is not None:
                fst = TrainState(state.params,
                                 lazy_state_to_optax(state.opt_state,
                                                     optax_template),
                                 state.step)
                fst, loss = fullgraph_epoch(fst, fg, ek)
                state = type(state)(fst.params,
                                    lazy_state_from_optax(fst.opt_state),
                                    fst.step)
            else:
                state, loss = fullgraph_epoch(state, fg, ek)
            if refresh_corr is not None:
                # correction staleness resets here: rebuild from the freshly
                # refreshed tables (cost counted inside the refresh epoch)
                loss = float(loss)
                cc, _ = refresh_corr(cc, state.params)
        else:
            state, loss = compact_epoch(state, cc, ek)
        loss = float(loss)
        dt = time.time() - t0
        (t_full if is_refresh else t_compact).append(dt)
        kind = "FULL" if is_refresh else "comp"
        print(f"Epoch {epoch:03d} [{kind}] loss {loss:.4f} ({dt:.2f}s)")
        logger.log(epoch, train_loss=loss, epoch_time_s=dt,
                   kind=1.0 if is_refresh else 0.0)
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            # in-run evals ride the bf16 score lane (VERDICT r4 item 2); the
            # final test eval below keeps f32 oracle parity
            r, n = evaluate_full_ranking(state.params, train_e, val_e,
                                         data.num_users, k=10,
                                         max_users=args.eval_users,
                                         use_propagated=bool(args.eval_propagated),
                                         normalize=eval_normalize, cfg=cfg_c,
                                         score_dtype="bfloat16")
            et = evaluate_full_ranking.last_timings
            print(f"  full-ranking val Recall@10 {r:.4f} NDCG@10 {n:.4f} "
                  f"(eval {et['total_s']:.2f}s, mask {et['mask_build_s']:.2f}s"
                  f"{', cached' if et.get('groupby_cached') else ''})")
            logger.log(epoch, val_full_recall10=r, val_full_ndcg10=n,
                       eval_total_s=et["total_s"],
                       eval_mask_build_s=et["mask_build_s"])
            if r > best["r"]:
                best.update(r=r, epoch=epoch)
                save_params(os.path.join(args.out, "best_fullrank.npz"),
                            state.params,
                            meta={"val_full_recall10": r, "epoch": epoch})

    # amortized epoch cost of the recipe (what the Pareto row quotes)
    n_c, n_f = len(t_compact), len(t_full)
    # drop each kind's first epoch (compile) from the steady-state average
    sc = float(np.mean(t_compact[1:])) if n_c > 1 else float(np.mean(t_compact or [0]))
    sf = float(np.mean(t_full[1:])) if n_f > 1 else float(np.mean(t_full or [0]))
    amort = (sc * n_c + sf * n_f) / max(n_c + n_f, 1)
    print(f"steady-state: compact {sc:.2f}s x{n_c}, fullgraph {sf:.2f}s x{n_f} "
          f"-> amortized {amort:.2f}s/epoch")

    # test metric at the best-val checkpoint — at FULL user count by default
    # (VERDICT r2 item 9: time the 162K-user full-catalog eval and record the
    # mask-build fraction; the seen mask is now built on device from index
    # pairs, training/evaluate.py::score_topk)
    from movie_recommender_system_with_gnns_tpu.training.checkpoint import load_params
    bp, _ = load_params(os.path.join(args.out, "best_fullrank.npz"))
    rt, nt = evaluate_full_ranking(bp, train_e, test_e, data.num_users, k=10,
                                   max_users=args.final_eval_users or None,
                                   use_propagated=bool(args.eval_propagated),
                                   normalize=eval_normalize, cfg=cfg_c)
    timings = evaluate_full_ranking.last_timings
    print(f"TEST at best-val (epoch {best['epoch']}): Recall@10 {rt:.4f} "
          f"NDCG@10 {nt:.4f}; amortized epoch {amort:.2f}s; "
          f"eval timings {timings}")
    logger.log(args.epochs, test_full_recall10=rt, test_full_ndcg10=nt,
               amortized_epoch_s=amort, **{f"eval_{k_}": v for k_, v in
                                           timings.items() if k_ != "sharded"})


if __name__ == "__main__":
    main()
