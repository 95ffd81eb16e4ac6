"""Command-line entrypoints: train, recommend (interactive + one-shot), eda.

The reference's "CLI" is ``python utils/train_test.py`` (train driver __main__,
train_test.py:259-293) and ``python utils/recommend.py`` (interactive input()
loop, recommend.py:115-156). This module gives the same capabilities behind one
argparse front end:

    python -m movie_recommender_system_with_gnns_tpu.cli train   [--dataset ...]
    python -m movie_recommender_system_with_gnns_tpu.cli recommend [--user-id N | --movie-id N]
    python -m movie_recommender_system_with_gnns_tpu.cli eda

plus config overrides (--epochs, --dim, --layers, --clusters, --lr).
"""

from __future__ import annotations

import argparse
import os
import sys

from .config import Config, DataConfig, ModelConfig, TrainConfig
from .utils.compilation_cache import enable_compilation_cache


def _build_cfg(args) -> Config:
    data = DataConfig(
        dataset=args.dataset,
        data_dir=args.data_dir or f"data/movielens-{args.dataset.replace('ml-', '')}",
        indexes_dir=args.indexes_dir,
        synthetic_users=args.synthetic_users,
        synthetic_items=args.synthetic_items,
        synthetic_interactions=args.synthetic_interactions,
        split_level=getattr(args, "split_level", "edge"),
    )
    model = ModelConfig(num_layers=args.layers, dim=args.dim, readout=args.readout)
    train = TrainConfig(epochs=args.epochs, lr=args.lr, num_clusters=args.clusters,
                        checkpoint_path=args.checkpoint,
                        loss=getattr(args, "loss", "reference"),
                        optimizer=getattr(args, "optimizer", "adam"),
                        partitioner=getattr(args, "partitioner", "greedy"),
                        trainer=getattr(args, "trainer", "compact"),
                        fullgraph_steps=getattr(args, "fullgraph_steps", 16),
                        num_negatives=getattr(args, "num_negatives", 1),
                        negatives=getattr(args, "negatives", "uniform"),
                        fused_bpr=getattr(args, "fused_bpr", False),
                        lr_schedule=getattr(args, "lr_schedule", "constant"),
                        lr_warmup_steps=getattr(args, "lr_warmup_steps", 0))
    return Config(data=data, model=model, train=train)


def cmd_train(args) -> int:
    """Reference train_test.py __main__ (:259-293): build data, resume if a
    checkpoint exists, train, persist histories, plot."""
    import jax

    from .training.checkpoint import load_params_if_exists, save_params
    from .training.pipeline import prepare_training_data
    from .training.train import create_train_state, save_histories, train_model

    from .utils.observability import MetricsLogger

    cfg = _build_cfg(args)
    print(f"devices: {jax.devices()}")
    bundle = prepare_training_data(cfg)
    data, clusters, val, test = bundle
    print(f"Number of users: {data.num_users}")
    print(f"Number of items: {data.num_items}")
    print(f"Number of relevant interactions: {data.edge_index.shape[1]}")

    if cfg.train.lr_schedule == "cosine" and cfg.train.lr_total_steps <= 0:
        from .training.fullgraph import FullGraphTrainData

        steps_per_epoch = (clusters.num_steps
                           if isinstance(clusters, FullGraphTrainData)
                           else cfg.train.num_clusters)
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, lr_total_steps=steps_per_epoch * cfg.train.epochs))

    state = create_train_state(cfg, data.num_users, data.num_items)
    if cfg.train.resume:
        state = state._replace(
            params=load_params_if_exists(cfg.train.checkpoint_path, state.params))

    def save_cb(st, recall):
        save_params(cfg.train.checkpoint_path, st.params,
                    meta={"val_recall": recall, "config": cfg.to_json()})

    logger = MetricsLogger(os.path.join(cfg.train.histories_dir, "metrics.jsonl"))
    if args.mesh:
        # mesh-sharded full-graph training: "--mesh DPxMP", e.g. 2x4
        from .config import MeshConfig
        from .training.distributed import train_model_sharded

        dp, mp = (int(x) for x in args.mesh.lower().split("x"))
        cfg = cfg.replace(mesh=MeshConfig(data_parallel=dp, model_parallel=mp))
        train_e, _, _ = bundle.splits
        params, hist = train_model_sharded(
            cfg, data.num_users, data.num_items, train_e, val, test,
            save_checkpoint=lambda p, r: save_params(
                cfg.train.checkpoint_path, p, meta={"val_recall": r}),
            metrics_logger=logger)
        state = state._replace(params=params)
    elif args.max_retries > 0:
        # elastic driver (training/recovery.py): transient device/tunnel
        # failures resume bit-exactly from the periodic full-state checkpoint
        from .training.recovery import train_with_recovery

        state, hist = train_with_recovery(
            cfg, state, clusters, val, test, max_retries=args.max_retries,
            save_checkpoint=save_cb, metrics_logger=logger)
    else:
        state, hist = train_model(cfg, state, clusters, val, test,
                                  save_checkpoint=save_cb, metrics_logger=logger)
    save_histories(hist, cfg.train.histories_dir)

    if args.full_eval:
        from .training.evaluate import evaluate_full_ranking

        mesh = None
        if args.mesh:  # reuse the training mesh layout for sharded eval
            from .parallel.mesh import make_mesh

            mesh = make_mesh(cfg.mesh.data_parallel, cfg.mesh.model_parallel)
        train_e, val_e, test_e = bundle.splits
        recall, ndcg = evaluate_full_ranking(
            state.params, train_e, test_e, data.num_users, k=args.full_eval_k,
            max_users=args.full_eval_users, mesh=mesh)
        print(f"Full-ranking test Recall@{args.full_eval_k}: {recall:.4f}, "
              f"NDCG@{args.full_eval_k}: {ndcg:.4f}")
        logger.log(cfg.train.epochs, test_full_recall=recall,
                   test_full_ndcg=ndcg, **evaluate_full_ranking.last_timings)
    try:
        from .utils.visualizations import plot_histories

        out = plot_histories(cfg.train.histories_dir)
        print(f"history plot: {out}")
    except Exception as e:  # viz must never fail training
        print(f"history plot skipped: {e}")
    return 0


def cmd_recommend(args) -> int:
    """Reference recommend.py __main__ (:115-156): load checkpoint, resolve the
    user (prompting interactively when no --user-id), print top-10 with
    train-seen exclusion, emit plots."""
    from .data.movielens import split_edges
    from .serving.recommend import (
        recommend_from_movie, recommend_from_user, train_seen_items,
    )
    from .training.checkpoint import load_params
    from .training.pipeline import prepare_training_data

    cfg = _build_cfg(args)
    bundle = prepare_training_data(cfg)
    data = bundle.data
    if not os.path.exists(cfg.train.checkpoint_path):
        print(f"checkpoint {cfg.train.checkpoint_path} not found — train first")
        return 1
    params, meta = load_params(cfg.train.checkpoint_path)
    if getattr(args, "propagated", False):
        from .serving.recommend import compute_serving_tables

        params = compute_serving_tables(params, bundle.splits[0], cfg,
                                        mode="propagated")

    if args.users_file is not None:
        # batch serving: one raw userId per line -> CSV of top-k per user
        import numpy as np

        from .serving.recommend import batch_recommend_users

        raw_ids = [int(x) for x in open(args.users_file).read().split()]
        idx = data.user_index(np.asarray(raw_ids))
        valid = idx >= 0
        scores, items = batch_recommend_users(params, idx[valid].astype(np.int64),
                                              top_k=args.top_k)
        scores, items = np.asarray(scores), np.asarray(items)
        out_path = args.out or "recommendations.csv"
        with open(out_path, "w") as f:
            f.write("userId,rank,movieId,title,score\n")
            r = 0
            for j, uid in enumerate(np.asarray(raw_ids)[valid]):
                for rank in range(args.top_k):
                    raw_m = int(data.raw_movie_id(int(items[r][rank])))
                    title = str(data.title_of(raw_m)).replace(",", ";")
                    f.write(f"{uid},{rank + 1},{raw_m},{title},{scores[r][rank]:.4f}\n")
                r += 1
        skipped = int((~valid).sum())
        print(f"wrote {out_path}: {int(valid.sum())} users, top-{args.top_k}"
              + (f" ({skipped} unknown ids skipped)" if skipped else ""))
        return 0

    if args.movie_id is not None:
        out = recommend_from_movie(params, args.movie_id, data, top_k=args.top_k)
        if "error" in out:
            print(out["error"])
            return 1
        print(f"Top {args.top_k} users for movie {args.movie_id}:")
        for i, rec in enumerate(out["top_users"], 1):
            print(f"{i}. user {rec['user_id']} (Score: {rec['score']:.4f})")
        return 0

    user_id = args.user_id
    if user_id is None:
        suggested = int(data.user_ids[0])
        print(f"Please enter a user ID (suggested user: {suggested}):")
        user_id = int(input())

    uidx = int(data.user_index(user_id))
    excluded = None
    if uidx >= 0:
        train_e, _, _ = split_edges(data, cfg.data.indexes_dir,
                                    cfg.data.train_size, cfg.data.val_test_ratio,
                                    cfg.data.split_seed)
        excluded = train_seen_items(train_e, data.num_users, uidx)

    out = recommend_from_user(params, user_id, data, excluded, top_k=args.top_k)
    if "error" in out:
        print(out["error"])
        return 1
    print(f"Top {args.top_k} Recommendations for user {user_id}:")
    for i, rec in enumerate(out["recommendations"], 1):
        print(f"{i}. {rec['title']} (Score: {rec['score']:.4f})")

    if args.plots:
        try:
            from .utils.visualizations import (
                analyze_user_recommendations, plot_recommendations,
            )

            print("bar chart:", plot_recommendations(out["recommendations"], user_id))
            print("analysis:", analyze_user_recommendations(params, user_id, data))
        except Exception as e:
            print(f"plots skipped: {e}")
    return 0


def cmd_eda(args) -> int:
    """Reference data/eda.py: dataset statistics report."""
    from .utils.eda import eda_report

    cfg = _build_cfg(args)
    ratings_path = os.path.join(cfg.data.data_dir, "ratings.csv")
    movies = tags = None
    if os.path.exists(ratings_path):
        import pandas as pd

        ratings = pd.read_csv(ratings_path, usecols=["userId", "movieId", "rating"])
        # genre/tag breakdowns when the sibling CSVs exist (reference
        # data/eda.py:76-108 prints both)
        movies_path = os.path.join(cfg.data.data_dir, "movies.csv")
        tags_path = os.path.join(cfg.data.data_dir, "tags.csv")
        if os.path.exists(movies_path):
            movies = pd.read_csv(movies_path)
        if os.path.exists(tags_path):
            tags = pd.read_csv(tags_path)
    else:
        import pandas as pd

        from .data.movielens import make_synthetic_movielens

        print("(no CSVs found — reporting on the synthetic dataset)")
        d = make_synthetic_movielens(cfg.data.synthetic_users,
                                     cfg.data.synthetic_items,
                                     cfg.data.synthetic_interactions)
        e = d.edge_index
        fwd = e[0] < d.num_users
        ratings = pd.DataFrame({
            "userId": d.raw_user_id(e[0][fwd]),
            "movieId": d.raw_movie_id(e[1][fwd] - d.num_users),
            "rating": 4.0,
        })
    eda_report(ratings, movies=movies, tags=tags, min_rating=cfg.data.min_rating)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="movie_recommender_system_with_gnns_tpu")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                    help="force a JAX platform (default: environment's)")
    ap.add_argument("--dataset", default="synthetic",
                    help="ml-25m | ml-1m | ml-100k | synthetic")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--indexes-dir", default="data/indexes")
    ap.add_argument("--checkpoint", default="best_model.npz")
    ap.add_argument("--epochs", type=int, default=3)          # train_test.py:287
    ap.add_argument("--lr", type=float, default=1e-3)         # train_test.py:216
    ap.add_argument("--dim", type=int, default=64)            # train_test.py:274
    ap.add_argument("--layers", type=int, default=3)          # train_test.py:274
    ap.add_argument("--clusters", type=int, default=100)      # dataset_handler.py:256
    ap.add_argument("--readout", default="reference", choices=["reference", "standard"])
    ap.add_argument("--synthetic-users", type=int, default=943)
    ap.add_argument("--synthetic-items", type=int, default=1682)
    ap.add_argument("--synthetic-interactions", type=int, default=100_000)
    sub = ap.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="train the LightGCN model")
    pt.add_argument("--mesh", default=None,
                    help="mesh-sharded training: DPxMP devices, e.g. 2x4 "
                         "(full-graph regime, row-sharded tables)")
    pt.add_argument("--loss", default="reference", choices=["reference", "standard"],
                    help="reference-quirk cosine-softplus BPR vs textbook BPR")
    pt.add_argument("--optimizer", default="adam",
                    choices=["adam", "lazy_adam", "hybrid_adam", "lazy_item_adam"])
    pt.add_argument("--partitioner", default="greedy",
                    choices=["greedy", "random_edges"])
    pt.add_argument("--trainer", default="compact",
                    choices=["compact", "full", "fullgraph"],
                    help="compact = Cluster-GCN in local node space; full = "
                         "reference full-node-space clusters; fullgraph = "
                         "every step propagates ALL train edges (hybrid "
                         "block-diagonal kernel, 100%% edge retention)")
    pt.add_argument("--fullgraph-steps", type=int, default=16,
                    help="optimizer updates per fullgraph epoch")
    pt.add_argument("--split-level", default="edge",
                    choices=["edge", "interaction"],
                    help="edge = reference-parity split of the doubled edge "
                         "list; interaction = leakage-free unique-pair split")
    pt.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"],
                    help="cosine adds warmup + decay (total steps auto-set "
                         "to steps_per_epoch x epochs)")
    pt.add_argument("--lr-warmup-steps", type=int, default=0)
    pt.add_argument("--num-negatives", type=int, default=1,
                    help="negatives per positive (full/fullgraph trainers)")
    pt.add_argument("--negatives", default="uniform",
                    choices=["uniform", "feasible"],
                    help="uniform = reference law (no collision check); "
                         "feasible = exact rejection resampling against the "
                         "train pair set (fullgraph trainer)")
    pt.add_argument("--fused-bpr", action="store_true",
                    help="fused Pallas BPR loss+grad kernel (ops/pallas_bpr.py)")
    pt.add_argument("--max-retries", type=int, default=0,
                    help="retry transient device failures N times, resuming "
                         "bit-exactly from the periodic full-state checkpoint "
                         "(training/recovery.py); 0 = plain train_model")
    pt.add_argument("--full-eval", action="store_true",
                    help="post-training full-ranking Recall@k/NDCG@k on test")
    pt.add_argument("--full-eval-k", type=int, default=10)
    pt.add_argument("--full-eval-users", type=int, default=10_000,
                    help="cap on evaluated users (None = all)")
    pr = sub.add_parser("recommend", help="top-k retrieval")
    pr.add_argument("--user-id", type=int, default=None)
    pr.add_argument("--movie-id", type=int, default=None)
    pr.add_argument("--top-k", type=int, default=10)
    pr.add_argument("--plots", action="store_true")
    pr.add_argument("--propagated", action="store_true",
                    help="score with K-layer propagated embeddings instead of "
                         "the reference's layer-0 tables")
    pr.add_argument("--users-file", default=None,
                    help="batch mode: file with one raw userId per line")
    pr.add_argument("--out", default=None, help="batch mode output CSV path")
    sub.add_parser("eda", help="dataset statistics report")

    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms",
                          "axon" if args.platform == "tpu" else args.platform)
    enable_compilation_cache()
    if args.cmd == "train":
        return cmd_train(args)
    if args.cmd == "recommend":
        return cmd_recommend(args)
    if args.cmd == "eda":
        return cmd_eda(args)
    return 2


if __name__ == "__main__":
    sys.exit(main())
