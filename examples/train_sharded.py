"""Example: mesh-sharded training (row-sharded tables over a device mesh).

With real multi-chip hardware this runs as-is; on a single host, demo with the
virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/train_sharded.py --platform cpu --mesh 2x4

The trainer is parallel/sharding.py's shard_map step: row-sharded embedding
tables ('model' axis), per-layer all_gather propagation over ICI, data-parallel
BPR ('data' axis), cross-shard grad clipping, sharded Adam — proven numerically
identical to the single-chip trainer in tests/test_sharding.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="2x4")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--out", default="runs/sharded")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from movie_recommender_system_with_gnns_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax

    from movie_recommender_system_with_gnns_tpu.config import (
        Config, DataConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    from movie_recommender_system_with_gnns_tpu.data.movielens import (
        make_synthetic_movielens, split_edges,
    )
    from movie_recommender_system_with_gnns_tpu.parallel.mesh import (
        distributed_init, make_mesh,
    )
    from movie_recommender_system_with_gnns_tpu.training.checkpoint import save_params
    from movie_recommender_system_with_gnns_tpu.training.distributed import (
        train_model_sharded,
    )
    from movie_recommender_system_with_gnns_tpu.training.train import build_eval_batch

    distributed_init()  # no-op on a single host
    dp, mp = (int(x) for x in args.mesh.lower().split("x"))
    print(f"devices: {jax.devices()}")
    mesh = make_mesh(dp, mp)

    os.makedirs(args.out, exist_ok=True)
    cfg = Config(
        model=ModelConfig(num_layers=3, dim=64),
        train=TrainConfig(epochs=args.epochs, batch_size=args.batch_size),
        mesh=MeshConfig(data_parallel=dp, model_parallel=mp),
    )
    data = make_synthetic_movielens(943, 1682, 100_000, seed=0)
    n = data.num_users + data.num_items
    train_e, val_e, test_e = split_edges(data, os.path.join(args.out, "indexes"))
    val = build_eval_batch(val_e, n, data.num_users)
    test = build_eval_batch(test_e, n, data.num_users)

    params, hist = train_model_sharded(
        cfg, data.num_users, data.num_items, train_e, val, test, mesh=mesh,
        save_checkpoint=lambda p, r: save_params(
            os.path.join(args.out, "best_model.npz"), p, meta={"val_recall": r}),
    )
    print("done; best checkpoint in", args.out)


if __name__ == "__main__":
    main()
