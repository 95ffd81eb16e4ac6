"""Capture + attribute a device trace of one ML-25M compact hybrid_adam epoch.

VERDICT r3 item 3: the headline epoch runs at rowop_util 0.47 of its measured
roofline floor and ~40% of the gap was unattributed. This script captures a
``jax.profiler`` trace of the exact jitted epoch program ``bench.py`` times,
then parses the xplane with ``tensorboard_plugin_profile`` and prints the
top self-time HLO ops — the named-op attribution the README table quotes.

Usage:  python examples/profile_epoch.py [--scale full] [--optimizer hybrid_adam]
        [--trainer sharded]   # the 1-chip mesh program instead
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movie_recommender_system_with_gnns_tpu.utils.compilation_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax


def _top_ops_from_trace(logdir, top=30):
    """Parse the captured xplane into per-op self times (the image's
    tensorboard_plugin_profile is version-skewed vs TF; ``xprof`` works)."""
    import json

    from xprof.convert import raw_to_tool_data as rtd

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        raise RuntimeError(f"no xplane under {logdir} — device tracing may "
                           "not be supported through the remote tunnel")
    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
    tab = json.loads(data if isinstance(data, str) else data.decode())
    rows = tab[0]["rows"] if isinstance(tab, list) else tab["rows"]
    cols = [c["label"] for c in (tab[0] if isinstance(tab, list) else tab)["cols"]]
    out = []
    for r in rows[:top]:
        vals = [c.get("v") for c in r["c"]]
        out.append(dict(zip(cols, vals)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="full")
    ap.add_argument("--optimizer", default="hybrid_adam")
    ap.add_argument("--trainer", default="compact",
                    choices=["compact", "sharded"])
    ap.add_argument("--logdir", default="/tmp/mrs_profile")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B

    scale = B.SCALES[args.scale]
    data, parts = B.build_problem(scale)

    if args.trainer == "sharded":
        # warm + trace the 1-chip mesh epoch (bench_sharded_epoch both builds
        # and times; we re-enter it under the profiler for the traced epochs)
        B.bench_sharded_epoch(data, scale, epochs=1)
        with jax.profiler.trace(args.logdir):
            B.bench_sharded_epoch(data, scale, epochs=args.epochs)
    else:
        cache = {}
        B.bench_tpu_epoch(data, parts, scale, epochs=1,
                          optimizer=args.optimizer, stacked_cache=cache)
        with jax.profiler.trace(args.logdir):
            B.bench_tpu_epoch(data, parts, scale, epochs=args.epochs,
                              optimizer=args.optimizer, stacked_cache=cache)

    time.sleep(2)
    out = _top_ops_from_trace(args.logdir)
    print(out if isinstance(out, str) else str(out)[:20000])


if __name__ == "__main__":
    main()
