"""Elastic training driver: retry transient device failures from the last
full-state checkpoint.

SURVEY §5 lists "failure detection / recovery" as an auxiliary subsystem; the
reference has none (a crashed ``python utils/train_test.py`` run restarts from
the last *best-val params* file only, losing optimizer moments and the epoch
position — dataset_handler.py keeps no training state). This driver goes past
that parity point: it wraps :func:`training.train.train_model` so that a
transient runtime failure (the remote-PJRT tunnel dropping, a preempted
device, a transient XLA INTERNAL error) resumes from the newest periodic
full-state checkpoint — optimizer moments, step counter and the per-epoch
PRNG stream included — and the recovered run is **bit-identical** to an
uninterrupted one (tests/test_recovery.py):

  * ``save_train_state`` checkpoints are atomic (tmp + rename) and carry the
    epoch they were taken after;
  * ``train_model(start_epoch=E)`` fast-forwards the per-epoch PRNG splits, so
    epoch E of a resumed run consumes exactly the keys epoch E of the
    uninterrupted run would have;
  * jitted programs are rebuilt on re-entry (a dead backend's executables are
    useless anyway; the persistent compilation cache makes rebuilds cheap).

Transience is decided by substring match against the failure taxonomy of the
remote PJRT stack (gRPC status names + socket-level messages). Anything else
— shape errors, OOM, NaN guards — propagates immediately: retrying a
deterministic error is how silent data corruption happens.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

from ..config import Config

# gRPC status names + socket-level strings seen from a dropped remote-PJRT
# tunnel; DATA_LOSS/RESOURCE_EXHAUSTED are deliberately absent (not transient)
TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "CANCELLED",
    "INTERNAL",
    "Socket closed",
    "socket closed",
    "connection reset",
    "Connection reset",
    "failed to connect",
    "preempt",
)


def is_transient_error(exc: BaseException) -> bool:
    """True when ``exc`` smells like a transient device/transport failure."""
    msg = f"{type(exc).__name__}: {exc}"
    return any(m in msg for m in TRANSIENT_MARKERS)


def train_with_recovery(
    cfg: Config,
    state,
    clusters,
    val,
    test,
    max_retries: int = 2,
    retry_backoff_s: float = 1.0,
    is_transient: Callable[[BaseException], bool] = is_transient_error,
    on_epoch_end: Optional[Callable] = None,
    **train_kw,
):
    """Run :func:`train_model` to completion across transient failures.

    Requires periodic full-state checkpoints; if ``cfg.train`` has none
    configured, they are enabled at ``recovery_state.npz`` every epoch (a
    printed notice says so). Returns ``(state, hist)`` exactly like
    ``train_model`` — ``hist`` is stitched across attempts with re-run epochs
    deduplicated (last write wins, which equals the uninterrupted values by
    the bit-exactness above).
    """
    import dataclasses

    from .checkpoint import load_state_meta, load_train_state
    from .train import train_model

    if not (cfg.train.state_checkpoint_path
            and cfg.train.state_checkpoint_every > 0):
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, state_checkpoint_path="recovery_state.npz",
            state_checkpoint_every=1))
        print("recovery: enabling per-epoch full-state checkpoints at "
              "recovery_state.npz (cfg.train.state_checkpoint_path was unset)")
    ckpt_path = cfg.train.state_checkpoint_path

    per_epoch: Dict[int, Dict[str, float]] = {}
    best_recall = 0.0

    from .train import _callback_takes_state

    fwd_state = on_epoch_end is not None and _callback_takes_state(on_epoch_end)

    def record(epoch: int, metrics: Dict[str, float], st) -> None:
        # declares 3 params so train_model hands over the live state; it is
        # forwarded only to callbacks that themselves opt in
        per_epoch[epoch] = dict(metrics)
        if on_epoch_end is not None:
            if fwd_state:
                on_epoch_end(epoch, metrics, st)
            else:
                on_epoch_end(epoch, metrics)

    # the compact fused trainers swap the optax state for LazyAdamState inside
    # train_model; mirror that here so the checkpoint reload's state_like has
    # the structure the checkpoint was actually written with
    from .compact import CompactClusters, LazyAdamState, init_lazy_adam
    from .train import TrainState

    if (isinstance(clusters, CompactClusters)
            and cfg.train.optimizer in ("lazy_adam", "hybrid_adam",
                                        "lazy_item_adam")
            and not isinstance(state.opt_state, LazyAdamState)):
        state = TrainState(state.params, init_lazy_adam(state.params),
                           state.step)

    start_epoch = 0
    attempt = 0
    while True:
        try:
            final_state, hist = train_model(
                cfg, state, clusters, val, test,
                on_epoch_end=record, start_epoch=start_epoch,
                best_recall=best_recall, **train_kw)
            break
        except Exception as exc:  # noqa: BLE001 — filtered right below
            if not is_transient(exc) or attempt >= max_retries:
                raise
            attempt += 1
            try:
                meta = load_state_meta(ckpt_path)
                state = load_train_state(ckpt_path, state)
                start_epoch = int(meta.get("epoch", -1)) + 1
            except FileNotFoundError:
                start_epoch = 0  # failed before the first checkpoint
            best_recall = max((m.get("val_recall", 0.0)
                               for e, m in per_epoch.items()
                               if e < start_epoch), default=0.0)
            print(f"recovery: transient failure "
                  f"({type(exc).__name__}: {str(exc)[:200]}) — resuming from "
                  f"epoch {start_epoch} (attempt {attempt}/{max_retries}) "
                  f"after {retry_backoff_s:.1f}s")
            time.sleep(retry_backoff_s)

    # stitch histories: per-epoch metrics in epoch order + the final test eval
    stitched: Dict[str, List[float]] = {
        k: [per_epoch[e][k] for e in sorted(per_epoch)]
        for k in ("train_loss", "val_loss", "val_recall", "epoch_time_s")
    }
    stitched["test_loss"] = hist["test_loss"]
    stitched["test_recall"] = hist["test_recall"]
    return final_state, stitched
