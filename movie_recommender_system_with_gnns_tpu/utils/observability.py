"""Observability: structured metrics logging, wall-clock tracing, profiler hooks.

The reference's observability is ``print()`` + three .npy history arrays + a
commented-out ``@profile`` memory tracker (SURVEY §5: dataset_handler.py:13-14,
train_test.py:247-248,:289-291). This module provides the production version:

  * :class:`MetricsLogger` — append-only JSONL metrics stream + in-memory
    histories (superset of the reference's three arrays);
  * :func:`trace_span` — wall-clock span timer that feeds the logger;
  * :func:`profile_to` — ``jax.profiler`` trace capture wrapped so callers
    degrade gracefully where the backend doesn't support device tracing.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, List, Optional


class MetricsLogger:
    """Append-only JSONL metrics with per-key history access."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._hist: Dict[str, List[Any]] = {}
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": step, "ts": time.time(), **metrics}
        for k, v in metrics.items():
            self._hist.setdefault(k, []).append(v)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=float) + "\n")

    def history(self, key: str) -> List[Any]:
        return list(self._hist.get(key, []))

    @staticmethod
    def read(path: str) -> List[Dict[str, Any]]:
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out


@contextlib.contextmanager
def trace_span(name: str, logger: Optional[MetricsLogger] = None,
               step: int = 0, verbose: bool = False) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if logger is not None:
            logger.log(step, **{f"span/{name}_s": dt})
        if verbose:
            print(f"[trace] {name}: {dt:.3f}s")


def device_memory_stats() -> Dict[str, Any]:
    """Per-device memory statistics (the production version of the reference's
    commented-out @profile memory tracking, dataset_handler.py:13-14)."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except (RuntimeError, NotImplementedError, AttributeError):
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


@contextlib.contextmanager
def profile_to(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace; no-op (with a notice) when the backend
    can't trace (e.g. remote-tunneled TPU)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except (RuntimeError, NotImplementedError) as e:
        print(f"[profile] trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"[profile] trace written to {log_dir}")
            except (RuntimeError, NotImplementedError) as e:
                print(f"[profile] stop failed: {e}")
