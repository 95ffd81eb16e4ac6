"""Persistent XLA compilation cache setup.

On this platform XLA programs compile remotely (~2-6 min for large training
steps), so caching compiled executables across processes is a first-order
performance feature: enable it in every entrypoint before the first jit runs.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    if path is None:
        path = os.environ.get(
            "MRGNN_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    # per-backend subdir: CPU AOT entries carry host-machine feature flags and
    # must not be shared with entries from other backends/configs
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERYTHING: on this platform even trivial eager-op compiles pay a
    # remote round trip, so the default 1s threshold leaves real money behind
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
