"""Persistent XLA compilation cache setup.

On this platform XLA programs compile remotely (~2-6 min for large training
steps), so caching compiled executables across processes is a first-order
performance feature: enable it in every entrypoint before the first jit runs.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint(backend: str) -> str:
    """Short fingerprint isolating cache entries per machine type.

    CPU AOT executables embed host ISA feature assumptions — loading an entry
    compiled on a different microarchitecture can SIGILL (observed as
    cpu_aot_loader feature-mismatch warnings in the r2 multichip dryrun), so
    CPU entries key on the host's feature-flag set. Other backends key on the
    device kind (e.g. 'TPU v5 lite') so cache dirs survive chip swaps safely.
    """
    if backend == "cpu":
        flags = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        flags = " ".join(sorted(line.split(":", 1)[1].split()))
                        break
        except OSError:
            import platform

            flags = platform.machine() + platform.processor()
        return hashlib.sha256(flags.encode()).hexdigest()[:12]
    try:
        import jax

        kind = jax.devices()[0].device_kind
    except Exception:
        kind = "unknown"
    return kind.replace(" ", "-").lower()


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        # Do not persist XLA:CPU AOT executables: the loader compares the
        # compile-time feature string (which XLA extends with tuning
        # pseudo-features like +prefer-no-scatter) against the host's real
        # feature set, so every load — even same-machine — logs a
        # could-SIGILL feature-mismatch error (seen in the r2 multichip
        # dryrun), and a genuinely foreign entry could actually SIGILL.
        # CPU compiles are local and fast; only remote TPU compiles are worth
        # caching. Opt back in explicitly with MRGNN_JAX_CACHE_CPU=1.
        if not os.environ.get("MRGNN_JAX_CACHE_CPU"):
            return ""
    if path is None:
        path = os.environ.get(
            "MRGNN_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"),
        )
    # per-backend + per-machine-fingerprint subdir: AOT entries carry host /
    # device feature assumptions and must never be shared across machine types
    path = os.path.join(path, f"{backend}-{_host_fingerprint(backend)}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERYTHING: on this platform even trivial eager-op compiles pay a
    # remote round trip, so the default 1s threshold leaves real money behind
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
