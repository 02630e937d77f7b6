"""Persistent XLA compilation cache for the CLI entry points.

The SDF integrator's warp-field jvp alone compiles for minutes; without a
persistent cache every process start (train, gen_data, render, eval,
bench) pays it again. JAX ships the cache — it just needs a directory.
Honors JAX_COMPILATION_CACHE_DIR when the user sets one.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache() -> None:
    import jax

    if os.environ.get("NERF_EMITTER_JIT_CACHE", "1") == "0":
        return
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    if backend == "axon":
        # Observed 2026-08-21 00:48Z (post host-reboot server): executing a
        # DESERIALIZED cached executable hangs the axon tunnel indefinitely,
        # while fresh in-process compiles work — a killed client then wedges
        # subsequent sessions. Fresh compiles cost minutes per process but
        # always complete; force them on this backend.
        return

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/nerf_emitter_tpu/jax_cache"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: run uncached
