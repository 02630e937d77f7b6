"""Test config: force an 8-virtual-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) since only one real TPU chip is
available in CI; bench.py runs on the real chip instead.

NOTE: the environment's sitecustomize registers the axon TPU backend and
overrides JAX_PLATFORMS, so the env var alone is NOT enough — we must set
the platform through jax.config before any device access, or every eager op
round-trips through the TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by XLA
# CPU compiles (warp jvp-through-fori_loop alone is minutes); cached
# executables make re-runs start in seconds.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
