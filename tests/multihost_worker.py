"""Worker process for the 2-process DCN test (tests/test_multihost.py).

Each worker joins the jax.distributed service (the framework's multi-host
wiring, parallel/mesh.maybe_initialize_distributed — the reference's
dist.init_process_group NCCL rendezvous, scripts/train.py:140-153), then
runs the full dryrun (NeRF train step + SDF takeover step) over a mesh
spanning BOTH processes' devices. Not a pytest file.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["NERF_EMITTER_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["NERF_EMITTER_NUM_PROCESSES"] = str(nproc)
os.environ["NERF_EMITTER_PROCESS_ID"] = str(pid)

repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo_root)

from nerf_emitter_tpu.parallel.mesh import maybe_initialize_distributed  # noqa: E402

assert maybe_initialize_distributed(), "coordinator env not picked up"

import jax  # noqa: E402

# share the test suite's persistent compile cache
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.process_count() == nproc, jax.process_count()
print(
    f"proc {jax.process_index()}/{jax.process_count()} "
    f"global_devices={jax.device_count()}",
    flush=True,
)

import __graft_entry__ as g  # noqa: E402

g._dryrun_impl(jax.device_count())
print("MULTIHOST_OK", flush=True)
