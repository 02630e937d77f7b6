"""Test config: force an 8-virtual-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) since only one real TPU chip is
available in CI; bench.py runs on the real chip instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
