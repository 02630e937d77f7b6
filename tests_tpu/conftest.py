"""On-chip numerics tier (VERDICT r4 weak #1).

The main suite (tests/) forces an 8-virtual-device CPU platform, which
can NEVER catch TPU-precision defects: round 4 published SSIM = 11.1
because the windowed-variance convs cancel catastrophically at the TPU's
default (bf16-input) conv precision while being exact in CPU f32. This
tier runs the metric kernels on the REAL chip and asserts their
mathematical invariants. The round stage queue runs it once per round:

    python -m pytest tests_tpu/ -x -q

It is intentionally tiny (a few seconds of chip time) and skips itself
when no TPU is reachable so `pytest` from a CPU-only box stays green.
"""

import jax
import pytest


def _tpu_available() -> bool:
    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if not _tpu_available():
        skip = pytest.mark.skip(reason="no TPU device reachable")
        for item in items:
            item.add_marker(skip)
