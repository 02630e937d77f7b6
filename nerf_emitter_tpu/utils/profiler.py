"""Profiler: decorator/context timing + JAX trace capture.

Re-design of nerfstudio/utils/profiler.py:59-229: the decorator+context
profiler that accumulates per-function means printed at exit, plus the
torch.profiler trace hook at fixed steps — here backed by jax.profiler
(TensorBoard-viewable traces) and jax.named_scope for XLA-level annotation.
"""

from __future__ import annotations

import atexit
import functools
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path
from typing import Optional

import jax

_STATS: dict[str, list] = defaultdict(lambda: [0, 0.0])  # name -> [count, total]
_ENABLED = True


def enable(on: bool = True):
    global _ENABLED
    _ENABLED = on


def time_function(fn=None, *, name: Optional[str] = None):
    """Decorator: accumulate wall time per call (device sync NOT forced —
    jitted calls are async; use trace() for device-accurate profiles)."""

    def deco(f):
        label = name or f.__qualname__

        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            if not _ENABLED:
                return f(*args, **kwargs)
            t0 = time.perf_counter()
            with jax.named_scope(label):
                out = f(*args, **kwargs)
            dt = time.perf_counter() - t0
            s = _STATS[label]
            s[0] += 1
            s[1] += dt
            return out

        return wrapper

    return deco(fn) if fn is not None else deco


@contextmanager
def time_block(name: str):
    t0 = time.perf_counter()
    with jax.named_scope(name):
        yield
    s = _STATS[name]
    s[0] += 1
    s[1] += time.perf_counter() - t0


@contextmanager
def trace(log_dir: Path, enabled: bool = True):
    """Capture a jax.profiler device trace (view in TensorBoard) — the
    analogue of the reference's torch.profiler dump at steps 2,5,8,11."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summary() -> str:
    lines = ["profiler summary (mean over calls):"]
    for name, (count, total) in sorted(_STATS.items(), key=lambda kv: -kv[1][1]):
        lines.append(f"  {name}: {total / max(count, 1) * 1e3:.2f} ms x {count}")
    return "\n".join(lines)


@atexit.register
def _print_summary():
    if _ENABLED and _STATS:
        print(summary(), flush=True)
