"""Capture-window coordination between long-running jobs and benchmarks.

The sandbox has ONE TPU chip behind a tunnel and ONE host CPU core. The
driver's contract captures (bench.py throughput, __graft_entry__
dryrun_multichip's 8-virtual-device CPU collectives) run at arbitrary
times while the background stage queue (scripts/round*/loop.sh) may be
mid-training. Contention starves the 40-second XLA collective rendezvous
(the round-2 MULTICHIP failure) and depresses bench numbers.

Protocol (plain files, no daemons):
- a capturer touches PAUSE_FILE, then waits until every worker is quiet
  (worker heartbeat stale or an explicit ack) before measuring, and
  removes PAUSE_FILE when done;
- workers call `checkpoint()` between device dispatches: normally it
  refreshes HEARTBEAT_FILE and returns immediately; while PAUSE_FILE
  exists it writes an ack and sleeps, resuming when the capturer exits.

A stale PAUSE_FILE (older than MAX_PAUSE_AGE) is ignored and removed, so
a crashed capturer can never wedge the queue.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from pathlib import Path

PAUSE_FILE = Path(os.environ.get("NERF_EMITTER_PAUSE_FILE", "/tmp/nerf_emitter_pause"))
HEARTBEAT_FILE = Path(
    os.environ.get("NERF_EMITTER_HEARTBEAT_FILE", "/tmp/nerf_emitter_heartbeat")
)
ACK_FILE = Path(os.environ.get("NERF_EMITTER_ACK_FILE", "/tmp/nerf_emitter_pause_ack"))

MAX_PAUSE_AGE = 45 * 60.0  # a crashed capturer must not wedge the queue
HEARTBEAT_STALE = 15.0  # no dispatch for this long == host/chip quiet
POLL = 2.0


def _age(path: Path) -> float:
    try:
        return time.time() - path.stat().st_mtime
    except OSError:
        return float("inf")


def _touch(path: Path) -> None:
    try:
        path.touch()
    except OSError:
        pass


def pause_requested() -> bool:
    """True while a live (non-stale) capture window is open."""
    age = _age(PAUSE_FILE)
    if age == float("inf"):
        return False
    if age > MAX_PAUSE_AGE:
        try:
            PAUSE_FILE.unlink()
        except OSError:
            pass
        return False
    return True


def checkpoint() -> None:
    """Worker-side: call between device dispatches. Returns immediately
    when no capture is active (refreshing the heartbeat); otherwise acks
    the pause and sleeps until the capturer finishes."""
    if not pause_requested():
        _touch(HEARTBEAT_FILE)
        return
    _touch(ACK_FILE)
    while pause_requested():
        time.sleep(POLL)
    try:
        ACK_FILE.unlink()
    except OSError:
        pass
    _touch(HEARTBEAT_FILE)


@contextmanager
def capture_window(tag: str = "", max_wait: float = 120.0):
    """Capturer-side: open a capture window, wait for workers to go quiet
    (explicit ack, stale heartbeat, or max_wait), yield, then close."""
    try:
        PAUSE_FILE.write_text(f"{tag} pid={os.getpid()} t={time.time():.0f}\n")
    except OSError:
        pass
    t0 = time.time()
    # never-written heartbeat (age inf) means no worker has ever run: quiet
    while time.time() - t0 < max_wait:
        if ACK_FILE.exists() or _age(HEARTBEAT_FILE) > HEARTBEAT_STALE:
            break
        time.sleep(POLL)
    try:
        yield
    finally:
        try:
            PAUSE_FILE.unlink()
        except OSError:
            pass
