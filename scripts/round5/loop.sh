#!/bin/bash
# Outer retry loop for the round-5 queue (same protocol as round4/loop.sh:
# probe the tunnel, run the idempotent stages, retry on crashes). Per-stage
# retry caps live INSIDE stages.sh (check_fails) so one wedged stage can
# no longer starve everything behind it (VERDICT r4 weak #2).
R5=/root/repo/outputs/r5
mkdir -p "$R5/logs"
# fresh-compile probe: the observed wedge mode (00:05Z 2026-08-21) hangs
# new compilations while cached tiny programs still execute — a cached
# probe would green-light stages into a guaranteed hang.
PROBE='
import time
t0 = time.time()
import jax, jax.numpy as jnp
n = 128 + int(time.time() * 1e6) % 97
x = jnp.ones((n, n))
(x @ x).sum().block_until_ready()
y = jnp.ones((16 * 1024 * 1024,), jnp.float32)  # HBM-wedge check: >=64MB alloc
y[-1].block_until_ready()
print("TPU_OK", jax.devices()[0].platform, f"{time.time()-t0:.1f}s")
'
ensure_chamfer_worker() {
  local pidfile="$R5/chamfer_worker.pid"
  if [ -f "$pidfile" ] && [ -d "/proc/$(cat "$pidfile")" ]; then
    return 0
  fi
  nohup bash "$(dirname "$0")/chamfer_worker.sh" \
    >> "$R5/logs/chamfer_worker.log" 2>&1 &
  echo $! > "$pidfile"
}

while true; do
  ensure_chamfer_worker
  # Patient probe (300s): killing a probe mid-session leaves a zombie
  # session server-side that BLOCKS the next client — timeout-killed
  # probes were self-sustaining the 23:49-00:46Z wedge.
  if timeout 300 python -c "$PROBE" 2>/dev/null | grep -q TPU_OK; then
    echo "$(date +%H:%M:%S) tunnel alive — running stages"
    bash "$(dirname "$0")/stages.sh" >> "$R5/logs/stages.log" 2>&1
    rc=$?
    if tail -5 "$R5/logs/stages.log" | grep -q ALL_STAGES_DONE; then
      echo "$(date +%H:%M:%S) ALL STAGES DONE"
      break
    fi
    echo "$(date +%H:%M:%S) stages exited rc=$rc — will retry after probe"
    sleep 30
  else
    echo "$(date +%H:%M:%S) tunnel down — sleeping 180s to let zombie sessions drain"
    sleep 180
  fi
done
