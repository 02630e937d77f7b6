#!/bin/bash
# Run a command with BOTH a hard timeout and a progress-stall guard.
#
#   stall_guard.sh <watch_path> <stall_secs> <timeout_secs> cmd args...
#
# The axon tunnel can hang an in-flight dispatch indefinitely (observed
# 23:49Z 2026-08-20: gen_data sat 13 min at 4 s CPU with zero output); a
# plain `timeout 14400` would hold the queue for four hours before
# retrying. This wrapper watches the newest mtime under <watch_path>
# (file or directory) and kills the command — by its RECORDED pid, never
# by pattern — once nothing has advanced for <stall_secs>. Exit codes:
# the command's own on normal exit, 124 on hard timeout, 125 on stall.
set -u
WATCH=$1; STALL=$2; TMO=$3; shift 3

newest() {
  find "$WATCH" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1 \
    | cut -d. -f1
}

"$@" &
PID=$!
START=$(date +%s)
while [ -d "/proc/$PID" ]; do
  sleep 20
  NOW=$(date +%s)
  # a fresh driver/builder capture window pauses the workload between
  # dispatches (capture_lock.checkpoint) — not a stall; don't kill it
  PF=${NERF_EMITTER_PAUSE_FILE:-/tmp/nerf_emitter_pause}
  if [ -f "$PF" ] && [ $((NOW - $(stat -c %Y "$PF" 2>/dev/null || echo 0))) -lt 2700 ]; then
    START=$NOW   # restart the stall clock after the window closes
    continue
  fi
  if [ $((NOW - START)) -ge "$TMO" ]; then
    kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
    echo "stall_guard: hard timeout (${TMO}s) — killed $PID" >&2
    exit 124
  fi
  M=$(newest)
  [ -n "$M" ] || M=$START          # nothing written yet: count from start
  [ "$M" -gt "$START" ] || M=$START  # pre-existing files don't count as progress
  if [ $((NOW - M)) -gt "$STALL" ]; then
    kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
    echo "stall_guard: no progress under $WATCH for ${STALL}s — killed $PID" >&2
    sleep 30  # let the killed client's server-side session drain
    exit 125
  fi
done
wait "$PID"
