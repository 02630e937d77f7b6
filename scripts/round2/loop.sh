#!/bin/bash
# Outer retry loop for the round-2 TPU work queue. Probes the tunnel with a
# tiny dispatch; when alive, runs the idempotent stage script. Repeats until
# all stages are done or the loop is killed.
PROBE='
import time
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
print("TPU_OK", jax.devices()[0].platform, f"{time.time()-t0:.1f}s")
'
while true; do
  if timeout 120 python -c "$PROBE" 2>/dev/null | grep -q TPU_OK; then
    echo "$(date +%H:%M:%S) tunnel alive — running stages"
    bash "$(dirname "$0")/stages.sh" >> /tmp/r2_out/stages.log 2>&1
    rc=$?
    if grep -q ALL_STAGES_DONE /tmp/r2_out/stages.log; then
      echo "$(date +%H:%M:%S) ALL STAGES DONE"
      break
    fi
    echo "$(date +%H:%M:%S) stages exited rc=$rc — will retry after probe"
    sleep 60
  else
    echo "$(date +%H:%M:%S) tunnel down — sleeping 180s"
    sleep 180
  fi
done
