#!/bin/bash
# Post-stage chip work: runs after loop.sh prints ALL STAGES DONE.
# Idempotent like stages.sh (markers in /tmp/r2_done).
set -x
cd /root/repo
mkdir -p /tmp/r2_done /tmp/r2_out

stage_done() { [ -f "/tmp/r2_done/$1" ]; }
mark() { touch "/tmp/r2_done/$1"; }

# emitter sample-schedule A/B (pipeline.emitter-samples knob)
if ! stage_done prof_samples; then
  timeout 1800 python scripts/profile_emitter_samples.py \
    > /tmp/r2_out/prof_samples.log 2>&1 || exit 1
  mark prof_samples
fi

# shard_map fused query under a real-TPU mesh (1-wide; 8-wide parity is
# the CPU-mesh test) — proves the fused path serves under a mesh on chip
if ! stage_done fused_mesh; then
  timeout 1200 python scripts/round2/fused_mesh_smoke.py \
    > /tmp/r2_out/fused_mesh.log 2>&1 || exit 1
  mark fused_mesh
fi

# refresh the headline bench number with the pipelined megakernel default
if ! stage_done bench_r2; then
  timeout 1200 python bench.py > /tmp/r2_out/bench_r2.log 2>&1 || exit 1
  mark bench_r2
fi

echo FOLLOWUP_DONE
