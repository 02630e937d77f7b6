#!/bin/bash
# Round-2 TPU work queue. Stages are idempotent: each leaves a marker in
# /tmp/r2_done/<stage> on success and is skipped thereafter. The outer
# loop (r2_loop.sh) retries after tunnel crashes.
set -x
cd /root/repo
mkdir -p /tmp/r2_done /tmp/r2_out

stage_done() { [ -f "/tmp/r2_done/$1" ]; }
mark() { touch "/tmp/r2_done/$1"; }

# Driver capture windows (bench.py / dryrun_multichip touch
# /tmp/nerf_emitter_pause; see nerf_emitter_tpu/utils/capture_lock.py):
# never LAUNCH a new stage while one is open — running stages already
# yield between dispatches via capture_lock.checkpoint().
wait_capture() {
  while [ -f /tmp/nerf_emitter_pause ]; do
    local age=$(( $(date +%s) - $(stat -c %Y /tmp/nerf_emitter_pause 2>/dev/null || echo 0) ))
    [ "$age" -gt 2700 ] && break  # stale sentinel: crashed capturer
    sleep 5
  done
}

# ---- stage 0: kernel profile (two-kernel vs pipelined megakernel) — fast,
# runs first so the perf A/B lands before the multi-hour E2E occupies the chip
if ! stage_done profile_pipe; then
  timeout 1500 python scripts/profile_query.py > /tmp/r2_out/profile_pipe.log 2>&1 || exit 1
  mark profile_pipe
fi

# ---- stage 1: production scene (composite object, banded albedo, 256^2)
if ! stage_done sceneA; then
  python -m nerf_emitter_tpu.scripts.gen_data --object composite --albedo bands \
    --n-views 100 --width 256 --height 256 --spp 64 --path-type random \
    --resume --out /tmp/sceneA || exit 1
  mark sceneA
fi

# ---- stage 2: production E2E sdf-nerfacto at the reference schedule
# 2000 NeRF + 320 SDF steps, batch 4, spp 64 (aggregate estimator,
# attached 16), takeover render res 64 -> 128 -> 256 (upsample schedule),
# vMF guiding 32768 points / 64 clusters, EMA swap at mi-step 319.
# E2E_SPP / E2E_BATCH shrink the run for a tight window (defaults =
# reference-scale spp 64, batch 4).
E2E_SPP=${E2E_SPP:-64}
E2E_BATCH=${E2E_BATCH:-4}
if ! stage_done e2e_train; then
  # timeout: a tunnel freeze must fail the stage (loop retries + --resume)
  # rather than hang it forever; saves every 50 steps bound the redo to
  # ~50 takeover steps after a crash.
  echo "=== e2e_train attempt $(date +%H:%M:%S) ===" >> /tmp/r2_out/e2e_train.log
  timeout 21600 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    --datacfg.data /tmp/sceneA --experiment-name prod --output-dir /tmp/r2_out \
    --pipeline.spp "$E2E_SPP" --pipeline.batch-size "$E2E_BATCH" \
    --steps-per-save 50 --steps-per-eval-image 10000 \
    --resume \
    >> /tmp/r2_out/e2e_train.log 2>&1 || exit 1
  mark e2e_train
fi

# ---- stage 3: eval at spp 64 (NVS metrics on the held-out split)
if ! stage_done e2e_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config /tmp/r2_out/prod/sdf-nerfacto/config.json \
    --spp 64 --output-path /tmp/r2_out/e2e_metrics.json \
    > /tmp/r2_out/e2e_eval.log 2>&1 || exit 1
  mark e2e_eval
fi

# =======================================================================
# round-3 stages (VERDICT r2 items 1, 3, 5): chamfer vs the GT mesh,
# trained-field emitter-schedule profile, and the full takeover A/B arm
# with the reduced emitter sample schedule.
# =======================================================================
mkdir -p /tmp/r3

# ---- r3 stage: GT mesh + prod mesh + chamfer (reference scripts/chamfer.py)
if ! stage_done r3_chamfer; then
  wait_capture
  {
    python - <<'PY' &&
import numpy as np
from nerf_emitter_tpu.renderer.grid3d import composite_sdf_grid
np.save('/tmp/sceneA/gt_sdf.npy', np.asarray(composite_sdf_grid(129)))
PY
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --sdf-volume /tmp/sceneA/gt_sdf.npy --resolution 256 \
      --output-dir /tmp/r3/gt_mesh &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config /tmp/r2_out/prod/sdf-nerfacto/config.json \
      --resolution 256 --output-dir /tmp/r3/prod_mesh &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.chamfer \
      /tmp/r3/prod_mesh/mesh.ply /tmp/r3/gt_mesh/mesh.ply \
      --output-path /tmp/r2_out/chamfer.json
  } > /tmp/r2_out/r3_chamfer.log 2>&1 || exit 1
  mark r3_chamfer
fi

# ---- r3 stage: builder-side bench refresh on a quiet chip
if ! stage_done r3_bench; then
  wait_capture
  timeout 1800 python bench.py > /tmp/r2_out/r3_bench.json \
    2> /tmp/r2_out/r3_bench.log || exit 1
  mark r3_bench
fi

# ---- r3 stage: reduced-schedule query bench (the A/B arm's throughput) —
# runs BEFORE the multi-hour A/B arm so the number lands this round
if ! stage_done r3_bench_reduced; then
  wait_capture
  NERF_EMITTER_BENCH_SAMPLES=128,48,24 timeout 1800 python bench.py \
    > /tmp/r2_out/r3_bench_reduced.json \
    2> /tmp/r2_out/r3_bench_reduced.log || exit 1
  mark r3_bench_reduced
fi

# ---- relighting GT + relighting eval BEFORE the A/B arm: the prod
# metrics (VERDICT #1) outrank the schedule A/B if the round ends first.
# 50 views / spp 32 keeps the GT gen ~1h.
if ! stage_done relight_gt; then
  python - <<'PY' || exit 1
import numpy as np
from nerf_emitter_tpu.utils import exr
img = exr.read_exr('/tmp/sceneA/env.exr')
exr.write_exr('/tmp/env_relit.exr', np.roll(img[..., :3], img.shape[1] // 2, axis=1))
PY
  python -m nerf_emitter_tpu.scripts.gen_data --object composite --albedo bands \
    --envmap /tmp/env_relit.exr --n-views 50 --width 256 --height 256 \
    --spp 32 --path-type random --resume --out /tmp/sceneA_relit || exit 1
  mark relight_gt
fi
if ! stage_done relight_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config /tmp/r2_out/prod/sdf-nerfacto/config.json \
    --emitter-path /tmp/env_relit.exr --test-data /tmp/sceneA_relit \
    --spp 64 --output-path /tmp/r2_out/relight_metrics.json \
    > /tmp/r2_out/relight_eval.log 2>&1 || exit 1
  mark relight_eval
fi

# ---- r3 stage: emitter sample-schedule rel-RMS on the TRAINED field
if ! stage_done r3_emitter_ab_profile; then
  wait_capture
  timeout 2400 python scripts/profile_emitter_samples.py \
    --load-config /tmp/r2_out/prod/sdf-nerfacto/config.json \
    > /tmp/r2_out/r3_emitter_profile.log 2>&1 || exit 1
  mark r3_emitter_ab_profile
fi

# ---- r3 stage: takeover A/B arm — same trained NeRF, fresh SDF, reduced
# emitter sample schedule (128, 48, 24). Quality delta < 0.1 dB vs the
# default-schedule prod run makes the reduced schedule the default.
# Bounded to mi-150 (global 2150): prod stopped at the 2150 checkpoint
# (233 s/step at 256^2 res made the full 320-step tail a ~10h run), so
# equal-step eval at 2150 is the clean comparison that fits the round.
# Two sub-stages so crash-retries never re-discard the arm's SDF progress:
# the one-time SEED drops the prod SDF state (--load-nerf-only) and runs a
# single takeover step; the CONTINUE stage is a plain idempotent --resume.
AB_FLAGS=(--datacfg.data /tmp/sceneA --experiment-name prod_ab
  --output-dir /tmp/r2_out
  --pipeline.spp "$E2E_SPP" --pipeline.batch-size "$E2E_BATCH"
  --pipeline.emitter-samples "[128, 48, 24]"
  --steps-per-save 50 --steps-per-eval-image 10000)
if ! stage_done r3_ab_seed; then
  wait_capture
  rm -rf /tmp/r2_out/prod_ab
  mkdir -p /tmp/r2_out/prod_ab/sdf-nerfacto
  cp -r /tmp/r2_out/prod/sdf-nerfacto/checkpoints /tmp/r2_out/prod_ab/sdf-nerfacto/
  timeout 3600 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${AB_FLAGS[@]}" --max-num-iterations 2001 \
    --resume --load-nerf-only --override-start-step 2000 \
    > /tmp/r2_out/r3_ab_seed.log 2>&1 || exit 1
  mark r3_ab_seed
fi
if ! stage_done r3_takeover_ab; then
  wait_capture
  timeout 16200 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${AB_FLAGS[@]}" --resume --max-num-iterations 2150 \
    > /tmp/r2_out/r3_takeover_ab.log 2>&1 || exit 1
  mark r3_takeover_ab
fi
if ! stage_done r3_eval_ab; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config /tmp/r2_out/prod_ab/sdf-nerfacto/config.json \
    --spp 64 --output-path /tmp/r2_out/e2e_metrics_ab.json \
    > /tmp/r2_out/r3_eval_ab.log 2>&1 || exit 1
  mark r3_eval_ab
fi

# ---- stage 5: freq-vs-hash A/B (sceneA full res + a second scene)
if ! stage_done scene_v; then
  python -m nerf_emitter_tpu.scripts.gen_data --object sphere --albedo const \
    --n-views 60 --width 192 --height 192 --spp 48 --path-type random \
    --resume --out /tmp/scene_v || exit 1
  mark scene_v
fi
for scene in /tmp/sceneA /tmp/scene_v; do
  sname=$(basename $scene)
  for impl in freq hash; do
    name="ab_${sname}_${impl}"
    if ! stage_done $name; then
      python -m nerf_emitter_tpu.scripts.train hdr-nerfacto \
        --datacfg.data $scene --experiment-name ${name} --output-dir /tmp/ab \
        --model.implementation ${impl} --train.num-rays-per-batch 16384 \
        --max-num-iterations 2000 --train.max-steps 2000 \
        --steps-per-save 2000 --steps-per-eval-image 4000 \
        > /tmp/r2_out/${name}.log 2>&1 || exit 1
      python -m nerf_emitter_tpu.scripts.eval \
        --load-config /tmp/ab/${name}/hdr-nerfacto/config.json \
        --spp 1 --output-path /tmp/r2_out/${name}_metrics.json \
        >> /tmp/r2_out/${name}.log 2>&1 || exit 1
      mark $name
    fi
  done
done

# ---- stage 6: real-capture chain (turntable + occlusion) at honest-small
if ! stage_done tt_scene; then
  python -m nerf_emitter_tpu.scripts.gen_data --object composite --albedo bands \
    --n-views 60 --width 128 --height 128 --spp 32 --n-rotations 3 \
    --path-type spiral --resume --out /tmp/scene_tt || exit 1
  mark tt_scene
fi
if ! stage_done tt_chain; then
  PRETRAIN=800 TOTAL=880 OUT=/tmp/r2_out/tt EXPORT_RES=128 RENDER_SPP=16 bash scripts/real/ours/run.sh /tmp/scene_tt tt 2>&1 \
    | tail -200 > /tmp/r2_out/tt_chain.log || exit 1
  mark tt_chain
fi

echo ALL_STAGES_DONE
