#!/bin/bash
# Round-3 TPU work queue: a COMPLETE (reduced-scale) production E2E that
# fits a ~1h round, plus the emitter-sample-schedule A/B arm (VERDICT r2
# items 1 and 3). The round-2 queue's /tmp state was wiped by a host
# reboot, so all run state now lives under /root/repo/outputs/r3 (survives
# reboots AND rounds — later rounds resume via the same idempotent
# markers).
#
# Scale rationale: round 2 measured 233 s/takeover-step at 256^2/spp64/
# batch4 — a full-res rerun cannot complete in-round over this tunnel.
# This queue keeps the reference SCHEDULE (2000 NeRF + 320 SDF, upsample
# + EMA swap + guiding cadence, aggregate estimator via spp 32 >
# spp_attached 16) and shrinks the pixel budget: 128^2 captures, batch 2,
# opt config diffuse-12-relativel1-hqq-r128 (grid 64->127; a 253^3 grid
# out-resolves 128^2 pixels).
set -x
cd /root/repo
R3=/root/repo/outputs/r3
mkdir -p "$R3/done" "$R3/logs"

stage_done() { [ -f "$R3/done/$1" ]; }
mark() { touch "$R3/done/$1"; }

# yield to driver bench/multichip captures (utils/capture_lock.py)
wait_capture() {
  while [ -f /tmp/nerf_emitter_pause ]; do
    local age=$(( $(date +%s) - $(stat -c %Y /tmp/nerf_emitter_pause 2>/dev/null || echo 0) ))
    [ "$age" -gt 2700 ] && break
    sleep 5
  done
}

# spp 16 with spp_attached 8 keeps the reference's AGGREGATE estimator
# structure (spp > spp_attached) at half the spp-32 step cost — the
# measured takeover budget at spp 32 (~48 min) would not leave room for
# the A/B arm inside a round.
E2E_SPP=${E2E_SPP:-16}
E2E_ATT=${E2E_ATT:-8}
E2E_BATCH=${E2E_BATCH:-2}
TRAIN_FLAGS=(--datacfg.data "$R3/sceneB" --output-dir "$R3"
  --opt-config-name diffuse-12-relativel1-hqq-r128
  --pipeline.spp "$E2E_SPP" --pipeline.spp-attached "$E2E_ATT"
  --pipeline.batch-size "$E2E_BATCH"
  --steps-per-save 50 --steps-per-eval-image 10000)

# ---- scene: 128^2 composite object, banded albedo, 60 views, spp 32
if ! stage_done sceneB; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.gen_data --object composite --albedo bands \
    --n-views 60 --width 128 --height 128 --spp 32 --path-type random \
    --resume --out "$R3/sceneB" > "$R3/logs/sceneB.log" 2>&1 || exit 1
  mark sceneB
fi

# ---- E2E at the reference schedule (2000 NeRF + 320 SDF)
if ! stage_done e2e_train; then
  wait_capture
  echo "=== e2e_train attempt $(date +%H:%M:%S) ===" >> "$R3/logs/e2e_train.log"
  timeout 10800 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${TRAIN_FLAGS[@]}" --experiment-name prod --resume \
    >> "$R3/logs/e2e_train.log" 2>&1 || exit 1
  mark e2e_train
fi

# ---- NVS eval on the held-out split
if ! stage_done e2e_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R3/prod/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R3/e2e_metrics.json" \
    > "$R3/logs/e2e_eval.log" 2>&1 || exit 1
  mark e2e_eval
fi

# ---- relighting GT (rolled envmap) + relighting eval
if ! stage_done relight_gt; then
  wait_capture
  python - <<PY || exit 1
import numpy as np
from nerf_emitter_tpu.utils import exr
img = exr.read_exr('$R3/sceneB/env.exr')
exr.write_exr('$R3/env_relit.exr', np.roll(img[..., :3], img.shape[1] // 2, axis=1))
PY
  python -m nerf_emitter_tpu.scripts.gen_data --object composite --albedo bands \
    --envmap "$R3/env_relit.exr" --n-views 30 --width 128 --height 128 \
    --spp 32 --path-type random --resume --out "$R3/sceneB_relit" \
    > "$R3/logs/relight_gt.log" 2>&1 || exit 1
  mark relight_gt
fi
if ! stage_done relight_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R3/prod/sdf-nerfacto/config.json" \
    --emitter-path "$R3/env_relit.exr" --test-data "$R3/sceneB_relit" \
    --spp 32 --output-path "$R3/relight_metrics.json" \
    > "$R3/logs/relight_eval.log" 2>&1 || exit 1
  mark relight_eval
fi

# ---- chamfer vs the analytic GT SDF (CPU)
if ! stage_done chamfer; then
  {
    python - <<PY &&
import numpy as np
from nerf_emitter_tpu.renderer.grid3d import composite_sdf_grid
np.save('$R3/gt_sdf.npy', np.asarray(composite_sdf_grid(129)))
PY
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --sdf-volume "$R3/gt_sdf.npy" --resolution 192 \
      --output-dir "$R3/gt_mesh" &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config "$R3/prod/sdf-nerfacto/config.json" \
      --resolution 192 --output-dir "$R3/prod_mesh" &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.chamfer \
      "$R3/prod_mesh/mesh.ply" "$R3/gt_mesh/mesh.ply" \
      --output-path "$R3/chamfer.json"
  } > "$R3/logs/chamfer.log" 2>&1 || exit 1
  mark chamfer
fi

# ---- emitter sample-schedule rel-RMS profile on the TRAINED field
# (advisor r2: the random-init profile wasn't representative)
if ! stage_done emitter_profile; then
  wait_capture
  timeout 2400 python scripts/profile_emitter_samples.py \
    --load-config "$R3/prod/sdf-nerfacto/config.json" \
    > "$R3/logs/emitter_profile.log" 2>&1 || exit 1
  mark emitter_profile
fi

# ---- A/B arm: same trained NeRF, fresh SDF, reduced emitter sample
# schedule (128, 48, 24) — full 320 mi-steps so the arms are equal-budget.
AB_FLAGS=("${TRAIN_FLAGS[@]}" --experiment-name prod_ab
  --pipeline.emitter-samples "[128, 48, 24]")
if ! stage_done ab_seed; then
  wait_capture
  rm -rf "$R3/prod_ab"
  mkdir -p "$R3/prod_ab/sdf-nerfacto"
  cp -r "$R3/prod/sdf-nerfacto/checkpoints" "$R3/prod_ab/sdf-nerfacto/"
  timeout 3600 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${AB_FLAGS[@]}" --max-num-iterations 2001 \
    --resume --load-nerf-only --override-start-step 2000 \
    > "$R3/logs/ab_seed.log" 2>&1 || exit 1
  mark ab_seed
fi
if ! stage_done ab_run; then
  wait_capture
  timeout 10800 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${AB_FLAGS[@]}" --resume \
    > "$R3/logs/ab_run.log" 2>&1 || exit 1
  mark ab_run
fi
if ! stage_done ab_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R3/prod_ab/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R3/e2e_metrics_ab.json" \
    > "$R3/logs/ab_eval.log" 2>&1 || exit 1
  mark ab_eval
fi

# ---- A/B relight (the relight metric is the one the schedule could hurt:
# emitter radiance enters relit renders only through the trained geometry)
if ! stage_done ab_relight; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R3/prod_ab/sdf-nerfacto/config.json" \
    --emitter-path "$R3/env_relit.exr" --test-data "$R3/sceneB_relit" \
    --spp 32 --output-path "$R3/relight_metrics_ab.json" \
    > "$R3/logs/ab_relight.log" 2>&1 || exit 1
  mark ab_relight
fi
if ! stage_done ab_chamfer; then
  {
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config "$R3/prod_ab/sdf-nerfacto/config.json" \
      --resolution 192 --output-dir "$R3/ab_mesh" &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.chamfer \
      "$R3/ab_mesh/mesh.ply" "$R3/gt_mesh/mesh.ply" \
      --output-path "$R3/chamfer_ab.json"
  } > "$R3/logs/ab_chamfer.log" 2>&1 || exit 1
  mark ab_chamfer
fi

# =======================================================================
# Late stages (VERDICT r2 items 5 and 6) — run when the E2E + A/B are
# done; idempotent markers let later rounds resume here.
# =======================================================================

# ---- freq-vs-hash quality A/B (two scenes; hdr-nerfacto 2000 steps each)
if ! stage_done scene_v; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.gen_data --object sphere --albedo const \
    --n-views 40 --width 96 --height 96 --spp 32 --path-type random \
    --resume --out "$R3/scene_v" > "$R3/logs/scene_v.log" 2>&1 || exit 1
  mark scene_v
fi
for scene in "$R3/sceneB" "$R3/scene_v"; do
  sname=$(basename "$scene")
  for impl in freq hash; do
    name="ab_${sname}_${impl}"
    if ! stage_done "$name"; then
      wait_capture
      timeout 7200 python -m nerf_emitter_tpu.scripts.train hdr-nerfacto \
        --datacfg.data "$scene" --experiment-name "${name}" --output-dir "$R3/fh" \
        --model.implementation "${impl}" --train.num-rays-per-batch 16384 \
        --max-num-iterations 2000 --train.max-steps 2000 \
        --steps-per-save 2000 --steps-per-eval-image 4000 \
        > "$R3/logs/${name}.log" 2>&1 || exit 1
      python -m nerf_emitter_tpu.scripts.eval \
        --load-config "$R3/fh/${name}/hdr-nerfacto/config.json" \
        --spp 1 --output-path "$R3/${name}_metrics.json" \
        >> "$R3/logs/${name}.log" 2>&1 || exit 1
      mark "$name"
    fi
  done
done

# ---- real-capture chain (turntable rotations + occlusion compositing)
if ! stage_done tt_scene; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.gen_data --object composite --albedo bands \
    --n-views 60 --width 128 --height 128 --spp 32 --n-rotations 3 \
    --path-type spiral --resume --out "$R3/scene_tt" \
    > "$R3/logs/tt_scene.log" 2>&1 || exit 1
  mark tt_scene
fi
if ! stage_done tt_chain; then
  wait_capture
  PRETRAIN=800 TOTAL=880 OUT="$R3/tt" EXPORT_RES=128 RENDER_SPP=16 \
    bash scripts/real/ours/run.sh "$R3/scene_tt" tt 2>&1 \
    | tail -300 > "$R3/logs/tt_chain.log" || exit 1
  mark tt_chain
fi

echo ALL_STAGES_DONE
