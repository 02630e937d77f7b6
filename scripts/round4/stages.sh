#!/bin/bash
# Round-4 TPU work queue (VERDICT r3: fix the divergence, re-run the E2E
# to a GOOD number, land chamfer, run the deciding A/Bs). Ordered by
# information value (VERDICT r3 weak #5): the fixed production E2E and its
# metrics land FIRST; breadth stages follow.
#
# Advisor r3 fixes: set -o pipefail (tt_chain's tail swallowed failures);
# PAUSE_FILE honors NERF_EMITTER_PAUSE_FILE; the A/B arm renames the copied
# prod checkpoint below the seed step so orbax cannot silently skip saves
# (checkpoints.py now also fails loudly on a skipped save).
set -x
set -o pipefail
cd /root/repo
R3=/root/repo/outputs/r3
R4=/root/repo/outputs/r4
mkdir -p "$R4/done" "$R4/logs"

stage_done() { [ -f "$R4/done/$1" ]; }
mark() { touch "$R4/done/$1"; }

PAUSE_FILE=${NERF_EMITTER_PAUSE_FILE:-/tmp/nerf_emitter_pause}
wait_capture() {
  while [ -f "$PAUSE_FILE" ]; do
    local age=$(( $(date +%s) - $(stat -c %Y "$PAUSE_FILE" 2>/dev/null || echo 0) ))
    [ "$age" -gt 2700 ] && break
    sleep 5
  done
}

# append a metric JSON into RESULTS_r04.md the moment it lands (VERDICT r3
# weak #4: no more placeholder tables)
append_results() { # $1 = section title, $2 = json path
  {
    echo ""
    echo "### $1 ($(date -u +%FT%TZ))"
    echo '```json'
    cat "$2"
    echo ""
    echo '```'
  } >> /root/repo/RESULTS_r04.md
}

E2E_SPP=${E2E_SPP:-16}
E2E_ATT=${E2E_ATT:-8}
E2E_BATCH=${E2E_BATCH:-2}
TRAIN_FLAGS=(--datacfg.data "$R3/sceneB" --output-dir "$R4"
  --opt-config-name diffuse-12-relativel1-hqq-r128
  --pipeline.spp "$E2E_SPP" --pipeline.spp-attached "$E2E_ATT"
  --pipeline.batch-size "$E2E_BATCH"
  --steps-per-save 50 --steps-per-eval-image 10000)

# ---- data regen: the 19:28 host reboot wiped outputs/ (untracked).
# gen_data is seeded (--seed 0 default), so the regenerated GT matches
# round 3's bit-for-bit; stages are crash-resumable via --resume.
if ! stage_done sceneB; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.gen_data --object composite --albedo bands \
    --n-views 60 --width 128 --height 128 --spp 32 --path-type random \
    --resume --out "$R3/sceneB" > "$R4/logs/sceneB.log" 2>&1 || exit 1
  mark sceneB
fi

# gt mesh is CPU-only; rebuild it up front so chamfer never blocks on it
if ! stage_done gt_mesh; then
  {
    JAX_PLATFORMS=cpu python - <<PY &&
import numpy as np
from nerf_emitter_tpu.renderer.grid3d import composite_sdf_grid
np.save('$R3/gt_sdf.npy', np.asarray(composite_sdf_grid(129)))
PY
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --sdf-volume "$R3/gt_sdf.npy" --resolution 192 --output-dir "$R3/gt_mesh"
  } > "$R4/logs/gt_mesh.log" 2>&1 || exit 1
  mark gt_mesh
fi

# e2e_train (prod4) RETIRED: the 19:28 host reboot wiped its outputs, and
# the recipe it diverged under is no longer the default — re-running it
# would just duplicate pf_run (the fixed-recipe production baseline below)
# under a different name. pf_run with no prod4 seed re-pretrains 0..2000
# itself.
mark e2e_train
# e2e_eval SKIPPED: prod4 diverged after the 64->127 volume upsample
# (gnorm_sdf 131 -> 2108, RESULTS_r04.md addendum); prod4f (fixed recipe,
# below) is the evaluated baseline.
mark e2e_eval

# relight GT (rolled envmap) — regenerated post-reboot, same seed as r3
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
    > "$R4/logs/relight_gt.log" 2>&1 || exit 1
  mark relight_gt
fi

# relight_eval + chamfer on prod4 SKIPPED for the same reason as e2e_eval:
# the model is a diverged partial run; prod4f's pf_relight/pf_chamfer are
# the real deliverables.
mark relight_eval
mark chamfer

# ==== MINI decision chain (VERDICT r3 weak #5: decisive stages FIRST).
# The reboot wiped every round-4 artifact, so nothing has landed yet and
# the wall clock is short. This chain produces, within ~1-2h of queue
# time, the two numbers the round exists to produce, at honest-small
# scale ($MINI_PRE NeRF pretrain + 160 SDF mi-steps, same 128^2 pixel budget,
# same spp 16/8/batch 2, and crucially the SAME 64->127 volume upsample
# at mi-64 that triggered the prod4 blow-up — so it is a real test of
# the shipped combo fix at the production grid resolution):
#   1. does the FIXED recipe converge to good NVS/chamfer? (mini_pf)
#   2. does the distilled 6.3x emitter hold quality? (mini_dl -> gate)
# The full-scale prod4f/prod4_dl stages below supersede these numbers
# when they land; the gate is idempotent.
MINI_PRE=${MINI_PRE:-2000}
MINI_TOTAL=${MINI_TOTAL:-2160}
MINI_FLAGS=(--datacfg.data "$R3/sceneB" --output-dir "$R4"
  --opt-config-name diffuse-12-relativel1-hqq-r128
  --pipeline.spp "$E2E_SPP" --pipeline.spp-attached "$E2E_ATT"
  --pipeline.batch-size "$E2E_BATCH"
  --pipeline.takeover-step "$MINI_PRE"
  --max-num-iterations "$MINI_TOTAL" --train.max-steps "$MINI_TOTAL"
  --steps-per-save 80 --steps-per-eval-image 100000)

if ! stage_done mini_pf; then
  wait_capture
  echo "=== mini_pf attempt $(date +%H:%M:%S) ===" >> "$R4/logs/mini_pf.log"
  timeout 7200 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${MINI_FLAGS[@]}" --experiment-name prod_mini --resume \
    >> "$R4/logs/mini_pf.log" 2>&1 || exit 1
  mark mini_pf
fi
if ! stage_done mini_pf_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/prod_mini/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R4/mini_pf_metrics.json" \
    > "$R4/logs/mini_pf_eval.log" 2>&1 || exit 1
  append_results "MINI fixed-recipe baseline (${MINI_PRE}+160): NVS" "$R4/mini_pf_metrics.json"
  mark mini_pf_eval
fi
if ! stage_done mini_pf_chamfer; then
  {
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config "$R4/prod_mini/sdf-nerfacto/config.json" \
      --resolution 192 --output-dir "$R4/mini_pf_mesh" &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.chamfer \
      "$R4/mini_pf_mesh/mesh.ply" "$R3/gt_mesh/mesh.ply" \
      --output-path "$R4/chamfer_mini_pf.json"
  } > "$R4/logs/mini_pf_chamfer.log" 2>&1 || exit 1
  append_results "MINI fixed-recipe baseline (${MINI_PRE}+160): chamfer" "$R4/chamfer_mini_pf.json"
  mark mini_pf_chamfer
fi

# distilled arm: same frozen pretrained NeRF (NeRF is frozen in takeover,
# so prod_mini's latest checkpoint's NeRF subtree == step $MINI_PRE's)
if ! stage_done mini_dl; then
  wait_capture
  if [ ! -d "$R4/prod_mini_dl/sdf-nerfacto/checkpoints/$MINI_PRE" ]; then
    rm -rf "$R4/prod_mini_dl"
    mkdir -p "$R4/prod_mini_dl/sdf-nerfacto"
    cp -r "$R4/prod_mini/sdf-nerfacto/checkpoints" \
      "$R4/prod_mini_dl/sdf-nerfacto/checkpoints"
    latest=$(ls "$R4/prod_mini_dl/sdf-nerfacto/checkpoints" | sort -n | tail -1)
    [ "$latest" != "$MINI_PRE" ] && \
      mv "$R4/prod_mini_dl/sdf-nerfacto/checkpoints/$latest" \
         "$R4/prod_mini_dl/sdf-nerfacto/checkpoints/$MINI_PRE"
  fi
  echo "=== mini_dl attempt $(date +%H:%M:%S) ===" >> "$R4/logs/mini_dl.log"
  timeout 7200 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${MINI_FLAGS[@]}" --experiment-name prod_mini_dl \
    --pipeline.distill-emitter true \
    --resume --load-nerf-only --override-start-step "$MINI_PRE" \
    >> "$R4/logs/mini_dl.log" 2>&1 || exit 1
  mark mini_dl
fi
if ! stage_done mini_dl_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/prod_mini_dl/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R4/mini_dl_metrics.json" \
    > "$R4/logs/mini_dl_eval.log" 2>&1 || exit 1
  append_results "MINI distilled arm (${MINI_PRE}+160): NVS" "$R4/mini_dl_metrics.json"
  mark mini_dl_eval
fi
if ! stage_done mini_dl_chamfer; then
  {
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config "$R4/prod_mini_dl/sdf-nerfacto/config.json" \
      --resolution 192 --output-dir "$R4/mini_dl_mesh" &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.chamfer \
      "$R4/mini_dl_mesh/mesh.ply" "$R3/gt_mesh/mesh.ply" \
      --output-path "$R4/chamfer_mini_dl.json"
  } > "$R4/logs/mini_dl_chamfer.log" 2>&1 || exit 1
  append_results "MINI distilled arm (${MINI_PRE}+160): chamfer" "$R4/chamfer_mini_dl.json"
  mark mini_dl_chamfer
fi

# the gate, on the mini numbers (idempotent; the full-scale dl_decide
# below re-runs it on the production numbers when they land)
if ! stage_done mini_dl_decide; then
  {
    echo ""
    echo "_(gate below evaluated on the MINI ${MINI_PRE}+160 arms; the"
    echo "production-scale dl_decide re-confirms it when prod4f/prod4_dl"
    echo "land)_"
  } >> /root/repo/RESULTS_r04.md
  python scripts/round4/decide_distill.py \
    "$R4/mini_pf_metrics.json" "$R4/mini_dl_metrics.json" \
    "$R4/chamfer_mini_pf.json" "$R4/chamfer_mini_dl.json" \
    >> /root/repo/RESULTS_r04.md 2>"$R4/logs/mini_dl_decide.err" || exit 1
  mark mini_dl_decide
fi

# serving-throughput bench right after the gate so the flipped default is
# what the driver's end-of-round bench.py run measures
if ! stage_done mini_dl_bench; then
  wait_capture
  python bench.py > "$R4/bench_after_gate.json" 2>/dev/null || exit 1
  append_results "bench.py headline after the mini gate" "$R4/bench_after_gate.json"
  mark mini_dl_bench
fi

# mini relighting number for the pf arm (headline completeness)
if ! stage_done mini_pf_relight; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/prod_mini/sdf-nerfacto/config.json" \
    --emitter-path "$R3/env_relit.exr" --test-data "$R3/sceneB_relit" \
    --spp 32 --output-path "$R4/mini_relight_metrics.json" \
    > "$R4/logs/mini_pf_relight.log" 2>&1 || exit 1
  append_results "MINI fixed-recipe baseline (${MINI_PRE}+160): relighting" "$R4/mini_relight_metrics.json"
  mark mini_pf_relight
fi

# ---- prod4f: the production SDF phase RE-RUN with the full divergence
# fix (uniform_adam + lr_decay_at_up=0.25 shipped mid-round after prod4
# diverged past the 127^3 upsample: gnorm_sdf 131 -> 2108). Seeds from
# prod4's frozen NeRF pretrain; this is the fixed-recipe baseline the
# A/B arms compare against.
PF_FLAGS=("${TRAIN_FLAGS[@]}" --experiment-name prod4f)
if ! stage_done pf_run; then
  wait_capture
  if [ ! -d "$R4/prod4f/sdf-nerfacto/checkpoints/2000" ] \
     && [ -d "$R4/prod4/sdf-nerfacto/checkpoints" ]; then
    # seed from prod4's frozen NeRF pretrain (the NeRF is frozen during
    # takeover, so the latest prod4 checkpoint's NeRF state == step 2000's);
    # if a reboot wiped prod4, the --resume run below simply starts fresh
    # and re-pretrains 0..2000 itself
    rm -rf "$R4/prod4f"
    mkdir -p "$R4/prod4f/sdf-nerfacto"
    cp -r "$R4/prod4/sdf-nerfacto/checkpoints" "$R4/prod4f/sdf-nerfacto/"
    latest=$(ls "$R4/prod4f/sdf-nerfacto/checkpoints" | sort -n | tail -1)
    [ "$latest" != "2000" ] && mv "$R4/prod4f/sdf-nerfacto/checkpoints/$latest" \
      "$R4/prod4f/sdf-nerfacto/checkpoints/2000"
  fi
  echo "=== pf_run attempt $(date +%H:%M:%S) ===" >> "$R4/logs/pf_run.log"
  timeout 10800 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${PF_FLAGS[@]}" --resume --load-nerf-only --override-start-step 2000 \
    >> "$R4/logs/pf_run.log" 2>&1 || exit 1
  mark pf_run
fi
if ! stage_done pf_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/prod4f/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R4/e2e_metrics_pf.json" \
    > "$R4/logs/pf_eval.log" 2>&1 || exit 1
  append_results "FIXED-recipe prod baseline (prod4f): NVS" "$R4/e2e_metrics_pf.json"
  mark pf_eval
fi
if ! stage_done pf_relight; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/prod4f/sdf-nerfacto/config.json" \
    --emitter-path "$R3/env_relit.exr" --test-data "$R3/sceneB_relit" \
    --spp 32 --output-path "$R4/relight_metrics_pf.json" \
    > "$R4/logs/pf_relight.log" 2>&1 || exit 1
  append_results "FIXED-recipe prod baseline (prod4f): relighting" "$R4/relight_metrics_pf.json"
  mark pf_relight
fi
if ! stage_done pf_chamfer; then
  {
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config "$R4/prod4f/sdf-nerfacto/config.json" \
      --resolution 192 --output-dir "$R4/pf_mesh" &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.chamfer \
      "$R4/pf_mesh/mesh.ply" "$R3/gt_mesh/mesh.ply" \
      --output-path "$R4/chamfer_pf.json"
  } > "$R4/logs/pf_chamfer.log" 2>&1 || exit 1
  append_results "FIXED-recipe prod baseline (prod4f): chamfer" "$R4/chamfer_pf.json"
  mark pf_chamfer
fi

# ---- sdf-gt-envmap baseline on chip, full 320 steps (VERDICT r3 #8) +
# eval: isolates the SDF optimizer from the emitter bridge, and is the
# BASELINE.md staged config #2 deliverable
if ! stage_done envgt_train; then
  wait_capture
  echo "=== envgt attempt $(date +%H:%M:%S) ===" >> "$R4/logs/envgt.log"
  timeout 7200 python -m nerf_emitter_tpu.scripts.train sdf-gt-envmap \
    "${TRAIN_FLAGS[@]}" --experiment-name envgt --resume \
    >> "$R4/logs/envgt.log" 2>&1 || exit 1
  mark envgt_train
fi
if ! stage_done envgt_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/envgt/sdf-gt-envmap/config.json" \
    --spp 32 --output-path "$R4/envgt_metrics.json" \
    > "$R4/logs/envgt_eval.log" 2>&1 || exit 1
  append_results "sdf-gt-envmap baseline metrics" "$R4/envgt_metrics.json"
  mark envgt_eval
fi

# ---- distilled-emitter quality A/B: same trained NeRF, fresh SDF arm
# served by the light-field cache (serving/distill.py). Decides whether
# distill_emitter becomes the sdf-nerfacto default (the >=5x/chip lever).
DL_FLAGS=("${TRAIN_FLAGS[@]}" --experiment-name prod4_dl
  --pipeline.distill-emitter true)
if ! stage_done dl_run; then
  wait_capture
  if [ ! -d "$R4/prod4_dl/sdf-nerfacto/checkpoints/2000" ]; then
    seed="$R4/prod4/sdf-nerfacto/checkpoints"
    [ -d "$seed" ] || seed="$R4/prod4f/sdf-nerfacto/checkpoints"  # NeRF frozen in takeover: same pretrain
    rm -rf "$R4/prod4_dl"
    mkdir -p "$R4/prod4_dl/sdf-nerfacto"
    cp -r "$seed" "$R4/prod4_dl/sdf-nerfacto/checkpoints"
    latest=$(ls "$R4/prod4_dl/sdf-nerfacto/checkpoints" | sort -n | tail -1)
    [ "$latest" != "2000" ] && mv "$R4/prod4_dl/sdf-nerfacto/checkpoints/$latest" \
      "$R4/prod4_dl/sdf-nerfacto/checkpoints/2000"
  fi
  echo "=== dl_run attempt $(date +%H:%M:%S) ===" >> "$R4/logs/dl_run.log"
  timeout 10800 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${DL_FLAGS[@]}" --resume --load-nerf-only --override-start-step 2000 \
    >> "$R4/logs/dl_run.log" 2>&1 || exit 1
  mark dl_run
fi
if ! stage_done dl_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/prod4_dl/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R4/e2e_metrics_dl.json" \
    > "$R4/logs/dl_eval.log" 2>&1 || exit 1
  append_results "A/B distilled emitter: NVS" "$R4/e2e_metrics_dl.json"
  mark dl_eval
fi
if ! stage_done dl_relight; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/prod4_dl/sdf-nerfacto/config.json" \
    --emitter-path "$R3/env_relit.exr" --test-data "$R3/sceneB_relit" \
    --spp 32 --output-path "$R4/relight_metrics_dl.json" \
    > "$R4/logs/dl_relight.log" 2>&1 || exit 1
  append_results "A/B distilled emitter: relighting" "$R4/relight_metrics_dl.json"
  mark dl_relight
fi
if ! stage_done dl_chamfer; then
  {
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config "$R4/prod4_dl/sdf-nerfacto/config.json" \
      --resolution 192 --output-dir "$R4/dl_mesh" &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.chamfer \
      "$R4/dl_mesh/mesh.ply" "$R3/gt_mesh/mesh.ply" \
      --output-path "$R4/chamfer_dl.json"
  } > "$R4/logs/dl_chamfer.log" 2>&1 || exit 1
  append_results "A/B distilled emitter: chamfer" "$R4/chamfer_dl.json"
  mark dl_chamfer
fi
if ! stage_done dl_bench; then
  wait_capture
  NERF_EMITTER_BENCH_DISTILLED=1 python bench.py \
    > "$R4/bench_distilled.json" 2>/dev/null || exit 1
  append_results "Distilled emitter serving throughput" "$R4/bench_distilled.json"
  mark dl_bench
fi

# decide the distilled-emitter default from the landed A/B numbers (the
# queue outlives the interactive session; the gate must not hang on it)
if ! stage_done dl_decide; then
  python scripts/round4/decide_distill.py \
    "$R4/e2e_metrics_pf.json" "$R4/e2e_metrics_dl.json" \
    "$R4/chamfer_pf.json" "$R4/chamfer_dl.json" \
    >> /root/repo/RESULTS_r04.md 2>"$R4/logs/dl_decide.err" || exit 1
  mark dl_decide
fi

# ---- A/B arm: same trained NeRF, fresh SDF, reduced emitter sample
# schedule (128, 48, 24), equal step budget (VERDICT r3 #3).
AB_FLAGS=("${TRAIN_FLAGS[@]}" --experiment-name prod4_ab
  --pipeline.emitter-samples "[128, 48, 24]")
if ! stage_done ab_run; then
  wait_capture
  if [ ! -d "$R4/prod4_ab/sdf-nerfacto/checkpoints/2000" ]; then
    seed="$R4/prod4/sdf-nerfacto/checkpoints"
    [ -d "$seed" ] || seed="$R4/prod4f/sdf-nerfacto/checkpoints"  # NeRF frozen in takeover: same pretrain
    rm -rf "$R4/prod4_ab"
    mkdir -p "$R4/prod4_ab/sdf-nerfacto"
    cp -r "$seed" "$R4/prod4_ab/sdf-nerfacto/checkpoints"
    # rename the prod checkpoint below the takeover step: orbax silently
    # skips saves at steps <= latest (advisor r3 high), and the trainer
    # resumes takeover from step 2000 with --load-nerf-only
    latest=$(ls "$R4/prod4_ab/sdf-nerfacto/checkpoints" | sort -n | tail -1)
    [ "$latest" != "2000" ] && mv "$R4/prod4_ab/sdf-nerfacto/checkpoints/$latest" \
      "$R4/prod4_ab/sdf-nerfacto/checkpoints/2000"
  fi
  echo "=== ab_run attempt $(date +%H:%M:%S) ===" >> "$R4/logs/ab_run.log"
  timeout 10800 python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${AB_FLAGS[@]}" --resume --load-nerf-only --override-start-step 2000 \
    >> "$R4/logs/ab_run.log" 2>&1 || exit 1
  mark ab_run
fi
if ! stage_done ab_eval; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/prod4_ab/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R4/e2e_metrics_ab.json" \
    > "$R4/logs/ab_eval.log" 2>&1 || exit 1
  append_results "A/B reduced emitter schedule: NVS" "$R4/e2e_metrics_ab.json"
  mark ab_eval
fi
if ! stage_done ab_relight; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R4/prod4_ab/sdf-nerfacto/config.json" \
    --emitter-path "$R3/env_relit.exr" --test-data "$R3/sceneB_relit" \
    --spp 32 --output-path "$R4/relight_metrics_ab.json" \
    > "$R4/logs/ab_relight.log" 2>&1 || exit 1
  append_results "A/B reduced emitter schedule: relighting" "$R4/relight_metrics_ab.json"
  mark ab_relight
fi
if ! stage_done ab_chamfer; then
  {
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config "$R4/prod4_ab/sdf-nerfacto/config.json" \
      --resolution 192 --output-dir "$R4/ab_mesh" &&
    JAX_PLATFORMS=cpu python -m nerf_emitter_tpu.scripts.chamfer \
      "$R4/ab_mesh/mesh.ply" "$R3/gt_mesh/mesh.ply" \
      --output-path "$R4/chamfer_ab.json"
  } > "$R4/logs/ab_chamfer.log" 2>&1 || exit 1
  append_results "A/B reduced emitter schedule: chamfer" "$R4/chamfer_ab.json"
  mark ab_chamfer
fi

# ---- freq-vs-hash quality A/B (VERDICT r3 #6): 2 scenes x 2 impls
if ! stage_done scene_v; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.gen_data --object sphere --albedo const \
    --n-views 40 --width 96 --height 96 --spp 32 --path-type random \
    --resume --out "$R4/scene_v" > "$R4/logs/scene_v.log" 2>&1 || exit 1
  mark scene_v
fi
for scene in "$R3/sceneB" "$R4/scene_v"; do
  sname=$(basename "$scene")
  for impl in freq hash; do
    name="fh_${sname}_${impl}"
    if ! stage_done "$name"; then
      wait_capture
      timeout 7200 python -m nerf_emitter_tpu.scripts.train hdr-nerfacto \
        --datacfg.data "$scene" --experiment-name "${name}" --output-dir "$R4/fh" \
        --model.implementation "${impl}" --train.num-rays-per-batch 16384 \
        --max-num-iterations 2000 --train.max-steps 2000 \
        --steps-per-save 2000 --steps-per-eval-image 4000 \
        > "$R4/logs/${name}.log" 2>&1 || exit 1
      python -m nerf_emitter_tpu.scripts.eval \
        --load-config "$R4/fh/${name}/hdr-nerfacto/config.json" \
        --spp 1 --output-path "$R4/${name}_metrics.json" \
        >> "$R4/logs/${name}.log" 2>&1 || exit 1
      append_results "freq-vs-hash: ${name}" "$R4/${name}_metrics.json"
      mark "$name"
    fi
  done
done

# ---- real-capture chain (turntable + occlusion + hdr->sdf chaining)
if ! stage_done tt_scene; then
  wait_capture
  python -m nerf_emitter_tpu.scripts.gen_data --object composite --albedo bands \
    --n-views 60 --width 128 --height 128 --spp 32 --n-rotations 3 \
    --path-type spiral --resume --out "$R4/scene_tt" \
    > "$R4/logs/tt_scene.log" 2>&1 || exit 1
  mark tt_scene
fi
if ! stage_done tt_chain; then
  wait_capture
  PRETRAIN=800 TOTAL=880 OUT="$R4/tt" EXPORT_RES=128 RENDER_SPP=16 \
    bash scripts/real/ours/run.sh "$R4/scene_tt" tt \
    > "$R4/logs/tt_chain.log" 2>&1 || exit 1
  tail -50 "$R4/logs/tt_chain.log" > "$R4/logs/tt_chain_tail.log"
  mark tt_chain
fi

echo ALL_STAGES_DONE
