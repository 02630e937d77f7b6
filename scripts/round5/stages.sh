#!/bin/bash
# Round-5 TPU work queue (VERDICT r4: land trustworthy production-scale
# numbers). Ordered by information value:
#   1. on-chip numerics tier (metric trust — everything downstream reads it)
#   2. mini re-evals with FIXED metrics + the chamfer that wedged round 4
#   3. prod5f: the 2000+320 production E2E -> NVS/relight/chamfer
#   4. distilled-emitter A/B at production scale -> gate -> bench
#   5. sample-schedule A/B (equal-step, mini scale, same frozen pretrain)
#   6. freq-vs-hash quality A/B, real-capture chain, sdf-gt-envmap baseline
#
# Advisor r4 fixes baked in:
# - (high) every baseline sdf-nerfacto arm pins --pipeline.distill-emitter
#   false and the full sample schedule, so a gate flip mid-queue cannot
#   contaminate an A/B arm;
# - (medium) gates are a committed data file (configs/gates.json) written
#   by decide_*.py — failed gates WRITE false (reverting any earlier flip);
# - stage logs APPEND (>>) so retries never destroy tracebacks
#   (VERDICT r4 weak #2), and each stage is capped at MAX_FAILS attempts,
#   after which it is skipped LOUDLY (log tail into RESULTS_r05.md);
# - every landed JSON is copied to results/r5/ and committed immediately
#   (VERDICT r4 weak #6: artifacts must outlive host reboots).
set -x
set -o pipefail
cd /root/repo
R3=/root/repo/outputs/r3
R4=/root/repo/outputs/r4
R5=/root/repo/outputs/r5
RES=/root/repo/results/r5
mkdir -p "$R5/done" "$R5/logs" "$R5/fails" "$RES"

stage_done() { [ -f "$R5/done/$1" ]; }
mark() { touch "$R5/done/$1"; }
MAX_FAILS=3

# Retry cap: a stage that has failed MAX_FAILS times is skipped loudly
# (its log tail lands in RESULTS_r05.md) instead of wedging the queue
# forever (round 4 lost its whole deliverable chain to one such wedge).
# Returns 0 if the stage should be SKIPPED.
check_fails() { # $1 = stage name
  local n
  n=$(cat "$R5/fails/$1" 2>/dev/null || echo 0)
  if [ "$n" -ge "$MAX_FAILS" ]; then
    if ! stage_done "$1.skipped"; then
      {
        echo ""
        echo "### STAGE $1 SKIPPED after $n failures ($(date -u +%FT%TZ))"
        echo '```'
        tail -25 "$R5/logs/$1.log" 2>/dev/null
        echo '```'
      } >> /root/repo/RESULTS_r05.md
      (cd /root/repo && git add RESULTS_r05.md \
        && git commit -q -m "Queue: stage $1 skipped after $n failures" \
             -- RESULTS_r05.md) || true
      mark "$1.skipped"
    fi
    return 0
  fi
  return 1
}
fail() { # $1 = stage name; bump the counter and stop this pass.
  # Only count failures that happen with a LIVE tunnel: a stage killed by
  # an axon outage mid-run is environmental, and charging it against the
  # retry cap would let a flaky tunnel permanently skip a healthy stage.
  # The aliveness probe must do a FRESH COMPILE: the 00:05Z wedge mode
  # passes tiny cached-program probes while hanging any new compilation,
  # which would charge environmental hangs against the stage retry cap.
  # Cool down first: the axon server serializes sessions, and a client
  # killed a moment ago lingers server-side; probing immediately would
  # block behind it — and a timeout-killed probe leaves ANOTHER zombie
  # (the self-sustaining 23:49-00:46Z wedge). Patient 300s probe.
  sleep 90
  if timeout 300 python -c '
import time, jax, jax.numpy as jnp
n = 128 + int(time.time() * 1e6) % 97
x = jnp.ones((n, n)); (x @ x).sum().block_until_ready()
y = jnp.ones((16 * 1024 * 1024,), jnp.float32)  # HBM-wedge check: >=64MB alloc
y[-1].block_until_ready(); print("TPU_OK")
' 2>/dev/null | grep -q TPU_OK; then
    local n
    n=$(cat "$R5/fails/$1" 2>/dev/null || echo 0)
    echo $((n + 1)) > "$R5/fails/$1"
  fi
  exit 1
}

PAUSE_FILE=${NERF_EMITTER_PAUSE_FILE:-/tmp/nerf_emitter_pause}
wait_capture() {
  while [ -f "$PAUSE_FILE" ]; do
    local age=$(( $(date +%s) - $(stat -c %Y "$PAUSE_FILE" 2>/dev/null || echo 0) ))
    [ "$age" -gt 2700 ] && break
    sleep 5
  done
}

# land a metric JSON: RESULTS_r05.md section + committed copy in results/r5
append_results() { # $1 = section title, $2 = json path
  {
    echo ""
    echo "### $1 ($(date -u +%FT%TZ))"
    echo '```json'
    cat "$2"
    echo ""
    echo '```'
  } >> /root/repo/RESULTS_r05.md
  cp "$2" "$RES/$(basename "$2")"
  (cd /root/repo && git add "results/r5/$(basename "$2")" RESULTS_r05.md \
      nerf_emitter_tpu/configs/gates.json \
    && git commit -q -m "Results: $1" \
         -- "results/r5/$(basename "$2")" RESULTS_r05.md \
            nerf_emitter_tpu/configs/gates.json) || true
}

# ==== reboot recovery (23:07Z 2026-08-20 host reboot wiped outputs/ a
# THIRD time, including the trained prod5f checkpoint). Two defenses:
# (a) stages whose result JSON is already committed under results/r5 are
#     re-marked done from git, so a wipe of the done/ markers never
#     re-runs landed work;
# (b) trained checkpoints are tar'd into results/r5 and committed the
#     moment training finishes (see pf_archive, now placed BEFORE the
#     evals), and pf_run restores from that archive when outputs/ is
#     gone.
declare -A LANDED=(
  [tpu_numerics]=mini_pf_metrics_fixed.json   # numerics tier ran green before the mini eval landed
  [mini_eval_fx]=mini_pf_metrics_fixed.json
  [mini_relight]=mini_relight_metrics.json
  [mini_chamfer]=chamfer_mini_pf.json
)
for s in "${!LANDED[@]}"; do
  [ -f "$RES/${LANDED[$s]}" ] && mark "$s"
done

# restore a checkpoints dir from its committed archive(s)
restore_ckpt() { # $1 = checkpoints dir, $2 = tgz glob (under $RES)
  [ -d "$1" ] && return 0
  local any=0 t
  for t in "$RES"/$2; do
    [ -f "$t" ] || continue
    mkdir -p "$1"
    tar -xzf "$t" -C "$1" && any=1
  done
  [ "$any" = 1 ]
}

# ==== data regen (same seeded recipe as round 4's post-reboot regen —
# gen_data --seed 0 reproduces round 3's GT bit-for-bit; --resume makes
# each stage crash-resumable).
mkdir -p "$R3"
if ! stage_done sceneB && ! check_fails sceneB; then
  wait_capture
  bash /root/repo/scripts/round5/stall_guard.sh "$R3/sceneB" 1200 7200 \
    python -m nerf_emitter_tpu.scripts.gen_data \
    --object composite --albedo bands \
    --n-views 60 --width 128 --height 128 --spp 32 --path-type random \
    --resume --out "$R3/sceneB" >> "$R5/logs/sceneB.log" 2>&1 || fail sceneB
  mark sceneB
fi
if ! stage_done gt_mesh && ! check_fails gt_mesh; then
  {
    JAX_PLATFORMS=cpu python - <<PY &&
import numpy as np
from nerf_emitter_tpu.renderer.grid3d import composite_sdf_grid
np.save('$R3/gt_sdf.npy', np.asarray(composite_sdf_grid(129)))
PY
    JAX_PLATFORMS=cpu timeout 3600 \
      python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --sdf-volume "$R3/gt_sdf.npy" --resolution 192 --output-dir "$R3/gt_mesh"
  } >> "$R5/logs/gt_mesh.log" 2>&1 || fail gt_mesh
  mark gt_mesh
fi
if ! stage_done relight_gt && ! check_fails relight_gt; then
  wait_capture
  python - >> "$R5/logs/relight_gt.log" 2>&1 <<PY || fail relight_gt
import numpy as np
from nerf_emitter_tpu.utils import exr
img = exr.read_exr('$R3/sceneB/env.exr')
exr.write_exr('$R3/env_relit.exr', np.roll(img[..., :3], img.shape[1] // 2, axis=1))
PY
  bash /root/repo/scripts/round5/stall_guard.sh "$R3/sceneB_relit" 1200 7200 \
    python -m nerf_emitter_tpu.scripts.gen_data \
    --object composite --albedo bands \
    --envmap "$R3/env_relit.exr" --n-views 30 --width 128 --height 128 \
    --spp 32 --path-type random --resume --out "$R3/sceneB_relit" \
    >> "$R5/logs/relight_gt.log" 2>&1 || fail relight_gt
  mark relight_gt
fi

E2E_SPP=${E2E_SPP:-16}
E2E_ATT=${E2E_ATT:-8}
E2E_BATCH=${E2E_BATCH:-2}
# (advisor r4 high) baseline arms PIN the perf levers off so gate flips
# cannot contaminate them; (256,96,48) == the model's default schedule.
PIN_BASELINE=(--pipeline.distill-emitter false
  --pipeline.emitter-samples "[256, 96, 48]")
TRAIN_FLAGS=(--datacfg.data "$R3/sceneB" --output-dir "$R5"
  --opt-config-name diffuse-12-relativel1-hqq-r128
  --pipeline.spp "$E2E_SPP" --pipeline.spp-attached "$E2E_ATT"
  --pipeline.batch-size "$E2E_BATCH"
  --steps-per-save 50 --steps-per-eval-image 10000)

MINI_PRE=2000
MINI_SDF=160
MINI_TOTAL=$((MINI_PRE + MINI_SDF))
MINI_FLAGS=("${TRAIN_FLAGS[@]}"
  --pipeline.takeover-step "$MINI_PRE"
  --max-num-iterations "$MINI_TOTAL" --train.max-steps "$MINI_TOTAL")

# seed an experiment dir from a donor's checkpoints so the new arm
# resumes the frozen NeRF pretrain at step $3 (--load-nerf-only): copy,
# prune steps > $3, and if $3 itself is absent rename the latest
# remaining step to it (orbax skips saves at steps <= latest, and the
# NeRF subtree is frozen during takeover so any takeover step's NeRF
# state == the pretrain state). Fixes round 4's latent clobber: its
# rename could move a later step INTO an existing $3 directory.
seed_from() { # $1 = donor ckpt dir, $2 = new experiment dir, $3 = step
  [ -d "$2/sdf-nerfacto/checkpoints/$3" ] && return 0
  rm -rf "$2"
  mkdir -p "$2/sdf-nerfacto"
  cp -r "$1" "$2/sdf-nerfacto/checkpoints"
  # Keep ONE checkpoint and name it $3: prefer the largest step <= $3;
  # fall back to the smallest step overall (orbax retention may have kept
  # only the FINAL takeover step — that is still a valid donor, because
  # the NeRF subtree is frozen during takeover and the arms restore with
  # --load-nerf-only, which reads nothing but the NeRF state).
  local d base best=
  for d in "$2/sdf-nerfacto/checkpoints"/*; do
    base=$(basename "$d")
    [[ "$base" =~ ^[0-9]+$ ]] || continue
    [ "$base" -le "$3" ] || continue
    if [ -z "$best" ] || [ "$base" -gt "$best" ]; then best=$base; fi
  done
  if [ -z "$best" ]; then
    best=$(ls "$2/sdf-nerfacto/checkpoints" | grep -E '^[0-9]+$' | sort -n | head -1)
  fi
  [ -n "$best" ] || return 1
  for d in "$2/sdf-nerfacto/checkpoints"/*; do
    base=$(basename "$d")
    [[ "$base" =~ ^[0-9]+$ ]] && [ "$base" != "$best" ] && rm -rf "$d"
  done
  if [ "$best" != "$3" ]; then
    mv "$2/sdf-nerfacto/checkpoints/$best" "$2/sdf-nerfacto/checkpoints/$3"
  fi
  return 0
}

# ---- 0. on-chip numerics tier: the metric-trust gate for everything below
if ! stage_done tpu_numerics && ! check_fails tpu_numerics; then
  timeout 900 python -m pytest tests_tpu/ -x -q \
    >> "$R5/logs/tpu_numerics.log" 2>&1 || fail tpu_numerics
  {
    echo ""
    echo "### On-chip numerics tier ($(date -u +%FT%TZ))"
    echo '```'
    tail -3 "$R5/logs/tpu_numerics.log"
    echo '```'
  } >> /root/repo/RESULTS_r05.md
  (cd /root/repo && git add RESULTS_r05.md \
    && git commit -q -m "Queue: on-chip numerics tier green" \
         -- RESULTS_r05.md) || true
  mark tpu_numerics
fi

# ---- 1. mini re-evals with FIXED metrics (supersede round 4's SSIM 11.1)
# on the surviving prod_mini (2000+160) checkpoint
MINI_CFG="$R4/prod_mini/sdf-nerfacto/config.json"
if ! stage_done mini_eval_fx && ! check_fails mini_eval_fx; then
  wait_capture
  timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$MINI_CFG" \
    --spp 32 --output-path "$R5/mini_pf_metrics_fixed.json" \
    >> "$R5/logs/mini_eval_fx.log" 2>&1 || fail mini_eval_fx
  append_results "MINI baseline (2000+160) NVS, FIXED metrics" \
    "$R5/mini_pf_metrics_fixed.json"
  mark mini_eval_fx
fi
if ! stage_done mini_relight && ! check_fails mini_relight; then
  wait_capture
  timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$MINI_CFG" \
    --emitter-path "$R3/env_relit.exr" --test-data "$R3/sceneB_relit" \
    --spp 32 --output-path "$R5/mini_relight_metrics.json" \
    >> "$R5/logs/mini_relight.log" 2>&1 || fail mini_relight
  append_results "MINI baseline (2000+160) relighting, FIXED metrics" \
    "$R5/mini_relight_metrics.json"
  mark mini_relight
fi
# the chamfer that wedged round 4 (exporter now restores via the template
# path instead of running full takeover init on the CPU host)
if ! stage_done mini_chamfer && ! check_fails mini_chamfer; then
  {
    timeout 3600 env JAX_PLATFORMS=cpu \
      python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config "$MINI_CFG" \
      --resolution 192 --output-dir "$R5/mini_pf_mesh" &&
    timeout 3600 env JAX_PLATFORMS=cpu \
      python -m nerf_emitter_tpu.scripts.chamfer \
      "$R5/mini_pf_mesh/mesh.ply" "$R3/gt_mesh/mesh.ply" \
      --output-path "$R5/chamfer_mini_pf.json"
  } >> "$R5/logs/mini_chamfer.log" 2>&1 || fail mini_chamfer
  append_results "MINI baseline (2000+160) chamfer vs GT mesh" \
    "$R5/chamfer_mini_pf.json"
  mark mini_chamfer
fi

# ---- 2. prod5f: THE production E2E (2000 pretrain + 320 SDF mi-steps,
# fixed recipe: uniform_adam + redistance_freq=5 + lr_decay_at_up=0.25 are
# the shipped defaults since round 4). Fresh pretrain (round 4's prod4
# checkpoints were reboot-wiped); crash-resumable via --resume.
PF_FLAGS=("${TRAIN_FLAGS[@]}" "${PIN_BASELINE[@]}" --experiment-name prod5f)
if ! stage_done pf_run && ! check_fails pf_run; then
  wait_capture
  # post-reboot: restore any archived checkpoints so --resume continues
  # instead of re-pretraining from scratch
  restore_ckpt "$R5/prod5f/sdf-nerfacto/checkpoints" 'prod5f_ckpt_*.tgz' || true
  echo "=== pf_run attempt $(date +%H:%M:%S) ===" >> "$R5/logs/pf_run.log"
  bash /root/repo/scripts/round5/stall_guard.sh "$R5/prod5f" 2400 14400 \
    python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${PF_FLAGS[@]}" --resume \
    >> "$R5/logs/pf_run.log" 2>&1 || fail pf_run
  mark pf_run
fi
# archive checkpoints into git IMMEDIATELY after training (the 23:07Z
# reboot destroyed the first prod5f because this stage used to run after
# the evals): the step-2000 pretrain (the dl/ab seed donor) and the final
# step, each guarded at 100 MB.
if ! stage_done pf_archive && ! check_fails pf_archive; then
  (
    cd "$R5/prod5f/sdf-nerfacto/checkpoints" || exit 1
    latest=$(ls | grep -E '^[0-9]+$' | sort -n | tail -1)
    for step in 2000 "$latest"; do
      [ -d "$step" ] || continue
      out="$RES/prod5f_ckpt_$step.tgz"
      [ -f "$out" ] && continue
      tar -czf "$out" "$step"
      sz=$(stat -c %s "$out")
      if [ "$sz" -lt 100000000 ]; then
        (cd /root/repo && git add "results/r5/prod5f_ckpt_$step.tgz" \
          && git commit -q -m "Archive prod5f checkpoint (step $step)" \
               -- "results/r5/prod5f_ckpt_$step.tgz")
      else
        rm -f "$out"
      fi
    done
  ) >> "$R5/logs/pf_archive.log" 2>&1 || fail pf_archive
  mark pf_archive
fi
if ! stage_done pf_eval && ! check_fails pf_eval; then
  wait_capture
  timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R5/prod5f/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R5/e2e_metrics_pf.json" \
    >> "$R5/logs/pf_eval.log" 2>&1 || fail pf_eval
  append_results "PROD baseline prod5f (2000+320): NVS [rerun after the 23:07Z reboot wiped the first trained prod5f]" "$R5/e2e_metrics_pf.json"
  mark pf_eval
fi
# (pf_relight moved after bench_gated — gate critical path first)
# chamfer for pf/dl/ab arms runs in the PARALLEL CPU worker
# (scripts/round5/chamfer_worker.sh, started by loop.sh): on this 1-core
# host each export+chamfer is ~45 min, and three of them used to sit
# serially in the TPU queue's critical path before the gate decisions.
# The queue only WAITS for the worker's JSON right before each consumer.
wait_chamfer() { # $1 = arm (pf|dl|ab), $2 = max seconds
  local end=$(( $(date +%s) + $2 ))
  while [ ! -f "$R5/chamfer_$1.json" ] && [ "$(date +%s)" -lt "$end" ]; do
    [ "$(cat "$R5/fails/chamfer_worker_$1" 2>/dev/null || echo 0)" -ge 3 ] \
      && return 1
    sleep 15
  done
  [ -f "$R5/chamfer_$1.json" ]
}
# (pf_archive moved up, directly after pf_run)

# ---- 3. distilled-emitter A/B at production scale: same frozen pretrain,
# fresh SDF arm served by the light-field cache -> gate -> bench
DL_FLAGS=("${TRAIN_FLAGS[@]}" --experiment-name prod5_dl
  --pipeline.distill-emitter true
  --pipeline.emitter-samples "[256, 96, 48]")
if ! stage_done dl_run && ! check_fails dl_run; then
  wait_capture
  seed_from "$R5/prod5f/sdf-nerfacto/checkpoints" "$R5/prod5_dl" 2000 \
    || fail dl_run
  echo "=== dl_run attempt $(date +%H:%M:%S) ===" >> "$R5/logs/dl_run.log"
  bash /root/repo/scripts/round5/stall_guard.sh "$R5/prod5_dl" 2400 14400 \
    python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${DL_FLAGS[@]}" --resume --load-nerf-only --override-start-step 2000 \
    >> "$R5/logs/dl_run.log" 2>&1 || fail dl_run
  mark dl_run
fi
if ! stage_done dl_eval && ! check_fails dl_eval; then
  wait_capture
  timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R5/prod5_dl/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R5/e2e_metrics_dl.json" \
    >> "$R5/logs/dl_eval.log" 2>&1 || fail dl_eval
  append_results "A/B distilled emitter (prod5_dl): NVS" "$R5/e2e_metrics_dl.json"
  mark dl_eval
fi
if ! stage_done dl_relight && ! check_fails dl_relight; then
  wait_capture
  timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R5/prod5_dl/sdf-nerfacto/config.json" \
    --emitter-path "$R3/env_relit.exr" --test-data "$R3/sceneB_relit" \
    --spp 32 --output-path "$R5/relight_metrics_dl.json" \
    >> "$R5/logs/dl_relight.log" 2>&1 || fail dl_relight
  append_results "A/B distilled emitter (prod5_dl): relighting" \
    "$R5/relight_metrics_dl.json"
  mark dl_relight
fi
# (dl chamfer runs in the parallel CPU worker; reaped before dl_decide)
# end-to-end takeover step-time comparison (what the 6.3x emitter-query
# lever buys the whole training step)
if ! stage_done dl_steptime && ! check_fails dl_steptime; then
  python scripts/round5/steptime.py \
    "$R5/prod5f/sdf-nerfacto/logs/events.jsonl" \
    "$R5/prod5_dl/sdf-nerfacto/logs/events.jsonl" \
    --output-path "$R5/steptime_dl.json" \
    >> "$R5/logs/dl_steptime.log" 2>&1 || fail dl_steptime
  append_results "Takeover SDF step time: baseline vs distilled" \
    "$R5/steptime_dl.json"
  mark dl_steptime
fi

# the PRODUCTION-scale gate decision: writes configs/gates.json (flip OR
# revert), which methods.py and bench.py read. The CPU chamfer worker
# gets a short window; if its JSONs are still pending the decision is
# PSNR-only (recorded as such) and re-run in full once chamfer lands —
# the wall clock must not strand the headline behind two 45-min meshes.
if ! stage_done dl_decide && ! check_fails dl_decide; then
  wait_chamfer pf 900 || true
  wait_chamfer dl 900 || true
  PFC="$R5/chamfer_pf.json"; [ -f "$PFC" ] || PFC=-
  DLC="$R5/chamfer_dl.json"; [ -f "$DLC" ] || DLC=-
  {
    python scripts/round5/decide_distill.py \
      "$R5/e2e_metrics_pf.json" "$R5/e2e_metrics_dl.json" \
      "$PFC" "$DLC" --scale prod > "$R5/dl_decide.md"
  } 2>> "$R5/logs/dl_decide.log" || fail dl_decide
  cat "$R5/dl_decide.md" >> /root/repo/RESULTS_r05.md
  (git add RESULTS_r05.md nerf_emitter_tpu/configs/gates.json \
    && git commit -q -m "Distilled-emitter gate decision (production scale)" \
         -- RESULTS_r05.md nerf_emitter_tpu/configs/gates.json) || true
  if [ "$PFC" != - ] && [ "$DLC" != - ]; then
    mark dl_decide_full
  fi
  mark dl_decide
fi
# headline bench under the GATED default, so the driver's end-of-round
# bench.py run measures what the gate shipped
if ! stage_done bench_gated && ! check_fails bench_gated; then
  wait_capture
  timeout 3600 python bench.py > "$R5/bench_after_gate.json" \
    2>> "$R5/logs/bench_gated.log" || fail bench_gated
  append_results "bench.py headline after the production gate" \
    "$R5/bench_after_gate.json"
  mark bench_gated
fi

if ! stage_done pf_relight && ! check_fails pf_relight; then
  wait_capture
  timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R5/prod5f/sdf-nerfacto/config.json" \
    --emitter-path "$R3/env_relit.exr" --test-data "$R3/sceneB_relit" \
    --spp 32 --output-path "$R5/relight_metrics_pf.json" \
    >> "$R5/logs/pf_relight.log" 2>&1 || fail pf_relight
  append_results "PROD baseline prod5f (2000+320): relighting" \
    "$R5/relight_metrics_pf.json"
  mark pf_relight
fi

# full chamfer reaps (parallel worker) + re-decide with geometry included
if ! stage_done pf_chamfer && ! check_fails pf_chamfer; then
  wait_chamfer pf 7200 || fail pf_chamfer
  append_results "PROD baseline prod5f (2000+320): chamfer" "$R5/chamfer_pf.json"
  mark pf_chamfer
fi
if ! stage_done dl_chamfer && ! check_fails dl_chamfer; then
  wait_chamfer dl 7200 || fail dl_chamfer
  append_results "A/B distilled emitter (prod5_dl): chamfer" "$R5/chamfer_dl.json"
  mark dl_chamfer
fi
if ! stage_done dl_decide_full && ! check_fails dl_decide_full; then
  {
    python scripts/round5/decide_distill.py \
      "$R5/e2e_metrics_pf.json" "$R5/e2e_metrics_dl.json" \
      "$R5/chamfer_pf.json" "$R5/chamfer_dl.json" \
      --scale prod > "$R5/dl_decide_full.md"
  } 2>> "$R5/logs/dl_decide_full.log" || fail dl_decide_full
  cat "$R5/dl_decide_full.md" >> /root/repo/RESULTS_r05.md
  (cd /root/repo && git add RESULTS_r05.md nerf_emitter_tpu/configs/gates.json \
    && git commit -q -m "Distilled-emitter gate re-decided with chamfer" \
         -- RESULTS_r05.md nerf_emitter_tpu/configs/gates.json) || true
  mark dl_decide_full
fi

# ---- 4. emitter sample-schedule A/B (VERDICT r3 #3 / r4 weak #5):
# equal-step at mini scale — baseline arm IS prod_mini (2000+160, default
# schedule, re-evaled above with fixed metrics); the reduced arm trains
# 160 steps from the SAME frozen pretrain.
AB_FLAGS=("${MINI_FLAGS[@]}" --experiment-name mini_ab
  --pipeline.distill-emitter false
  --pipeline.emitter-samples "[128, 48, 24]")
# prod_mini (the A/B's frozen-NeRF donor) was reboot-wiped; reconstruct
# its pretrain deterministically: identical seed/data/flags INCLUDING the
# lr-schedule denominator (--train.max-steps 2160 from MINI_FLAGS), with
# the loop stopped at 2000 — takeover only fires when
# takeover_step < max_num_iterations (engine/trainer.py:375), so this is
# a pure NeRF pretrain saving its final state at step 2000. (prod5f@2000
# would NOT match: its schedules decay over 2320 steps, not 2160.)
if ! stage_done mini_donor && ! check_fails mini_donor; then
  wait_capture
  echo "=== mini_donor attempt $(date +%H:%M:%S) ===" >> "$R5/logs/mini_donor.log"
  bash /root/repo/scripts/round5/stall_guard.sh "$R5/mini_donor" 2400 7200 \
    python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${MINI_FLAGS[@]}" "${PIN_BASELINE[@]}" --experiment-name mini_donor \
    --max-num-iterations 2000 --resume \
    >> "$R5/logs/mini_donor.log" 2>&1 || fail mini_donor
  mark mini_donor
fi
if ! stage_done ab_run && ! check_fails ab_run; then
  wait_capture
  seed_from "$R5/mini_donor/sdf-nerfacto/checkpoints" "$R5/mini_ab" 2000 \
    || fail ab_run
  echo "=== ab_run attempt $(date +%H:%M:%S) ===" >> "$R5/logs/ab_run.log"
  bash /root/repo/scripts/round5/stall_guard.sh "$R5/mini_ab" 2400 10800 \
    python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
    "${AB_FLAGS[@]}" --resume --load-nerf-only --override-start-step 2000 \
    >> "$R5/logs/ab_run.log" 2>&1 || fail ab_run
  mark ab_run
fi
if ! stage_done ab_eval && ! check_fails ab_eval; then
  wait_capture
  timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R5/mini_ab/sdf-nerfacto/config.json" \
    --spp 32 --output-path "$R5/mini_ab_metrics.json" \
    >> "$R5/logs/ab_eval.log" 2>&1 || fail ab_eval
  append_results "A/B reduced schedule (mini_ab, 2000+160): NVS" \
    "$R5/mini_ab_metrics.json"
  mark ab_eval
fi
# (ab chamfer runs in the parallel CPU worker; reaped before ab_decide)
# NOTE: decide_schedule runs AFTER the real-capture chain below, so a
# schedule-gate flip cannot change the default under tt_chain's feet.

# ---- 5. freq-vs-hash quality A/B (VERDICT r3 #6): 2 scenes x 2 impls
if ! stage_done scene_v && ! check_fails scene_v; then
  wait_capture
  bash /root/repo/scripts/round5/stall_guard.sh "$R5/scene_v" 1200 3600 \
    python -m nerf_emitter_tpu.scripts.gen_data \
    --object sphere --albedo const \
    --n-views 40 --width 96 --height 96 --spp 32 --path-type random \
    --resume --out "$R5/scene_v" >> "$R5/logs/scene_v.log" 2>&1 || fail scene_v
  mark scene_v
fi
for scene in "$R3/sceneB" "$R5/scene_v"; do
  sname=$(basename "$scene")
  for impl in freq hash; do
    name="fh_${sname}_${impl}"
    if ! stage_done "$name" && ! check_fails "$name"; then
      wait_capture
      bash /root/repo/scripts/round5/stall_guard.sh "$R5/fh" 2400 7200 \
        python -m nerf_emitter_tpu.scripts.train hdr-nerfacto \
        --datacfg.data "$scene" --experiment-name "${name}" --output-dir "$R5/fh" \
        --model.implementation "${impl}" --train.num-rays-per-batch 16384 \
        --max-num-iterations 2000 --train.max-steps 2000 \
        --steps-per-save 2000 --steps-per-eval-image 4000 \
        >> "$R5/logs/${name}.log" 2>&1 || fail "$name"
      timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
        --load-config "$R5/fh/${name}/hdr-nerfacto/config.json" \
        --spp 1 --output-path "$R5/${name}_metrics.json" \
        >> "$R5/logs/${name}.log" 2>&1 || fail "$name"
      append_results "freq-vs-hash: ${name}" "$R5/${name}_metrics.json"
      mark "$name"
    fi
  done
done

# ---- 6. real-capture chain (turntable + occlusion + hdr->sdf chaining),
# honest-small scale, WITH metrics this time (VERDICT r3 #7 / r4 weak #5)
if ! stage_done tt_scene && ! check_fails tt_scene; then
  wait_capture
  bash /root/repo/scripts/round5/stall_guard.sh "$R5/scene_tt" 1200 3600 \
    python -m nerf_emitter_tpu.scripts.gen_data \
    --object composite --albedo bands \
    --n-views 60 --width 128 --height 128 --spp 32 --n-rotations 3 \
    --path-type spiral --resume --out "$R5/scene_tt" \
    >> "$R5/logs/tt_scene.log" 2>&1 || fail tt_scene
  mark tt_scene
fi
if ! stage_done tt_chain && ! check_fails tt_chain; then
  wait_capture
  echo "=== tt_chain attempt $(date +%H:%M:%S) ===" >> "$R5/logs/tt_chain.log"
  PRETRAIN=800 TOTAL=880 OUT="$R5/tt" EXPORT_RES=128 RENDER_SPP=16 \
    bash /root/repo/scripts/round5/stall_guard.sh "$R5/tt" 2400 10800 \
    bash scripts/real/ours/run.sh "$R5/scene_tt" tt \
    >> "$R5/logs/tt_chain.log" 2>&1 || fail tt_chain
  mark tt_chain
fi
if ! stage_done tt_eval && ! check_fails tt_eval; then
  wait_capture
  timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R5/tt/tt/sdf-nerfacto/config.json" \
    --spp 16 --output-path "$R5/tt_metrics.json" \
    >> "$R5/logs/tt_eval.log" 2>&1 || fail tt_eval
  append_results "Real-capture chain (turntable, 800+80): NVS" \
    "$R5/tt_metrics.json"
  mark tt_eval
fi

# schedule gate decision — AFTER tt_chain (see note above)
if ! stage_done ab_chamfer && ! check_fails ab_chamfer; then
  wait_chamfer ab 7200 || fail ab_chamfer
  append_results "A/B reduced schedule (mini_ab, 2000+160): chamfer" \
    "$R5/chamfer_ab.json"
  mark ab_chamfer
fi
if ! stage_done ab_decide && ! check_fails ab_decide; then
  {
    python scripts/round5/decide_schedule.py \
      "$R5/mini_pf_metrics_fixed.json" "$R5/mini_ab_metrics.json" \
      "$R5/chamfer_mini_pf.json" "$R5/chamfer_ab.json" \
      > "$R5/ab_decide.md"
  } 2>> "$R5/logs/ab_decide.log" || fail ab_decide
  cat "$R5/ab_decide.md" >> /root/repo/RESULTS_r05.md
  (cd /root/repo && git add RESULTS_r05.md nerf_emitter_tpu/configs/gates.json \
    && git commit -q -m "Emitter sample-schedule gate decision" \
         -- RESULTS_r05.md nerf_emitter_tpu/configs/gates.json) || true
  mark ab_decide
fi

# ---- 7. sdf-gt-envmap baseline (BASELINE.md staged config #2)
if ! stage_done envgt_train && ! check_fails envgt_train; then
  wait_capture
  echo "=== envgt attempt $(date +%H:%M:%S) ===" >> "$R5/logs/envgt.log"
  bash /root/repo/scripts/round5/stall_guard.sh "$R5/envgt" 2400 7200 \
    python -m nerf_emitter_tpu.scripts.train sdf-gt-envmap \
    "${TRAIN_FLAGS[@]}" --experiment-name envgt --resume \
    >> "$R5/logs/envgt.log" 2>&1 || fail envgt_train
  mark envgt_train
fi
if ! stage_done envgt_eval && ! check_fails envgt_eval; then
  wait_capture
  timeout 3600 python -m nerf_emitter_tpu.scripts.eval \
    --load-config "$R5/envgt/sdf-gt-envmap/config.json" \
    --spp 32 --output-path "$R5/envgt_metrics.json" \
    >> "$R5/logs/envgt_eval.log" 2>&1 || fail envgt_eval
  append_results "sdf-gt-envmap baseline (320 steps): NVS" "$R5/envgt_metrics.json"
  mark envgt_eval
fi

echo ALL_STAGES_DONE
