#!/bin/bash
# CPU-side chamfer worker: runs mesh export + chamfer for each trained
# arm IN PARALLEL with the TPU queue (scripts/round5/stages.sh). On this
# 1-core host an export+chamfer takes ~45 min (round-4 mini_chamfer:
# 10:16->11:05), and three of them used to sit serially in the TPU
# queue's critical path before the gate decisions; the TPU is idle-bound
# on none of them. The worker watches the queue's done/ markers, writes
# chamfer_<arm>.json, and leaves RESULTS/commits to stages.sh (single
# committer — no git index races).
set -x
cd /root/repo
R3=/root/repo/outputs/r3
R5=/root/repo/outputs/r5
mkdir -p "$R5/logs" "$R5/fails"

# arm -> (train-done marker, config.json, mesh dir, chamfer json)
declare -A MARKER=([pf]=pf_run [dl]=dl_run [ab]=ab_run)
declare -A CONFIG=(
  [pf]="$R5/prod5f/sdf-nerfacto/config.json"
  [dl]="$R5/prod5_dl/sdf-nerfacto/config.json"
  [ab]="$R5/mini_ab/sdf-nerfacto/config.json"
)
declare -A MESHDIR=([pf]="$R5/pf_mesh" [dl]="$R5/dl_mesh" [ab]="$R5/ab_mesh")

run_arm() { # $1 = arm
  local arm=$1 log="$R5/logs/chamfer_worker_$1.log"
  {
    timeout 5400 env JAX_PLATFORMS=cpu \
      python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
      --load-config "${CONFIG[$arm]}" \
      --resolution 192 --output-dir "${MESHDIR[$arm]}" &&
    timeout 3600 env JAX_PLATFORMS=cpu \
      python -m nerf_emitter_tpu.scripts.chamfer \
      "${MESHDIR[$arm]}/mesh.ply" "$R3/gt_mesh/mesh.ply" \
      --output-path "$R5/chamfer_$arm.json"
  } >> "$log" 2>&1
}

deadline=$(( $(date +%s) + 6 * 3600 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  all_done=1
  for arm in pf dl ab; do
    [ -f "$R5/chamfer_$arm.json" ] && continue
    fails=$(cat "$R5/fails/chamfer_worker_$arm" 2>/dev/null || echo 0)
    [ "$fails" -ge 3 ] && continue
    all_done=0
    # need: the arm trained, its config written, and the GT mesh built
    [ -f "$R5/done/${MARKER[$arm]}" ] || continue
    [ -f "${CONFIG[$arm]}" ] || continue
    [ -f "$R5/done/gt_mesh" ] || continue
    if ! run_arm "$arm"; then
      echo $((fails + 1)) > "$R5/fails/chamfer_worker_$arm"
    fi
  done
  [ "$all_done" = 1 ] && break
  sleep 30
done
echo CHAMFER_WORKER_EXIT
