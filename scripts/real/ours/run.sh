#!/usr/bin/env bash
# Real-capture driver (the reference's scripts/real/ours/run.sh): chain
# hdr-nerfacto pretraining into sdf-nerfacto takeover (the reference resumes
# via --load-dir/--override-start-step; here the sdf-nerfacto run reuses the
# hdr checkpoint dir), then export + renders.
set -euo pipefail

SCENE=${1:?usage: run.sh <scene_dir> [experiment_name]}
EXP=${2:-$(basename "$SCENE")}
OUT=${OUT:-outputs}

PRETRAIN=${PRETRAIN:-2000}
TOTAL=${TOTAL:-$((PRETRAIN + 320))}
EXPORT_RES=${EXPORT_RES:-512}
RENDER_SPP=${RENDER_SPP:-256}

python -m nerf_emitter_tpu.scripts.train hdr-nerfacto \
  --datacfg.data "$SCENE" \
  --experiment-name "$EXP" \
  --output-dir "$OUT" \
  --max-num-iterations "$PRETRAIN" --train.max-steps "$PRETRAIN" \
  --steps-per-save "$PRETRAIN"

# chain: seed the sdf-nerfacto run dir with the hdr checkpoint and resume
# at the takeover step (the reference's --load-dir +
# --override-start-step, scripts/real/ours/run.sh:24-25)
mkdir -p "$OUT/$EXP/sdf-nerfacto"
cp -r "$OUT/$EXP/hdr-nerfacto/checkpoints" "$OUT/$EXP/sdf-nerfacto/"

python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
  --datacfg.data "$SCENE" \
  --experiment-name "$EXP" \
  --output-dir "$OUT" \
  --pipeline.use-occlusion true \
  --resume --override-start-step "$PRETRAIN" \
  --pipeline.takeover-step "$PRETRAIN" \
  --max-num-iterations "$TOTAL" --train.max-steps "$TOTAL"

CONFIG="$OUT/$EXP/sdf-nerfacto/config.json"

python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
  --load-config "$CONFIG" --resolution "$EXPORT_RES" \
  --output-dir "$OUT/$EXP/export"

python -m nerf_emitter_tpu.scripts.render eval \
  --load-config "$CONFIG" --spp "$RENDER_SPP" \
  --output-path "$OUT/$EXP/renders"
