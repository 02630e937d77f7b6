#!/usr/bin/env bash
# Synthetic-scene "ours" driver (the reference's scripts/synthetic/ours/run.sh):
# train sdf-nerfacto -> export mesh -> novel-view renders -> relight per envmap.
# One SPMD process; multi-chip comes from the device mesh, not worker fan-out.
set -euo pipefail

SCENE=${1:?usage: run.sh <scene_dir> [experiment_name]}
EXP=${2:-$(basename "$SCENE")}
OUT=outputs
OPT_CONFIG=${OPT_CONFIG:-diffuse-12-relativel1-hqq}

python -m nerf_emitter_tpu.scripts.train sdf-nerfacto \
  --datacfg.data "$SCENE" \
  --experiment-name "$EXP" \
  --output-dir "$OUT" \
  --opt-config-name "$OPT_CONFIG"

CONFIG="$OUT/$EXP/sdf-nerfacto/config.json"

python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
  --load-config "$CONFIG" --resolution 512 \
  --output-dir "$OUT/$EXP/export"

python -m nerf_emitter_tpu.scripts.render eval \
  --load-config "$CONFIG" --spp 256 \
  --output-path "$OUT/$EXP/renders"

# relighting: every envmap in $SCENE/relight_envmaps/
if [ -d "$SCENE/relight_envmaps" ]; then
  for ENV in "$SCENE"/relight_envmaps/*; do
    NAME=$(basename "$ENV" | sed 's/\..*//')
    python -m nerf_emitter_tpu.scripts.eval \
      --load-config "$CONFIG" \
      --emitter-path "$ENV" \
      --output-path "$OUT/$EXP/relight_$NAME.json"
  done
fi

python -m nerf_emitter_tpu.scripts.eval \
  --load-config "$CONFIG" \
  --output-path "$OUT/$EXP/metrics.json"
