#!/usr/bin/env bash
# Known-envmap baseline (the reference's sdf-gt-envmap driver): SDF inverse
# rendering under the dataset's ground-truth env.exr, no NeRF emitter.
set -euo pipefail

SCENE=${1:?usage: run.sh <scene_dir> [experiment_name]}
EXP=${2:-$(basename "$SCENE")-baseline}
OUT=outputs

python -m nerf_emitter_tpu.scripts.train sdf-gt-envmap \
  --datacfg.data "$SCENE" \
  --experiment-name "$EXP" \
  --output-dir "$OUT"

CONFIG="$OUT/$EXP/sdf-gt-envmap/config.json"

python -m nerf_emitter_tpu.scripts.exporter mi-marching-cubes \
  --load-config "$CONFIG" --resolution 512 \
  --output-dir "$OUT/$EXP/export"

python -m nerf_emitter_tpu.scripts.eval \
  --load-config "$CONFIG" \
  --output-path "$OUT/$EXP/metrics.json"
