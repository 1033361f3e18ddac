#!/usr/bin/env bash
# Tanks&Temples evaluation (intermediate + advanced); per-scene fusion
# hyperparameters come from config.TANK_* tables.
set -e
TANK_TESTING=${TANK_TESTING:-/tankandtemples}
CKPT=${CKPT:-./checkpoints/casdiffmvs_blend.ckpt}
METHOD=${METHOD:-casdiffmvs}
OUT_DIR=${OUT_DIR:-./outputs_tank_${METHOD}}
mkdir -p "$OUT_DIR"

for LIST in intermediate advanced; do
  python -m diffmvs_tpu.cli.test --dataset tank --method "$METHOD" \
      --save_depth --num_view 10 --numdepth_initial 96 \
      --testpath "$TANK_TESTING" --testlist "lists/tank/${LIST}.txt" \
      --loadckpt "$CKPT" --outdir "$OUT_DIR"
done
