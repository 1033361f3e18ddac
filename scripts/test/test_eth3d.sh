#!/usr/bin/env bash
# ETH3D high-res evaluation; per-scene geo thresholds from config.ETH3D_*.
set -e
ETH3D_TESTING=${ETH3D_TESTING:-/eth3d_high_res_test}
CKPT=${CKPT:-./checkpoints/casdiffmvs_blend.ckpt}
METHOD=${METHOD:-casdiffmvs}
OUT_DIR=${OUT_DIR:-./outputs_eth3d_${METHOD}}
mkdir -p "$OUT_DIR"

for LIST in train test; do
  python -m diffmvs_tpu.cli.test --dataset eth3d --method "$METHOD" \
      --save_depth --num_view 10 \
      --testpath "$ETH3D_TESTING" --testlist "lists/eth3d/${LIST}.txt" \
      --loadckpt "$CKPT" --outdir "$OUT_DIR" \
      --photo_thres 0.3 0.5 0.5
done
