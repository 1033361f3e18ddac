#!/usr/bin/env bash
# DTU evaluation: depth export + fusion for both variants.
set -e
DTU_TESTING=${DTU_TESTING:-/dtu}
CKPT=${CKPT:-./checkpoints/casdiffmvs_dtu.ckpt}
METHOD=${METHOD:-casdiffmvs}
OUT_DIR=${OUT_DIR:-./outputs_dtu_${METHOD}}
mkdir -p "$OUT_DIR"

python -m diffmvs_tpu.cli.test --dataset dtu --method "$METHOD" \
    --save_depth --num_view 5 \
    --testpath "$DTU_TESTING" --testlist lists/dtu/test.txt \
    --loadckpt "$CKPT" --outdir "$OUT_DIR" \
    --geo_pixel_thres 0.125 --geo_depth_thres 0.01 --geo_mask_thres 2 \
    --photo_thres 0.3 0.0 0.0
