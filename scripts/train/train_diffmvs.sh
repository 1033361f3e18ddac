#!/usr/bin/env bash
# DiffMVS training recipe: DTU then BlendedMVS finetune.
set -e

MVS_TRAINING=${MVS_TRAINING:-/DTU}
LOG_DIR=${LOG_DIR:-./checkpoints/diffmvs}
mkdir -p "$LOG_DIR"

python -m diffmvs_tpu.cli.train --mode train --dataset dtu \
    --preset diffmvs --batch_size 4 --epochs 12 \
    --lr 0.001 --lr_sche onecycle \
    --logdir "$LOG_DIR" --trainpath "$MVS_TRAINING" \
    --trainviews 5 --testviews 5 \
    --scale 0 0.5 0.0 --conf_weight 0.05 \
    --trainlist lists/dtu/train.txt --testlist lists/dtu/val.txt

BLEND_TRAINING=${BLEND_TRAINING:-/BlendedMVS}
BLEND_DIR="$LOG_DIR/blend"
mkdir -p "$BLEND_DIR"

python -m diffmvs_tpu.cli.train --mode train --dataset blend \
    --preset diffmvs --batch_size 4 --epochs 12 --train_epochs 6 \
    --loadckpt "$LOG_DIR" \
    --lr 0.001 --lr_sche onecycle \
    --logdir "$BLEND_DIR" --trainpath "$BLEND_TRAINING" \
    --trainviews 9 --testviews 9 \
    --scale 0 0.5 0.0 --conf_weight 0.05 \
    --trainlist lists/blend/train.txt --testlist lists/blend/val.txt

python -m diffmvs_tpu.cli.train --mode train --dataset blend \
    --preset diffmvs --batch_size 4 --epochs 12 --resume \
    --lr 0.001 --lr_sche onecycle \
    --logdir "$BLEND_DIR" --trainpath "$BLEND_TRAINING" \
    --trainviews 9 --testviews 9 \
    --scale 0 0.5 0.0 --conf_weight 0.05 \
    --trainlist lists/blend/train.txt --testlist lists/blend/val.txt
