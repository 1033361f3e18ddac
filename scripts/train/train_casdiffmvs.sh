#!/usr/bin/env bash
# CasDiffMVS training recipe: DTU then BlendedMVS finetune
# (canonical hyperparameters live in the casdiffmvs config preset).
set -e

MVS_TRAINING=${MVS_TRAINING:-/DTU}
LOG_DIR=${LOG_DIR:-./checkpoints/casdiffmvs}
mkdir -p "$LOG_DIR"

python -m diffmvs_tpu.cli.train --mode train --dataset dtu \
    --preset casdiffmvs --batch_size 4 --epochs 16 \
    --lr 0.001 --lr_sche onecycle \
    --logdir "$LOG_DIR" --trainpath "$MVS_TRAINING" \
    --trainviews 5 --testviews 5 \
    --scale 0 0.5 0.1 --conf_weight 0.05 \
    --trainlist lists/dtu/train.txt --testlist lists/dtu/val.txt

# BlendedMVS finetune (two phases with decreasing noise scale)
BLEND_TRAINING=${BLEND_TRAINING:-/BlendedMVS}
BLEND_DIR="$LOG_DIR/blend"
mkdir -p "$BLEND_DIR"

python -m diffmvs_tpu.cli.train --mode train --dataset blend \
    --preset casdiffmvs --batch_size 4 --epochs 16 --train_epochs 8 \
    --loadckpt "$LOG_DIR" \
    --lr 0.001 --lr_sche onecycle \
    --logdir "$BLEND_DIR" --trainpath "$BLEND_TRAINING" \
    --trainviews 9 --testviews 9 \
    --scale 0 0.25 0.05 --conf_weight 0.05 \
    --trainlist lists/blend/train.txt --testlist lists/blend/val.txt

python -m diffmvs_tpu.cli.train --mode train --dataset blend \
    --preset casdiffmvs --batch_size 4 --epochs 16 --resume \
    --lr 0.001 --lr_sche onecycle \
    --logdir "$BLEND_DIR" --trainpath "$BLEND_TRAINING" \
    --trainviews 9 --testviews 9 \
    --scale 0 0.125 0.025 --conf_weight 0.05 \
    --trainlist lists/blend/train.txt --testlist lists/blend/val.txt
