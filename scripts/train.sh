#!/usr/bin/env bash
# AdvMix training on COCO with a pretrained pose checkpoint as D + teacher.
# Mirrors the reference scripts/train.sh invocation surface.
set -e
cd "$(dirname "$0")/.."
python tools/train.py \
  --cfg experiments/coco/resnet/res50_256x192_d256x3_adam_lr1e-3_advmix.yaml \
  --advmix --sample_times 3 --kd_mseloss --alpha 0.1 \
  --load_from_D "${LOAD_FROM_D:-models/pose_resnet_50_coco.pth}" \
  "$@"
