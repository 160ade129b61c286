#!/usr/bin/env bash
# Corruption-robustness sweep (clean + 15 corruptions x 5 severities -> mPC/rPC CSV).
set -e
cd "$(dirname "$0")/.."
python tools/test_corruption.py \
  --cfg experiments/coco/resnet/res50_256x192_d256x3_adam_lr1e-3_advmix.yaml \
  --exp_id "${EXP_ID:-robust}" \
  TEST.MODEL_FILE "${MODEL_FILE:-output/coco/pose_resnet/res50_256x192_d256x3_adam_lr1e-3_advmix/final_state}" \
  "$@"
