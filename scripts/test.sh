#!/usr/bin/env bash
# Corruption-robustness sweep (clean + 15 corruptions x 5 severities -> mPC/rPC CSV).
# Mirrors the reference scripts/test.sh (/root/reference/scripts/test.sh).
# Extra FLAGS (e.g. "--on_the_fly --distortions fog") go via $FLAGS; "$@"
# appends yacs KEY VALUE config overrides.
set -e
cd "$(dirname "$0")/.."
CFG="${CFG:-experiments/coco/resnet/res50_256x192_advmix.yaml}"
python tools/test_corruption.py \
  --cfg "$CFG" \
  --exp_id "${EXP_ID:-robust}" \
  ${FLAGS:-} \
  TEST.MODEL_FILE "${MODEL_FILE:-output/coco/pose_resnet/res50_256x192_advmix/final_state}" \
  "$@"
