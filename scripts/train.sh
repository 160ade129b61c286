#!/usr/bin/env bash
# AdvMix training on COCO with a pretrained pose checkpoint as D + teacher.
# Mirrors the reference scripts/train.sh invocation surface
# (/root/reference/scripts/train.sh).
set -e
cd "$(dirname "$0")/.."
CFG="${CFG:-experiments/coco/resnet/res50_256x192_advmix.yaml}"
LOAD_FROM_D="${LOAD_FROM_D:-models/pose_resnet_50_coco.pth}"
ARGS=(--cfg "$CFG" --advmix --sample_times 3 --kd_mseloss --alpha 0.1)
if [ -f "$LOAD_FROM_D" ]; then
  ARGS+=(--load_from_D "$LOAD_FROM_D")
else
  echo "WARNING: pretrained checkpoint '$LOAD_FROM_D' not found;" \
       "training D + teacher from random init" >&2
fi
python tools/train.py "${ARGS[@]}" "$@"
