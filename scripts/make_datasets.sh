#!/usr/bin/env bash
# Render COCO-C and MPII-C corruption datasets on the TPU.
# Mirrors the reference scripts/make_datasets.sh surface.
set -e
cd "$(dirname "$0")/.."
COCO_ROOT="${COCO_ROOT:-data/coco/val2017}"
MPII_ROOT="${MPII_ROOT:-data/mpii/images}"
OUT_ROOT="${OUT_ROOT:-data}"
if [ -d "$COCO_ROOT" ]; then
  python tools/make_datasets.py --dataset_root "$COCO_ROOT" --out_root "$OUT_ROOT" --out_file coco-C "$@"
else
  echo "WARNING: $COCO_ROOT not found; skipping COCO-C" >&2
fi
if [ -d "$MPII_ROOT" ]; then
  python tools/make_datasets.py --dataset_root "$MPII_ROOT" --out_root "$OUT_ROOT" --out_file mpii-C "$@"
else
  echo "WARNING: $MPII_ROOT not found; skipping MPII-C" >&2
fi
