#!/usr/bin/env bash
# Render COCO-C and MPII-C corruption datasets on the TPU.
set -e
cd "$(dirname "$0")/.."
python tools/make_datasets.py --dataset_root data/coco/val2017 --out_root data --out_file coco-C "$@"
python tools/make_datasets.py --dataset_root data/mpii/images  --out_root data --out_file mpii-C "$@"
