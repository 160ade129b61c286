#!/bin/bash
# A/B measurement of the int8-teacher KD accuracy cost (VERDICT r4 #3).
#
# TRAIN.INT8_TEACHER runs the frozen KD teacher's forward in W8A8 int8
# (ops/quant.py:426-470) inside the fused AdvMix step — measured +2.4%
# step throughput on the W32 headline (496.1 -> 508.0 img/s, PERF.md
# round-4). It shipped opt-in because the accuracy cost ON THE KD PATH
# (int8-rounded teacher heatmaps as the distillation target) was never
# measured. This script measures it: the robust-demo advmix arm is
# trained TWICE from the same standard-run warm start with identical
# seeds/budget — once with the f32 teacher, once with TRAIN.INT8_TEACHER
# true — and both are swept through the full 15x5 on-the-fly corruption
# benchmark. Output: clean PCK / mPC / rPC per arm + deltas.
#
# Usage: scripts/int8_teacher_ab.sh [workdir]   (default /tmp/int8_ab)
# EPOCHS overrides the per-arm budget (both arms get the same override).
set -e
cd "$(dirname "$0")/.."

CFG=experiments/synthetic/res18_64x64_robust_demo.yaml
OUT_ROOT=${OUTPUT_DIR:-output}
OUT=$OUT_ROOT/synthetic/pose_resnet/res18_64x64_robust_demo
ROB=${OUT_ROOT}_robustness/synthetic/pose_resnet/test_corruption
WORK=${1:-/tmp/int8_ab}
mkdir -p "$WORK"

OPTS=(OUTPUT_DIR "$OUT_ROOT" LOG_DIR "${LOG_DIR:-log}")
if [ -n "${EPOCHS:-}" ]; then OPTS+=(TRAIN.END_EPOCH "$EPOCHS"); fi
# AB_EXTRA_OPTS: extra "KEY VALUE ..." config overrides for every arm
# (CPU smokes shrink the synthetic set: "DATASET.SYNTH_LENGTH 64")
if [ -n "${AB_EXTRA_OPTS:-}" ]; then OPTS+=($AB_EXTRA_OPTS); fi
# DISTORTIONS limits the sweep (CPU smoke: DISTORTIONS="gaussian_noise");
# default is the full 15-type benchmark
SWEEP_FLAGS=()
if [ -n "${DISTORTIONS:-}" ]; then
    SWEEP_FLAGS=(--distortions $DISTORTIONS)
fi

ADVMIX_FLAGS=(--advmix --sample_times 3 --kd_mseloss
              --alpha 0.1 --adv_loss_weight 1.0
              --gen_input_chn 9 --downsamples 6)

if [ ! -d "$WORK/standard_state" ]; then
    echo "=== [1/5] standard training (teacher source) ==="
    python tools/train.py --cfg $CFG "${OPTS[@]}"
    cp -r $OUT/final_state "$WORK/standard_state"
fi

echo "=== [2/5] advmix arm A: f32 teacher ==="
python tools/train.py --cfg $CFG "${ADVMIX_FLAGS[@]}" \
    --load_from_D "$WORK/standard_state" "${OPTS[@]}"
rm -rf "$WORK/f32_state"; cp -r $OUT/final_state "$WORK/f32_state"

echo "=== [3/5] advmix arm B: int8 teacher (identical seeds/budget) ==="
python tools/train.py --cfg $CFG "${ADVMIX_FLAGS[@]}" \
    --load_from_D "$WORK/standard_state" \
    TRAIN.INT8_TEACHER true "${OPTS[@]}"
rm -rf "$WORK/int8_state"; cp -r $OUT/final_state "$WORK/int8_state"

sweep () {  # $1 = state dir, $2 = tag
    rm -f $ROB/robust_C.val
    python tools/test_corruption.py --cfg $CFG --on_the_fly \
        "${SWEEP_FLAGS[@]}" TEST.MODEL_FILE "$1" "${OPTS[@]}"
    cp $ROB/robust_C.val "$WORK/robust_$2.val"
    cp $ROB/*.csv "$WORK/results_$2.csv" 2>/dev/null || true
}

echo "=== [4/5] corruption sweep: f32 teacher arm ==="
sweep "$WORK/f32_state" f32
echo "=== [5/5] corruption sweep: int8 teacher arm ==="
sweep "$WORK/int8_state" int8

python - "$WORK" <<'EOF'
import sys

sys.path.insert(0, "scripts")
from demo_summary import read_arm  # write_final_csv's real column names

work = sys.argv[1]
a = read_arm(work, "f32")
b = read_arm(work, "int8")
print(f"{'arm':<14}{'clean':>8}{'mPC':>8}{'rPC':>8}")
print(f"{'f32 teacher':<14}{a[0]:>8.4f}{a[1]:>8.4f}{a[2]:>8.4f}")
print(f"{'int8 teacher':<14}{b[0]:>8.4f}{b[1]:>8.4f}{b[2]:>8.4f}")
print(f"{'delta (B-A)':<14}{b[0]-a[0]:>+8.4f}{b[1]-a[1]:>+8.4f}{b[2]-a[2]:>+8.4f}")
EOF
