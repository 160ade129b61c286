#!/bin/bash
# End-to-end AdvMix robustness demonstration on the real chip
# (VERDICT r2 next #5): train the synthetic marker task standard vs
# --advmix (teacher = the standard run), sweep BOTH through the full
# 15x5 on-the-fly corruption benchmark, and report the mPC / clean-PCK
# ratio (rPC) for each. AdvMix's rPC should beat standard's, mirroring
# the reference's headline claim (README.md:60-76) at demo scale.
#
# Usage: scripts/advmix_demo.sh [workdir]   (default /tmp/advmix_demo)
set -e
cd "$(dirname "$0")/.."

CFG=experiments/synthetic/res18_64x64_robust_demo.yaml
OUT=output/synthetic/pose_resnet/res18_64x64_robust_demo
ROB=output_robustness/synthetic/pose_resnet/test_corruption
WORK=${1:-/tmp/advmix_demo}
mkdir -p "$WORK"

# EPOCHS overrides the per-arm epoch budget (all three arms get the SAME
# override, so the equal-optimization-budget comparison is preserved at
# any scale); default is the config's TRAIN.END_EPOCH (200).
OPTS=()
if [ -n "${EPOCHS:-}" ]; then OPTS=(TRAIN.END_EPOCH "$EPOCHS"); fi

echo "=== [1/4] standard training ==="
python tools/train.py --cfg $CFG "${OPTS[@]}"
rm -rf "$WORK/standard_state"
cp -r $OUT/final_state "$WORK/standard_state"

echo "=== [2/4] advmix training (teacher + D init = standard run) ==="
python tools/train.py --cfg $CFG --advmix --sample_times 3 --kd_mseloss \
    --alpha 0.1 --adv_loss_weight 1.0 --gen_input_chn 9 --downsamples 6 \
    --load_from_D "$WORK/standard_state" "${OPTS[@]}"
rm -rf "$WORK/advmix_state"
cp -r $OUT/final_state "$WORK/advmix_state"

echo "=== [2b] equal-budget control: standard continued +200 epochs ==="
# the advmix arm fine-tunes 200 epochs ON TOP of the standard run; the
# honest control gets the same total optimization budget (400 standard
# epochs, same restarted LR schedule) so the mPC/rPC deltas are
# attributable to AdvMix itself, not to extra training (VERDICT r3 #8)
python tools/train.py --cfg $CFG --load_from_D "$WORK/standard_state" "${OPTS[@]}"
rm -rf "$WORK/standard400_state"
cp -r $OUT/final_state "$WORK/standard400_state"

sweep () {  # $1 = state dir, $2 = tag
    rm -f $ROB/robust_C.val
    python tools/test_corruption.py --cfg $CFG --on_the_fly \
        TEST.MODEL_FILE "$1"
    cp $ROB/robust_C.val "$WORK/robust_$2.val"
    cp $ROB/*.csv "$WORK/results_$2.csv" 2>/dev/null || true
}

echo "=== [3/4] corruption sweep: standard ==="
sweep "$WORK/standard_state" standard
echo "=== [3b] corruption sweep: standard400 (equal-budget control) ==="
sweep "$WORK/standard400_state" standard400
echo "=== [4/4] corruption sweep: advmix ==="
sweep "$WORK/advmix_state" advmix

python scripts/demo_summary.py "$WORK"
