#!/bin/bash
# A/B attribution of the round-5 aroom post-freeze regression: resume
# the defaults-campaign aroom run from iteration 14000 (last eval before
# the 55.4 -> 53.9 dB drop) under different deform-MLP MXU precisions
# and compare the 20k endpoint. Everything else (scene, config, seed,
# checkpointed state) is identical to tools/parity_campaign_defaults.sh.
#
# Usage: bash tools/precision_resume_ab.sh [precision ...]
#   (default: highest default — i.e. the fp32-equivalent tier vs the
#    shipped single-pass bf16 tier)
set -u
cd "$(dirname "$0")/.."

SRC=${SRC:-/tmp/parity_defaults/scene_aroom}
BASE=${BASE:-/tmp/parity_defaults/model_aroom}
OUT=${OUT:-/tmp/precision_ab}
CK=${CK:-14000}
ITERS=20000

for prec in "${@:-highest default}"; do
    M="$OUT/aroom_${prec}_from${CK}"
    mkdir -p "$M"
    cp "$BASE/chkpnt${CK}.npz" "$M/"
    echo "=== resume aroom @${CK} deform_precision=$prec ==="
    python train.py --config configs/ftorf.json \
        --seed 42 \
        --source_path "$SRC" \
        --model_path "$M" \
        --total_num_views 60 \
        --min_depth_fac 0.01 --max_depth_fac 0.45 \
        --iterations $ITERS --position_lr_max_steps $ITERS \
        --densify_until_iter 12000 \
        --lambda_tof 1.0 --densify_grad_threshold 0.0002 \
        --initial_amplitude 0.02 \
        --feature_amp_lr_init 0.000016 --feature_amp_lr_final 0.000016 \
        --lambda_flow 0.0008 \
        --deform_precision "$prec" \
        --test_iterations 15000 16000 17000 18000 19000 20000 \
        --save_iterations $ITERS \
        --start_checkpoint "$M/chkpnt${CK}.npz" \
        --quiet 2>&1 | grep -E "eval|complete" | tail -8
done
echo AB_DONE
