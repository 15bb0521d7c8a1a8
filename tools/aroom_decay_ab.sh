#!/bin/bash
# Attribution of the round-5 aroom post-freeze decay (BENCHLOG "The
# aroom -2.3 dB"): train 0->12k ONCE at the shipped defaults (the curve
# matches r4 through 12k: 55.50 vs 55.81 dB), then resume 12k->20k under
# per-suspect toggles. The culprit is whichever toggle recovers r4's
# 55.8 dB endpoint; bf16 deform-MLP precision is already exonerated
# (tools/precision_resume_ab.sh, all four arms ~53.6).
#
#   base       shipped defaults, 0->12k, checkpoints every 1000
#   arm r4all  conv-SSIM + runtime flow gating + deform high + 16x16
#              (the full round-4 semantic configuration)
#   arm ssim   conv-SSIM only
#   arm flow   runtime (lax.cond) flow gating only
#
# Usage: bash tools/aroom_decay_ab.sh [base|r4all|ssim|flow ...]
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/aroom_ab}
SCENE="$OUT/scene_aroom"
BASE="$OUT/base"
mkdir -p "$OUT"

gen_scene() {
    SCENE="$SCENE" python - <<'PY'
import numpy as np, os
import jax; jax.config.update('jax_platforms', 'cpu')
from gftorf_tpu.data.analytic import write_dataset
scene = os.environ['SCENE']
if not os.path.isdir(os.path.join(scene, 'tofType0')):
    np.random.seed(11)
    write_dataset(scene, num_frames=60, width=320, height=240, seed=11,
                  layout='room', torf_layout=False, static=False)
print('scene ready:', scene)
PY
}

COMMON=(--config configs/ftorf.json --seed 42
        --source_path "$SCENE" --total_num_views 60
        --min_depth_fac 0.01 --max_depth_fac 0.45
        --iterations 20000 --position_lr_max_steps 20000
        --densify_until_iter 12000
        --lambda_tof 1.0 --densify_grad_threshold 0.0002
        --initial_amplitude 0.02
        --feature_amp_lr_init 0.000016 --feature_amp_lr_final 0.000016
        --lambda_flow 0.0008)

run_base() {
    gen_scene
    mkdir -p "$BASE"
    echo "=== base 0->12k (shipped defaults) ==="
    setsid python train.py "${COMMON[@]}" \
        --model_path "$BASE" \
        --test_iterations $(seq 2000 2000 12000) \
        --checkpoint_iterations $(seq 1000 1000 12000) \
        --quiet > "$OUT/base.log" 2>&1 &
    local pid=$!
    # kill once the 12k checkpoint lands (we only need 0->12k)
    while kill -0 "$pid" 2>/dev/null; do
        sleep 20
        if [ -f "$BASE/chkpnt12000.npz" ]; then
            sleep 5; kill -9 -- "-$pid" 2>/dev/null; break
        fi
    done
    wait "$pid" 2>/dev/null
    grep -E "eval" "$OUT/base.log" | tail -8
    [ -f "$BASE/chkpnt12000.npz" ] || { echo "base FAILED"; exit 1; }
}

run_arm() { # name env... -- extra-args...
    local name=$1; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    local M="$OUT/arm_$name"
    mkdir -p "$M"
    cp "$BASE/chkpnt12000.npz" "$M/"
    echo "=== arm $name (${envs[*]:-}; $*) ==="
    env "${envs[@]}" python train.py "${COMMON[@]}" \
        --model_path "$M" \
        --test_iterations 13000 14000 15000 16000 17000 18000 19000 20000 \
        --save_iterations 20000 \
        --start_checkpoint "$M/chkpnt12000.npz" \
        "$@" --quiet > "$OUT/arm_$name.log" 2>&1
    grep -E "eval" "$OUT/arm_$name.log" | tail -8
}

for what in "${@:-base r4all}"; do
    case $what in
        base)  run_base ;;
        r4all) run_arm r4all GFTORF_SSIM_IMPL=conv GFTORF_STATIC_FLOW=0 \
                   -- --deform_precision high --tile_h 16 --tile_w 16 ;;
        ssim)  run_arm ssim GFTORF_SSIM_IMPL=conv -- ;;
        flow)  run_arm flow GFTORF_STATIC_FLOW=0 -- ;;
        ctrl)  run_arm ctrl -- ;;
        compact) run_arm compact GFTORF_COMPACT_LAYOUT=0 -- ;;
        *) echo "unknown arm $what"; exit 1 ;;
    esac
done
echo AB_DONE
