#!/bin/bash
# aslide quality ablation (VERDICT r4 item 9): the analytic sliding-
# occluder scene plateaus at ~29 dB / ~12.6k points from iter 7k on —
# is that a schedule artifact or a model limit? Sweep the densification
# schedule knobs against the defaults-campaign baseline
# (tools/parity_campaign_defaults.sh, OUT=/tmp/parity_defaults):
#   longer  — densify_until_iter 16000 (growth for 80% of the run)
#   denser  — densify_grad_threshold 1e-4 (2x more clone/split sites)
#   resets  — opacity_reset_interval 1500 (2x consolidation cadence)
# Same scene, seed and everything else. Reports land in $OUT.
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/aslide_ablation}
mkdir -p "$OUT"

run() { # name extra...
    local name=$1; shift
    echo "=== aslide ablation: $name ($*) ==="
    SCENE=/tmp/parity_defaults/scene_aslide MODEL="$OUT/model_$name" \
    LOG="$OUT/$name.log" KIND=ftorf LAYOUT=slide GEN=analytic \
    FRAMES=60 SEED=13 EXTRA="$*" \
        bash tools/parity20k_watchdog.sh
    python tools/parity_report.py "$OUT/model_$name" \
        | tee "$OUT/report_$name.md"
}

run longer --densify_until_iter 16000
run denser --densify_grad_threshold 0.0001
run resets --opacity_reset_interval 1500

echo ABLATION_DONE
