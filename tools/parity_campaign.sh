#!/bin/bash
# The 20k-iteration quality-parity campaign (BASELINE.md target: match
# the reference's PSNR + ToF depth-MAE at 20k iters,
# /root/reference/README.md:45-46, train.py:508-603).
#
# Three scenes, run sequentially on the one available TPU chip:
#   1. ftorf/room  — full-coverage opaque room + oscillating ball
#   2. ftorf/slide — sliding rigid occluder (occlusion/disocclusion,
#                    linear non-periodic motion)
#   3. torf/static — static ToRF-layout capture of the room scene
#
# Each run goes through tools/parity20k_watchdog.sh (stall-kill-resume).
# Afterwards: python tools/parity_report.py <model_dir> per scene.
set -u
cd /root/repo

OUT=${OUT:-/tmp/parity}
mkdir -p "$OUT"

run() { # name kind layout frames seed
    local name=$1 kind=$2 layout=$3 frames=$4 seed=$5
    echo "=== parity campaign: $name ($kind/$layout, ${frames}f) ==="
    SCENE="$OUT/scene_$name" MODEL="$OUT/model_$name" \
    LOG="$OUT/$name.log" KIND="$kind" LAYOUT="$layout" \
    FRAMES="$frames" SEED="$seed" \
        bash tools/parity20k_watchdog.sh
    local rc=$?
    echo "=== $name done (rc=$rc) ==="
    python tools/parity_report.py "$OUT/model_$name" \
        | tee "$OUT/report_$name.md"
    return $rc
}

run room  ftorf room  60 11
run slide ftorf slide 60 13
run torf  torf  room  30 17

echo "CAMPAIGN_DONE"
