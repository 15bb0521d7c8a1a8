#!/bin/bash
# The 20k-iteration quality-parity campaign on ANALYTIC (ray-traced,
# rasterizer-independent) ground truth — the non-circular counterpart of
# tools/parity_campaign.sh. GT comes from data/analytic.py: closed-form
# ray-surface intersections + the exact phasor model; the rasterizer is
# never involved in producing it, so the resulting PSNR / depth-MAE
# tables measure capture parity, not self-consistency
# (BASELINE.md: match the reference's 20k-iteration quality,
# /root/reference/README.md:45-46).
#
# Scenes:
#   1. aroom  — corrugated textured wall + half-wall + oscillating sphere
#   2. aslide — wall + sliding textured box (occlusion/disocclusion)
#   3. atorf  — static capture of the room geometry, ToRF layout
#
# Runs at the round-3-campaign-proven tile shape (16x16): the 16x32
# default is revalidated separately once the flat-stream compositor
# changes the backward kernel's VMEM equation (measured: 16x32 with
# max_per_tile>=3072 overflows scoped VMEM, pallas_composite._bwd_pref).
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/parity_an}
mkdir -p "$OUT"

run() { # name kind layout frames seed extra...
    local name=$1 kind=$2 layout=$3 frames=$4 seed=$5; shift 5
    echo "=== analytic campaign: $name ($kind/$layout, ${frames}f) ==="
    SCENE="$OUT/scene_$name" MODEL="$OUT/model_$name" \
    LOG="$OUT/$name.log" KIND="$kind" LAYOUT="$layout" GEN=analytic \
    FRAMES="$frames" SEED="$seed" EXTRA="--tile_h 16 --tile_w 16 $*" \
        bash tools/parity20k_watchdog.sh
    local rc=$?
    echo "=== $name done (rc=$rc) ==="
    python tools/parity_report.py "$OUT/model_$name" \
        | tee "$OUT/report_$name.md"
    return $rc
}

run aroom  ftorf room  60 11
run aslide ftorf slide 60 13
run atorf  torf  room  30 17

echo "CAMPAIGN_DONE"
