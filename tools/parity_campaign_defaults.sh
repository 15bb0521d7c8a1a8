#!/bin/bash
# 20k validation of the SHIPPED defaults (VERDICT r3 item 3): the
# round-4 analytic campaign ran at the campaign-proven 16x16 tile shape;
# this re-runs the two dynamic scenes with NO tile/precision overrides,
# i.e. whatever config.py ships (round 4: flat-stream compositor,
# 16x32 tiles, deform-MLP precision per TpuParams). Compare the
# resulting tables against reports/parity_r04/report_{aroom,aslide}.md —
# accept the defaults if |delta PSNR| <= 0.2 dB and depth-MAE within 5%,
# else revert the default (BENCHLOG round-4 criteria).
set -u
cd "$(dirname "$0")/.."

OUT=${OUT:-/tmp/parity_defaults}
mkdir -p "$OUT"

run() { # name kind layout frames seed
    local name=$1 kind=$2 layout=$3 frames=$4 seed=$5; shift 5
    echo "=== defaults campaign: $name ($kind/$layout, ${frames}f) ==="
    SCENE="$OUT/scene_$name" MODEL="$OUT/model_$name" \
    LOG="$OUT/$name.log" KIND="$kind" LAYOUT="$layout" GEN=analytic \
    FRAMES="$frames" SEED="$seed" EXTRA="$*" \
        bash tools/parity20k_watchdog.sh
    local rc=$?
    echo "=== $name done (rc=$rc) ==="
    python tools/parity_report.py "$OUT/model_$name" \
        | tee "$OUT/report_$name.md"
    return $rc
}

# Same seeds/layouts as tools/parity_campaign_analytic.sh so the GT is
# identical and the tables are directly comparable.
run aroom  ftorf room  60 11
run aslide ftorf slide 60 13

echo "CAMPAIGN_DONE"
