#!/bin/bash
# Round-4 perf sweep: flat-stream compositor vs dense layout, tile
# shapes, stream chunk sizes, deform-MLP precision. Run on the TPU host
# when the chip is free; each bench_train invocation is self-contained
# (steady-state window methodology, BENCHLOG.md).
set -u
cd "$(dirname "$0")/.."

run() { # label extra...
    local label=$1; shift
    echo "=== $label"
    "$@" 2>&1 | tail -1
}

# selftest first: compiled-kernel parity (dense + flat) on hardware
python tools/tpu_selftest.py || exit 1

# dense baselines (round-3 defaults)
run "dense 16x32 (r3 default)" python bench_train.py
run "dense 16x16" python bench_train.py --set tile_h=16 --set tile_w=16

# flat stream
run "flat 16x32" python bench_train.py --set flat_stream=true
run "flat 16x16" python bench_train.py --set flat_stream=true \
    --set tile_h=16 --set tile_w=16
run "flat 32x32" python bench_train.py --set flat_stream=true \
    --set tile_h=32 --set tile_w=32

# chunk sweeps on the best tile shape (edit after first results)
GFTORF_FLAT_FWD_CHUNK=512 run "flat 16x16 fwd512" \
    python bench_train.py --set flat_stream=true --set tile_h=16 --set tile_w=16
GFTORF_FLAT_BWD_CHUNK=256 run "flat 16x16 bwd256" \
    python bench_train.py --set flat_stream=true --set tile_h=16 --set tile_w=16

# deform precision ablation on the best config
run "flat + deform high" python bench_train.py --set flat_stream=true \
    --set deform_precision='"high"'
run "flat + deform default(bf16)" python bench_train.py \
    --set flat_stream=true --set deform_precision='"default"'

echo SWEEP_DONE
