#!/bin/bash
# Round-3 perf session: run AFTER the parity campaign releases the TPU
# (the axon tunnel serializes clients — concurrent runs starve).
#
#   bash tools/perf_sweep.sh [OUT=/tmp/perf_sweep]
#
# 1. tpu_selftest (compiled-kernel exactness gate)
# 2. bench_train.py matrix: chunk sizes x shrink ablation
# 3. bench.py rasterizer headline re-measure (VERDICT weak #7)
set -u
cd /root/repo
OUT=${1:-/tmp/perf_sweep}
mkdir -p "$OUT"

run() { # name env... -- args...
    local name=$1; shift
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    echo "=== $name (env: ${envs[*]:-none}; args: $*)" | tee -a "$OUT/log"
    env "${envs[@]}" timeout 1800 python bench_train.py "$@" \
        2>&1 | tee "$OUT/$name.out" | tail -1 | tee -a "$OUT/log"
}

if [ -z "${SKIP_SELFTEST:-}" ]; then
    echo "== selftest ==" | tee -a "$OUT/log"
    timeout 1200 python tools/tpu_selftest.py 2>&1 | tail -2 | tee -a "$OUT/log" \
        || { echo "SELFTEST FAILED — aborting sweep" | tee -a "$OUT/log"; exit 1; }
fi

# Baseline: current defaults (fwd 512 / bwd 256, shrink on)
run base GFTORF_X=1 -- --iters 550 --warm 250
# Shrink ablation: pin the static buffers at config defaults
run noshrink GFTORF_X=1 -- --iters 550 --warm 250 --set shrink_window=0
# Chunk sweep
run f256 GFTORF_FWD_CHUNK=256 -- --iters 550 --warm 250
run f128 GFTORF_FWD_CHUNK=128 -- --iters 550 --warm 250
run b128 GFTORF_BWD_CHUNK=128 -- --iters 550 --warm 250
run b512 GFTORF_BWD_CHUNK=512 -- --iters 550 --warm 250
run f256b128 GFTORF_FWD_CHUNK=256 GFTORF_BWD_CHUNK=128 -- --iters 550 --warm 250
# Deform-MLP MXU precision (numerics knob — measured, not defaulted)
run dp_high GFTORF_X=1 -- --iters 550 --warm 250 --set 'deform_precision="high"'
run dp_def GFTORF_X=1 -- --iters 550 --warm 250 --set 'deform_precision="default"'

echo "== rasterizer headline ==" | tee -a "$OUT/log"
timeout 1200 python bench.py --rasterizer 2>&1 | tail -1 | tee -a "$OUT/log"
echo "== train headline ==" | tee -a "$OUT/log"
timeout 1800 python bench.py 2>&1 | tail -1 | tee -a "$OUT/log"
echo "SWEEP_DONE" | tee -a "$OUT/log"
