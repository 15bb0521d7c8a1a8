#!/bin/bash
# One-shot TPU measurement session (run when the axon tunnel is up):
#   1. compiled-kernel selftest (Pallas vs XLA, incl. fused flow)
#   2. headline training-step bench + ablation matrix
#   3. raw rasterizer throughput bench
# Appends one JSON line per result to $OUT (default /tmp/bench_results.jsonl).
# Serial by design: never run two TPU jobs concurrently through the
# tunnel (BENCHLOG.md round-1 finding).
set -u
cd /root/repo
OUT=${OUT:-/tmp/bench_results.jsonl}
TO=${TO:-1800}

run() {
    local label=$1; shift
    echo "=== $label: $*" >&2
    local out rc line
    out=$(timeout "$TO" "$@" 2>/tmp/measure_last_stderr.log)
    rc=$?
    line=$(printf '%s\n' "$out" | tail -1)
    # benchmarks print warnings to stdout too — only a trailing JSON
    # object counts as a result, and the command's own rc is checked
    # (124 = timeout)
    if [ $rc -ne 0 ] || [ "${line:0:1}" != "{" ]; then
        echo "{\"label\": \"$label\", \"error\": $rc}" | tee -a "$OUT"
        tail -5 /tmp/measure_last_stderr.log >&2
    else
        echo "{\"label\": \"$label\", \"result\": $line}" | tee -a "$OUT"
    fi
}

run selftest python tools/tpu_selftest.py
run train_default python bench.py
run train_dup4 python bench_train.py --set dup_factor=4
run train_dup2 python bench_train.py --set dup_factor=2
run train_no_compact python bench_train.py --set compact_render=false
run train_no_flow python bench_train.py --set lambda_flow=0.0
run train_static_only python bench_train.py --set dynamic=false --set lambda_flow=0.0 --set lambda_mlp_reg=0.0
run train_xla_compositor python bench_train.py --set use_pallas=false
run rasterizer python bench.py --rasterizer
echo "DONE -> $OUT" >&2
