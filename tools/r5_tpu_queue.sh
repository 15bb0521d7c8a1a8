#!/bin/bash
# Round-5 session TPU work queue: keeps the single chip busy end-to-end.
#   1. aroom decay A/B: base 0->12k + three resume arms (r4all/ssim/flow)
#   2. 100k-point (atorf-scale) throughput at shipped defaults
#   3. steady-state profile trace for the roofline/MFU table
# Stages log to /tmp/r5q_*.log; stop a stage by killing its pgid.
set -u
cd "$(dirname "$0")/.."

# wait for any currently-running bench to finish
if [ -n "${WAIT_PID:-}" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
fi

bash tools/aroom_decay_ab.sh base r4all ssim flow \
    > /tmp/r5q_aroom_ab.log 2>&1

python bench_train.py --points 100000 --iters 400 --warm 200 \
    > /tmp/r5q_bench100k.log 2>&1

python bench_train.py --profile /tmp/r5q_trace \
    > /tmp/r5q_profile.log 2>&1

echo R5_QUEUE_DONE
