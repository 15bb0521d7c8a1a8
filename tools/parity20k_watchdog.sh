#!/bin/bash
# 20k-iteration parity validation on the TPU with stall resilience.
#
# The axon TPU tunnel occasionally wedges a dispatch forever (observed
# 2026-08-17: run hung 35+ min at iter ~2750 with all threads blocked on
# the tunnel socket). This wrapper launches train.py in its own process
# group, watches train_log.jsonl for forward progress, and on a stall
# kills the exact process group and relaunches from the latest
# checkpoint (checkpoints every 1000 iters; Trainer.load_checkpoint
# restores model + both Adam states + densify meta, tests/test_e2e.py).
#
# Scene/hyperparams: reference ftorf configuration (configs/ftorf.json +
# the run_optimize synthetic-scene row) on a 60-frame 320x240 synthetic
# F-ToRF "room" scene. See BENCHLOG.md "20k parity run".
set -u
cd /root/repo

MODEL=/tmp/parity_model
SCENE=/tmp/parity_scene
LOG=/tmp/parity20k.log
STALL_SECS=${STALL_SECS:-900}     # no log-file growth for this long = wedged
MAX_RESTARTS=${MAX_RESTARTS:-12}

python - <<'PY'
import numpy as np, os
import jax; jax.config.update('jax_platforms', 'cpu')
from gftorf_tpu.data.generate import write_dataset
if not os.path.isdir('/tmp/parity_scene/tofType0'):
    np.random.seed(11)
    write_dataset('/tmp/parity_scene', num_frames=60, width=320, height=240,
                  seed=11, layout='room')
print('scene ready')
PY

CKPTS=$(seq 1000 1000 20000)

launch() {
    local resume_args=()
    # newest checkpoint by iteration number, if any
    local latest
    latest=$(ls "$MODEL"/chkpnt*.npz 2>/dev/null |
             sed 's/.*chkpnt\([0-9]*\)\.npz/\1 &/' | sort -n | tail -1 |
             cut -d' ' -f2)
    if [ -n "${latest:-}" ]; then
        resume_args=(--start_checkpoint "$latest")
        echo "[watchdog] resuming from $latest" | tee -a "$LOG"
    fi
    setsid python train.py --config configs/ftorf.json \
        --seed 42 \
        --source_path "$SCENE" \
        --model_path "$MODEL" \
        --total_num_views 60 \
        --min_depth_fac 0.01 --max_depth_fac 0.45 \
        --iterations 20000 --position_lr_max_steps 20000 \
        --densify_until_iter 12000 \
        --lambda_tof 1.0 --densify_grad_threshold 0.0002 \
        --lambda_flow 0.0008 \
        --initial_amplitude 0.02 \
        --feature_amp_lr_init 0.000016 --feature_amp_lr_final 0.000016 \
        --test_iterations 1 1000 2000 3000 4000 5000 6000 7000 8000 10000 12000 14000 16000 18000 20000 \
        --save_iterations 10000 20000 \
        --checkpoint_iterations $CKPTS \
        "${resume_args[@]}" \
        --quiet >> "$LOG" 2>&1 &
    TRAIN_PID=$!
}

restarts=0
while :; do
    launch
    echo "[watchdog] train pid $TRAIN_PID (restart #$restarts)" | tee -a "$LOG"
    # monitor: process alive + log growing
    last_size=$(stat -c %s "$MODEL/train_log.jsonl" 2>/dev/null || echo 0)
    last_change=$(date +%s)
    while kill -0 "$TRAIN_PID" 2>/dev/null; do
        sleep 30
        size=$(stat -c %s "$MODEL/train_log.jsonl" 2>/dev/null || echo 0)
        now=$(date +%s)
        if [ "$size" != "$last_size" ]; then
            last_size=$size; last_change=$now
        elif [ $((now - last_change)) -ge "$STALL_SECS" ]; then
            echo "[watchdog] STALL: no log growth in ${STALL_SECS}s, killing pgid $TRAIN_PID" | tee -a "$LOG"
            kill -9 -- "-$TRAIN_PID" 2>/dev/null
            sleep 10
            break
        fi
    done
    if wait "$TRAIN_PID" 2>/dev/null; then
        echo "[watchdog] PARITY20K_DONE" | tee -a "$LOG"
        exit 0
    fi
    # also finished if the run reached 20000 before a stall-kill landed
    if ls "$MODEL"/chkpnt20000.npz >/dev/null 2>&1; then
        echo "[watchdog] PARITY20K_DONE (checkpoint present)" | tee -a "$LOG"
        exit 0
    fi
    restarts=$((restarts + 1))
    if [ "$restarts" -gt "$MAX_RESTARTS" ]; then
        echo "[watchdog] giving up after $MAX_RESTARTS restarts" | tee -a "$LOG"
        exit 1
    fi
    sleep 20
done
