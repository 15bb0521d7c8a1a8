#!/bin/bash
# 20k-iteration parity run on the TPU with stall resilience.
#
# The axon TPU tunnel occasionally wedges a dispatch forever (observed
# 2026-08-17: run hung 35+ min at iter ~2750 with all threads blocked on
# the tunnel socket). This wrapper launches train.py in its own process
# group, watches train_log.jsonl for forward progress, and on a stall
# kills the exact process group and relaunches from the latest
# checkpoint (checkpoints every 1000 iters; Trainer.load_checkpoint
# restores model + both Adam states + densify meta + grown capacities,
# tests/test_e2e.py).
#
# Parametric over the scene/run (see tools/parity_campaign.sh for the
# 3-scene campaign of BENCHLOG's "20k parity" section):
#   SCENE   dataset dir (generated if missing)
#   MODEL   model output dir
#   GEN     generate | analytic      (data/generate.py: splat-rendered GT;
#                                     data/analytic.py: ray-traced GT —
#                                     the non-circular parity evidence)
#   LAYOUT  room | slide | blobs     (data/generate.py)
#   KIND    ftorf | torf             (dataset layout + config file)
#   FRAMES  frame count (default 60 ftorf / 30 torf)
#   SEED    dataset seed
#   ITERS   iterations (default 20000)
#   EXTRA   extra train.py args
set -u
# Run against the repo this script lives in (campaigns run from an
# rsync'd snapshot so in-flight edits to /root/repo can't change the
# code mid-campaign).
cd "$(dirname "$0")/.."

KIND=${KIND:-ftorf}
LAYOUT=${LAYOUT:-room}
SEED=${SEED:-11}
ITERS=${ITERS:-20000}
if [ "$KIND" = torf ]; then FRAMES=${FRAMES:-30}; else FRAMES=${FRAMES:-60}; fi
MODEL=${MODEL:-/tmp/parity_model}
SCENE=${SCENE:-/tmp/parity_scene}
LOG=${LOG:-/tmp/parity20k.log}
STALL_SECS=${STALL_SECS:-900}     # no log-file growth for this long = wedged
MAX_RESTARTS=${MAX_RESTARTS:-12}

GEN=${GEN:-generate}

SCENE="$SCENE" LAYOUT="$LAYOUT" KIND="$KIND" FRAMES="$FRAMES" SEED="$SEED" \
GEN="$GEN" python - <<'PY'
import numpy as np, os
import jax; jax.config.update('jax_platforms', 'cpu')
if os.environ['GEN'] == 'analytic':
    from gftorf_tpu.data.analytic import write_dataset
else:
    from gftorf_tpu.data.generate import write_dataset
scene = os.environ['SCENE']
kind = os.environ['KIND']
probe = 'tof' if kind == 'torf' else 'tofType0'
if not os.path.isdir(os.path.join(scene, probe)):
    seed = int(os.environ['SEED'])
    np.random.seed(seed)
    write_dataset(scene, num_frames=int(os.environ['FRAMES']),
                  width=320, height=240, seed=seed,
                  layout=os.environ['LAYOUT'],
                  torf_layout=(kind == 'torf'), static=(kind == 'torf'))
print('scene ready:', scene)
PY

CKPTS=$(seq 1000 1000 "$ITERS")
EVALS="1 $(seq 1000 1000 "$ITERS")"

if [ "$KIND" = torf ]; then
    CONFIG=configs/torf.json
    # synthetic color images are tof-sized (320x240, no 640x480 source)
    KIND_ARGS=(--color_image_width 320 --color_image_height 240
               --color_scale_factor 1.0 --depth_range 15.0
               --dataset_type synthetic)
else
    CONFIG=configs/ftorf.json
    KIND_ARGS=(--lambda_flow 0.0008)
fi

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
    # shellcheck disable=SC2086
    setsid python train.py --config "$CONFIG" \
        --seed 42 \
        --source_path "$SCENE" \
        --model_path "$MODEL" \
        --total_num_views "$FRAMES" \
        --min_depth_fac 0.01 --max_depth_fac 0.45 \
        --iterations "$ITERS" --position_lr_max_steps "$ITERS" \
        --densify_until_iter 12000 \
        --lambda_tof 1.0 --densify_grad_threshold 0.0002 \
        --initial_amplitude 0.02 \
        --feature_amp_lr_init 0.000016 --feature_amp_lr_final 0.000016 \
        "${KIND_ARGS[@]}" \
        --test_iterations $EVALS \
        --save_iterations "$ITERS" \
        --checkpoint_iterations $CKPTS \
        "${resume_args[@]}" \
        ${EXTRA:-} \
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
    # also finished if the run reached the target before a stall-kill landed
    if ls "$MODEL/chkpnt$ITERS.npz" >/dev/null 2>&1; then
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
