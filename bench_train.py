#!/usr/bin/env python
"""End-to-end training-step benchmark (320x240, 50k points, quads +
deform + flow — the reference's headline workload).

Prints ONE JSON line:
    {"metric": "train_step", "value": <ms/iter>, "unit": "ms/iter",
     "vs_baseline": <baseline 180 ms / measured>}

Baseline: the reference trains 20k iters in <=3600 s on an RTX 3090 at
320x240 (BASELINE.md) = 180 ms/iter.

Methodology (BENCHLOG.md): the tunnel runtime makes per-dispatch
timings meaningless; we run the real Trainer loop (whose pipelined
dispatch keeps the device busy) and report wall-clock over a steady
-state window, with a drain (host fetch of the last metrics) closing
the window so every dispatched step is actually finished.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    # Warm-up must cover the adaptive-capacity settling: occupancy
    # tracking evaluates after shrink_window=200 resolved steps and a
    # shrink recompiles the step — that compile belongs in warm-up, not
    # in the timed steady-state window.
    ap.add_argument("--iters", type=int, default=550)
    ap.add_argument("--warm", type=int, default=250,
                    help="iterations excluded from the timed window")
    ap.add_argument("--points", type=int, default=50_000)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of 20 steady-"
                         "state steps into DIR (parse with "
                         "tools/xplane_report.py)")
    ap.add_argument("--set", action="append", default=[],
                    help="config overrides key=json_value (ablations)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from gftorf_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from gftorf_tpu.config import Config
    from gftorf_tpu.data.generate import write_dataset
    from gftorf_tpu.train.loop import Trainer

    src = f"/tmp/bench_train_scene_{args.width}x{args.height}"
    if not os.path.isdir(src):
        np.random.seed(7)
        write_dataset(src, num_frames=32, width=args.width,
                      height=args.height)

    cfg_dict = dict(
        source_path=src, model_path="/tmp/bench_train_model",
        total_num_views=32,
        tof_image_width=args.width, tof_image_height=args.height,
        color_image_width=args.width, color_image_height=args.height,
        depth_range=15.0, num_points=args.points,
        iterations=args.iters + 1,
        warm_up=10, use_quad=True, dynamic=True, dataset_type="quad",
        random_bg_color=True, optimize_sync_iters=-1,
        flow_loss_iter_start=20, lambda_flow=0.01, lambda_mlp_reg=0.01,
        lambda_color=0.0,
        # steady-state window: no densify events inside the run
        densify_from_iter=10 * args.iters,
        opacity_reset_interval=100 * args.iters,
    )
    for kv in args.set:
        k, v = kv.split("=", 1)
        cfg_dict[k] = json.loads(v)
    cfg = Config.from_dict(cfg_dict)
    np.random.seed(7)
    trainer = Trainer(cfg, startup_artifacts=False)

    # Warm-up: compile every phase program + fill the metric pipeline.
    for _ in range(args.warm):
        trainer.step()
    trainer.drain()

    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(20):
                trainer.step()
            trainer.drain()

    t0 = time.perf_counter()
    outs = []
    for _ in range(args.iters - args.warm):
        outs += trainer.step()
    outs += trainer.drain()
    dt = time.perf_counter() - t0

    n = args.iters - args.warm
    ms = dt / n * 1e3
    assert all(np.isfinite(o["loss"]) for o in outs)
    print(json.dumps({
        "metric": "train_step",
        "value": round(ms, 2),
        "unit": "ms/iter",
        "vs_baseline": round(180.0 / ms, 3),
    }))


if __name__ == "__main__":
    main()
