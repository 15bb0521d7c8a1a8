#!/usr/bin/env python
"""Render/evaluation driver: render trained models to image sequences.

Reference counterpart: render.py (render_sets :317-362, render_set
:95-209). Loads cfg_args_full.json from the model path, the trained
PLY + offsets + deform weights, renders the train/test sequences (and
spiral paths for ToRF scenes), and writes per-channel pngs/npys plus
animated previews.

Usage:
    python render.py --model_path output/scene [--iteration 30000]
                     [--skip_train] [--skip_test] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--skip_video", action="store_true")
    parser.add_argument("--max_frames", type=int, default=0)
    parser.add_argument("--proxy_pcd", action="store_true",
                        help="write per-frame GT-vs-rendered depth proxy "
                             "point clouds (proxy_pcd/frame_N/input.ply)")
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from gftorf_tpu.render_sets import render_sets

    render_sets(args.model_path, args.iteration, skip_train=args.skip_train,
                skip_test=args.skip_test, skip_video=args.skip_video,
                max_frames=args.max_frames)

    if args.proxy_pcd:
        from gftorf_tpu.render_sets import load_trained
        from gftorf_tpu.train.export import write_proxy_pcds

        trainer, _, it = load_trained(args.model_path, args.iteration)
        out = write_proxy_pcds(trainer, it, max_frames=args.max_frames)
        print(f"proxy point clouds written to {out}")


if __name__ == "__main__":
    main()
