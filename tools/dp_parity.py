#!/usr/bin/env python
"""Data-parallel convergence parity: Trainer at mesh (1,1) vs (2,4).

SURVEY §7.1 gates the camera-batching knob (DP: 2 cameras/step with
pmean'd grads vs the reference's 1 camera/iter, train.py:159) on a
convergence validation. This runs both configurations on the SAME
analytic-GT scene, same seeds, through densify events and an opacity
reset, and writes the eval-metric trajectories side by side.

Run on CPU with 8 virtual devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/dp_parity.py [--iters 3600] [--out reports/...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def run(mesh_data, mesh_shards, src, model_dir, iters, eval_every,
        width=64, height=48, points=2000, frames=8):
    import random as pyrandom

    from gftorf_tpu.config import Config
    from gftorf_tpu.train.evaluate import evaluate_and_report
    from gftorf_tpu.train.loop import Trainer

    np.random.seed(1234)
    pyrandom.seed(1234)
    cfg = Config.from_dict(dict(
        source_path=src, model_path=model_dir,
        total_num_views=frames, tof_image_width=width,
        tof_image_height=height,
        color_image_width=width, color_image_height=height,
        depth_range=15.0, num_points=points, iterations=iters,
        warm_up=100, densify_from_iter=500, densification_interval=100,
        densify_until_iter=int(iters * 0.6), opacity_reset_interval=3000,
        lambda_color=0.0, lambda_tof=1.0, random_bg_color=True,
        position_lr_max_steps=iters, dataset_type="quad",
        use_quad=True, dynamic=True, optimize_sync_iters=-1,
        mesh_data=mesh_data, mesh_shards=mesh_shards, seed=42,
    ))
    trainer = Trainer(cfg)
    curve = []
    for it in range(1, iters + 1):
        trainer.step()
        if it % eval_every == 0 or it == iters:
            trainer.drain()
            rep = evaluate_and_report(trainer)["test"]
            rep["iteration"] = it
            rep["num_points"] = int(trainer.model.aux.alive.sum())
            curve.append(rep)
            print(f"[{mesh_data}x{mesh_shards}] it {it}: "
                  f"psnr_p {rep['psnr_p']:.2f} mae {rep['mae_d_tof']:.4f} "
                  f"pts {rep['num_points']}", flush=True)
    trainer.drain()
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3600)
    ap.add_argument("--eval_every", type=int, default=400)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--points", type=int, default=2000)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--bound_psnr", type=float, default=1.0,
                    help="pass bound: DP may not end more than this many "
                         "dB BELOW single-device (better is fine: the "
                         "2-camera batch is a lower-variance estimator)")
    ap.add_argument("--bound_mae", type=float, default=0.10,
                    help="pass bound: DP may not end more than this "
                         "relative fraction ABOVE single-device mae_d")
    ap.add_argument("--out", default="reports/dp_parity_r05.md")
    ap.add_argument("--tmp", default="/tmp/dp_parity")
    args = ap.parse_args()

    src = os.path.join(args.tmp,
                       f"scene_{args.width}x{args.height}_{args.frames}")
    if not os.path.isdir(os.path.join(src, "tofType0")):
        from gftorf_tpu.data.analytic import write_dataset

        write_dataset(src, layout="room", num_frames=args.frames,
                      width=args.width, height=args.height, supersample=2)

    kw = dict(width=args.width, height=args.height, points=args.points,
              frames=args.frames)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    c11 = run(1, 1, src, os.path.join(args.tmp, "m11"), args.iters,
              args.eval_every, **kw)
    # checkpoint each arm's curve as it lands (a 4-core host takes hours
    # per arm; a crash or round-end must not lose the finished arm)
    json.dump(c11, open(args.out + ".c11.json", "w"))
    c24 = run(2, 4, src, os.path.join(args.tmp, "m24"), args.iters,
              args.eval_every, **kw)
    json.dump(c24, open(args.out + ".c24.json", "w"))

    fa, fb = c11[-1], c24[-1]
    dpsnr = fb["psnr_p"] - fa["psnr_p"]
    dmae = (fb["mae_d_tof"] - fa["mae_d_tof"]) / max(fa["mae_d_tof"], 1e-9)
    ok = dpsnr >= -args.bound_psnr and dmae <= args.bound_mae

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# DP convergence parity: mesh (1,1) vs (2,4)\n\n"
            f"Same analytic-GT scene ({args.width}x{args.height}, "
            f"{args.frames} frames, room layout, {args.points} init "
            "points), same\n"
            "seeds and camera order, through densification and the 3000-\n"
            "iter opacity reset. (2,4) consumes 2 cameras/step with\n"
            "pmean'd grads (SURVEY §7.1 deviation knob); the reference\n"
            "trains 1 camera/iter (train.py:159).\n\n"
            f"**Acceptance bound** (one-sided — DP must not degrade "
            f"convergence): final psnr_p(2x4) >= psnr_p(1x1) - "
            f"{args.bound_psnr} dB and mae_d(2x4) <= mae_d(1x1) * "
            f"{1 + args.bound_mae:.2f}.\n\n"
            "| iter | psnr_p 1x1 | psnr_p 2x4 | mae_d 1x1 | mae_d 2x4 "
            "| pts 1x1 | pts 2x4 |\n|---|---|---|---|---|---|---|\n"
        )
        for a, b in zip(c11, c24):
            f.write(
                f"| {a['iteration']} | {a['psnr_p']:.2f} | {b['psnr_p']:.2f}"
                f" | {a['mae_d_tof']:.4f} | {b['mae_d_tof']:.4f}"
                f" | {a['num_points']} | {b['num_points']} |\n"
            )
        f.write(
            f"\nFinal delta: psnr_p {dpsnr:+.2f} dB, mae_d_tof "
            f"{dmae:+.1%} (2x4 relative to 1x1). "
            f"**{'PASS' if ok else 'FAIL'}** against the bound above.\n"
        )
        json.dump({"c11": c11, "c24": c24, "pass": ok},
                  open(args.out.replace(".md", ".json"), "w"))
    print(f"wrote {args.out} ({'PASS' if ok else 'FAIL'})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
