#!/usr/bin/env python
"""Multi-chip scaling measurement + ICI communication model.

Real multi-chip hardware is unavailable in this environment (one
tunneled v5e chip), so this tool reports what IS measurable and models
the rest (SURVEY §2.3 scaling-efficiency target, BASELINE.md):

1. **Collective-volume census** (exact, platform-independent): traces
   the compiled train_step for each mesh shape and sums the bytes moved
   by every collective op in the optimized HLO (all-gather,
   reduce-scatter, all-reduce, collective-permute). These are the bytes
   that ride ICI on a real slice.
2. **ICI-bandwidth projection**: per-step collective time on a v5p ring
   (90 GB/s/link/direction, 2 links per torus axis used by a 1-D ring)
   vs the measured single-chip step time -> projected scaling
   efficiency at n chips.
3. **Virtual-mesh wall-clock** (optional, --measure): the 8-way CPU
   mesh trend. On a 4-core host the 8 virtual devices timeshare cores,
   so this measures correctness + trend only, not speedup; recorded for
   completeness.

Usage:
    python tools/multichip_scaling.py [--points 100000] [--measure]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of collective ops in optimized HLO text."""
    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f16": 2, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}
    sums: dict = {}
    # e.g.:  %all-gather.3 = f32[131072,24]{1,0} all-gather(...)
    pat = re.compile(
        r"=\s*(?:\()?\s*([a-z0-9]+)\[([0-9,]*)\][^=]*?\s"
        r"(all-gather|all-reduce|reduce-scatter|collective-permute|"
        r"all-to-all)\(",
    )
    for m in pat.finditer(hlo_text):
        dt, shape, op = m.group(1), m.group(2), m.group(3)
        if dt not in dt_bytes:
            continue
        n = 1
        for d in shape.split(","):
            if d:
                n *= int(d)
        sums[op] = sums.get(op, 0) + n * dt_bytes[dt]
    return sums


def build_trainer(points, width, height, mesh_data, mesh_shards, iters=40):
    from gftorf_tpu.config import Config
    from gftorf_tpu.data.generate import write_dataset
    from gftorf_tpu.train.loop import Trainer

    src = f"/tmp/scaling_scene_{width}x{height}"
    if not os.path.isdir(os.path.join(src, "tofType0")):
        np.random.seed(7)
        write_dataset(src, num_frames=8, width=width, height=height)
    cfg = Config.from_dict(dict(
        source_path=src, model_path="/tmp/scaling_model",
        total_num_views=8,
        tof_image_width=width, tof_image_height=height,
        color_image_width=width, color_image_height=height,
        depth_range=15.0, num_points=points, iterations=iters + 1,
        warm_up=10, use_quad=True, dynamic=True, dataset_type="quad",
        random_bg_color=True, optimize_sync_iters=-1,
        flow_loss_iter_start=15, lambda_flow=0.01, lambda_mlp_reg=0.01,
        densify_from_iter=10 * iters, opacity_reset_interval=100 * iters,
        mesh_data=mesh_data, mesh_shards=mesh_shards,
    ))
    np.random.seed(7)
    return Trainer(cfg, startup_artifacts=False)


def trace_collectives(points, width, height, shapes):
    """Compile the real train_step per mesh shape; census its HLO."""
    import jax

    from gftorf_tpu.train.step import train_step

    rows = []
    for (d, s) in shapes:
        tr = build_trainer(points, width, height, d, s)
        static = tr._static_for(30)  # steady state: dynamic + flow on
        idx = (np.zeros((d,), np.int32) if d > 1 else 0)
        lowered = jax.jit(
            train_step, static_argnums=(0,)
        ).lower(static, tr.model, tr.deform, tr.deform_adam,
                tr.scene.train_frames, idx, 30, tr.key)
        hlo = lowered.compile().as_text()
        sums = collective_bytes(hlo)
        rows.append(((d, s), sums))
        del tr
        jax.clear_caches()
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--measure", action="store_true",
                    help="also time the virtual-mesh wall clock (slow)")
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    shapes = [(1, 1), (1, 8), (2, 4), (8, 1)]
    print("== collective-volume census (optimized HLO, bytes/step) ==")
    census = trace_collectives(args.points, args.width, args.height, shapes)
    report = {"points": args.points, "census": []}
    # v5p: 90 GB/s per link per direction; a 1-D ring over one torus
    # axis moves (n-1)/n of the payload through each link, full duplex.
    BW = 90e9
    for (shape, sums) in census:
        total = sum(sums.values())
        n = shape[0] * shape[1]
        ici_s = (total * (n - 1) / max(n, 1)) / BW if n > 1 else 0.0
        row = {"mesh": list(shape), "bytes": sums, "total_bytes": total,
               "ici_projection_ms_v5p": round(ici_s * 1e3, 3)}
        report["census"].append(row)
        print(json.dumps(row))

    if args.measure:
        print("== virtual 8-device CPU mesh wall-clock (trend only) ==")
        for (d, s) in shapes:
            tr = build_trainer(args.points, args.width, args.height, d, s,
                               iters=args.iters)
            for _ in range(10):
                tr.step()
            tr.drain()
            t0 = time.perf_counter()
            for _ in range(args.iters - 10):
                tr.step()
            tr.drain()
            dt = (time.perf_counter() - t0) / (args.iters - 10)
            row = {"mesh": [d, s], "cpu_mesh_ms_per_iter": round(dt * 1e3, 1)}
            report.setdefault("cpu_mesh", []).append(row)
            print(json.dumps(row))
            del tr
            jax.clear_caches()

    with open("/tmp/multichip_scaling.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote /tmp/multichip_scaling.json")


if __name__ == "__main__":
    main()
