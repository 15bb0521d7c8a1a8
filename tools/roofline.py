#!/usr/bin/env python
"""Roofline / speed-of-light accounting for the training step.

Analytic FLOPs + HBM-bytes model of every stage of the fused train
step, evaluated against v5e peaks, so "distance from speed-of-light"
is a number, not a feeling (BASELINE.json north star: "kernels at
speed-of-light per chip"). The per-stage light-speed time is
max(flops/peak_flops, bytes/peak_bw); the step's light-speed bound is
the sum over stages (stages are data-dependent, so no overlap credit).

Workload knobs mirror bench_train.py's measured occupancy; pass the
values from a real run (train_log / BENCHLOG) for an honest bound:

    python tools/roofline.py --points 50000 --rendered 150000 \
        --dyn 25000 --width 320 --height 240 [--measured xplane.json]

With --measured (the per-category ms table emitted by
tools/xplane_report.py --json) it prints achieved-vs-light-speed per
matching category.
"""

from __future__ import annotations

import argparse
import json
import math

# ---- v5e per-chip peaks (public spec: 197 bf16 TFLOP/s, 819 GB/s HBM).
PEAK_BF16 = 197e12
# fp32-accurate MXU work via 3-pass (HIGH) / 6-pass (HIGHEST) bf16
# emulation; the rasterizer + deform default to HIGHEST.
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0
# VPU elementwise fp32 (8 lanes x 128 x ~2 FLOP x ~940 MHz x 4 MXU-free
# issue): ~4 TFLOP/s effective for scan/elementwise-heavy code.
PEAK_VPU = 4e12
HBM_BW = 819e9


def stage(name, flops, bytes_, peak=PEAK_VPU):
    t_flops = flops / peak
    t_bytes = bytes_ / HBM_BW
    return {
        "stage": name,
        "gflop": flops / 1e9,
        "gb": bytes_ / 2**30,
        "light_ms": max(t_flops, t_bytes) * 1e3,
        "bound": "flops" if t_flops > t_bytes else "hbm",
    }


def model(P, rendered, dyn, W, H, tile_h, tile_w, flat, deform_w=256,
          deform_d=8, t_samples=2, n_cams=1, deform_bf16=True):
    pix = tile_h * tile_w
    T = math.ceil(W / tile_w) * math.ceil(H / tile_h)
    if flat:
        K = int(rendered * 1.5) + T * 256  # shrink hysteresis + alignment
        inst_rows = K
    else:
        # dense (T, L) layout: L tracks the deepest tile (campaigns
        # observed 1k-6k); use rendered/T * 8 as a crowding factor.
        L = max(256, int(rendered / T * 8))
        inst_rows = T * L

    stages = []
    # Preprocess fwd+bwd: ~1.5 kFLOP/pt fwd (cov3d/EWA/SH deg3 for
    # 3 color + 2 phasor channel sets), ~2x for bwd; 400 B/pt traffic.
    stages.append(stage("preprocess f+b", P * 4.5e3 * n_cams,
                        P * 800 * n_cams))
    # Binning: depth sort (P) + tile sort (capacity) — lax.sort is
    # ~log2(n) passes of 8B key+payload traffic each.
    cap = int(rendered * 1.5)
    sort_bytes = (P * 8 * math.log2(max(P, 2))
                  + cap * 8 * math.log2(max(cap, 2))) * n_cams
    stages.append(stage("binning sorts+scans", cap * 200 * n_cams,
                        sort_bytes))
    # Feature gather (P,24) -> instance rows, fwd; scatter-add back, bwd.
    stages.append(stage("feature gather+scatter",
                        inst_rows * 24 * 4 * n_cams,
                        inst_rows * 24 * 4 * 3 * n_cams))
    # Forward compositing: per instance-pixel ~45 VPU FLOPs (alpha chain,
    # masks, one Hillis-Steele cumprod amortized) + MXU weighted sums
    # 2*(17 ch * 2) per instance-pixel.
    ip = rendered * pix * n_cams
    stages.append(stage("composite fwd VPU", ip * 45,
                        (inst_rows * 96 + T * pix * 44 * 4) * n_cams))
    stages.append(stage("composite fwd MXU", ip * 68, 0, PEAK_F32_HIGHEST))
    # Backward compositing: ~2.2x fwd VPU (d_alpha chain + 3 extra
    # scans) + 2x MXU (e/e_p products + d_f/d_p).
    stages.append(stage("composite bwd VPU", ip * 100,
                        (inst_rows * 192 + T * pix * 128 * 4) * n_cams))
    stages.append(stage("composite bwd MXU", ip * 136, 0,
                        PEAK_F32_HIGHEST))
    # Deform MLP (dyn rows, t_samples stacked, fwd + bwd = 3x):
    mlp_flops = dyn * t_samples * (deform_d * 2 * deform_w * deform_w) * 3
    stages.append(stage("deform MLP", mlp_flops,
                        dyn * t_samples * deform_w * 8,
                        PEAK_BF16 if deform_bf16 else PEAK_F32_HIGHEST))
    # SSIM (11x11 separable? reference uses full 11x11 conv, 3ch) f+b.
    stages.append(stage("ssim convs", W * H * 3 * 121 * 2 * 3,
                        W * H * 3 * 4 * 8))
    # Adam + densify stats over capacity rows (~60 f32 / row, 3 passes).
    stages.append(stage("adam/densify-stats", P * 60 * 6, P * 60 * 4 * 3))
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=50_000)
    ap.add_argument("--rendered", type=int, default=150_000)
    ap.add_argument("--dyn", type=int, default=25_000)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--tile_h", type=int, default=16)
    ap.add_argument("--tile_w", type=int, default=32)
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--cams", type=int, default=1)
    ap.add_argument("--measured_ms", type=float, default=None,
                    help="measured full-step ms for the MFU line")
    args = ap.parse_args()

    stages = model(args.points, args.rendered, args.dyn, args.width,
                   args.height, args.tile_h, args.tile_w, args.flat,
                   n_cams=args.cams)
    total_light = sum(s["light_ms"] for s in stages)
    total_gflop = sum(s["gflop"] for s in stages)
    print(f"{'stage':28s} {'GFLOP':>8s} {'GB':>7s} {'light ms':>9s} bound")
    for s in stages:
        print(f"{s['stage']:28s} {s['gflop']:8.2f} {s['gb']:7.3f} "
              f"{s['light_ms']:9.3f} {s['bound']}")
    print(f"{'TOTAL':28s} {total_gflop:8.2f} {'':7s} {total_light:9.3f}")
    if args.measured_ms:
        print(f"\nmeasured step: {args.measured_ms:.2f} ms -> "
              f"{total_light / args.measured_ms:.1%} of light speed; "
              # measured_ms is milliseconds: GFLOP / (GFLOP/s * s)
              f"MFU {total_gflop / (PEAK_BF16 / 1e9 * args.measured_ms / 1e3):.2%}"
              )
    print(json.dumps({
        "light_ms": round(total_light, 3),
        "gflop": round(total_gflop, 2),
        "flat": bool(args.flat),
    }))


if __name__ == "__main__":
    main()
