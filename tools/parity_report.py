#!/usr/bin/env python
"""Summarize a train_log.jsonl into a parity table + step-time stats.

Usage: python tools/parity_report.py <model_path_or_train_log.jsonl>

Prints a markdown table of eval metrics over iterations (phasor PSNR,
ToF depth MAE, color PSNR — the quantities the reference's
training_report tracks, /root/reference/train.py:508-603) plus
steady-state iteration timing percentiles, ready for BENCHLOG.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def load(path: str):
    if os.path.isdir(path):
        path = os.path.join(path, "train_log.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


def main():
    recs = load(sys.argv[1] if len(sys.argv) > 1 else ".")
    evals = [r for r in recs if "eval" in r]
    steps = [r for r in recs if "iter_time" in r]

    print("| iter | psnr_p (dB) | mae_d_tof | psnr_color (dB) | l1_p | points |")
    print("|---|---|---|---|---|---|")
    pts_by_iter = {r["iteration"]: r.get("num_points") for r in steps}
    for r in evals:
        t = r["eval"]["test"]
        it = r["iteration"]
        pts = pts_by_iter.get(it) or pts_by_iter.get(it - (it % 50)) or ""
        print(f"| {it} | {t['psnr_p']:.2f} | {t['mae_d_tof']:.4f} "
              f"| {t['psnr_color']:.2f} | {t['l1_p']:.5f} | {pts} |")

    if steps:
        # steady state: skip the first quarter (compiles, densify growth)
        times = np.array([r["iter_time"] for r in steps])
        ss = times[len(times) // 4:]
        print(f"\nsteady-state iter_time: median {np.median(ss)*1e3:.1f} ms, "
              f"p10 {np.percentile(ss, 10)*1e3:.1f}, "
              f"p90 {np.percentile(ss, 90)*1e3:.1f} "
              f"(n={len(ss)}; all-run median {np.median(times)*1e3:.1f})")
        last = steps[-1]
        print(f"final: iter {last['iteration']}, "
              f"{last['num_points']} points, ema_loss {last['ema_loss']:.6f}")


if __name__ == "__main__":
    main()
