#!/usr/bin/env python
"""Summarize a training run's eval trajectory from train_log.jsonl.

Prints a markdown table of the metrics the reference's training_report
tracks (train.py:508-603): phasor PSNR/L1, ToF-depth MAE, color PSNR —
one row per test_iteration — plus steady-state iter time. Used for the
20k-iteration parity runs recorded in BENCHLOG.md.

Usage: python tools/parity_curves.py /path/to/model_dir
"""

from __future__ import annotations

import json
import sys


def load(path):
    evals, steps = [], []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "eval" in rec:
                evals.append(rec)
            elif "iteration" in rec:
                steps.append(rec)
    return evals, steps


def main():
    model_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_model"
    evals, steps = load(f"{model_dir}/train_log.jsonl")
    if not evals:
        print("no eval records yet")
        return
    print("| iter | PSNR_p (dB) | L1_p | MAE depth_tof | PSNR_color |")
    print("|---|---|---|---|---|")
    for rec in evals:
        t = rec["eval"]["test"]
        print(
            f"| {rec.get('iteration', '?')} | {t['psnr_p']:.2f} "
            f"| {t['l1_p']:.5f} | {t['mae_d_tof']:.4f} "
            f"| {t['psnr_color']:.2f} |"
        )
    if steps:
        # steady-state window: median iter_time of the last 40% of steps
        times = sorted(s["iter_time"] for s in steps[int(0.6 * len(steps)):])
        med = times[len(times) // 2]
        last = steps[-1]
        print(
            f"\nsteps logged to iter {last['iteration']}; "
            f"steady-state median iter_time {med*1e3:.1f} ms; "
            f"points {last['num_points']}; "
            f"tile_overflow events "
            f"{sum(1 for s in steps if s['tile_overflow'] > 0)}"
        )


if __name__ == "__main__":
    main()
