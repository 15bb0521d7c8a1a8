#!/usr/bin/env python
"""Batch rendering runner: render every trained model under output/.

Counterpart of the reference run_render.py (per-scene render invocations
after batch optimization). Finds model directories (those containing
cfg_args_full.json) and runs render.py + render_traj.py on each.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output_root", default="output")
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--scenes", nargs="*", default=None)
    p.add_argument("--traj", action="store_true",
                   help="also run the trajectory visualization")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    models = []
    for name in sorted(os.listdir(args.output_root)):
        path = os.path.join(args.output_root, name)
        if not os.path.isdir(path):
            continue
        if not os.path.exists(os.path.join(path, "cfg_args_full.json")):
            continue
        if args.scenes and not any(name.startswith(s) for s in args.scenes):
            continue
        models.append(path)

    for path in models:
        cmd = [sys.executable, "render.py", "--model_path", path,
               "--iteration", str(args.iteration)]
        if args.platform:
            cmd += ["--platform", args.platform]
        print("+", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)
        if args.traj:
            cmd = [sys.executable, "render_traj.py", "--model_path", path,
                   "--iteration", str(args.iteration)]
            if args.platform:
                cmd += ["--platform", args.platform]
            subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
