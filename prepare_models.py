#!/usr/bin/env python
"""Fetch/stage pretrained models (counterpart of the reference's
prepare_models.py, which gdown's three Google-Drive zips into
output/pretrained_models).

The build image has no network egress, so instead of downloading this
script stages models from a local directory or archive; run it on a
networked machine with --download to mirror the reference behavior.

Usage:
    # no-egress environments: stage already-downloaded archives/dirs
    python prepare_models.py --from /path/to/zips_or_model_dirs

    # networked machines: download like the reference (needs gdown)
    python prepare_models.py --download
"""

from __future__ import annotations

import argparse
import os
import shutil
import zipfile

OUTPUT_DIR = "output/pretrained_models"

# Reference download set (prepare_models.py:8-12).
MODELS = {
    "ftorf_real_scenes": "https://drive.google.com/uc?id=1qrBbsKvf6vborl-q219P9ER07vsypyKS",
    "ftorf_synthetic_scenes": "https://drive.google.com/uc?id=1gIXcLLUCHUxALTko4v5MmPOgZ32OptYa",
    "torf_scenes": "https://drive.google.com/uc?id=1sw-adMvqQfqUKhbwL792quxrAL3rHrDY",
}


def stage_local(src: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    if not os.path.exists(src):
        raise SystemExit(f"--from path does not exist: {src}")
    entries = (
        [src] if not os.path.isdir(src)
        else [os.path.join(src, e) for e in sorted(os.listdir(src))]
    )
    staged = 0
    for e in entries:
        if e.endswith(".zip"):
            with zipfile.ZipFile(e) as z:
                z.extractall(out_dir)
            staged += 1
        elif os.path.isdir(e):
            dst = os.path.join(out_dir, os.path.basename(e))
            if not os.path.exists(dst):
                shutil.copytree(e, dst)
            staged += 1
    print(f"staged {staged} model set(s) into {out_dir}")


def download(out_dir: str) -> None:
    try:
        import gdown  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gdown is not installed (and this environment has no network "
            "egress). Run this on a networked machine, or download the "
            "archives manually and use --from."
        )
    os.makedirs(out_dir, exist_ok=True)
    for name, url in MODELS.items():
        zip_path = os.path.join(out_dir, name + ".zip")
        gdown.download(url, output=zip_path, quiet=False)
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(out_dir)
        os.remove(zip_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="src", default=None,
                    help="local dir (of zips or model dirs) or single zip")
    ap.add_argument("--download", action="store_true")
    ap.add_argument("--out", default=OUTPUT_DIR)
    args = ap.parse_args()
    if args.src:
        stage_local(args.src, args.out)
    elif args.download:
        download(args.out)
    else:
        raise SystemExit("pass --from <local path> (no-egress) or --download")


if __name__ == "__main__":
    main()
