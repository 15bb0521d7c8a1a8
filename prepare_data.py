#!/usr/bin/env python
"""Dataset preparation: unpack the published ToRF/F-ToRF archives into the
layout the readers expect.

Counterpart of the reference prepare_data.py. The download step is
manual (grab `real_scenes.zip` / `synthetic_scenes.zip` for F-ToRF and
the per-scene ToRF folders per the upstream README links) — this script
unzips, renumbers the ToRF frames to 0-based ids, and merges auxiliary
files. No network access is attempted.

Usage:
    python prepare_data.py [--data_root data]
"""

from __future__ import annotations

import argparse
import os
import shutil
import zipfile

FTORF_REAL_SCENES = ["baseball", "fan", "jacks1", "pillow", "target1"]
TORF_SCENES = ["copier", "cupboard", "deskbox", "phonebooth", "studybook"]


def unpack_ftorf(data_root: str) -> None:
    real_zip = os.path.join(data_root, "real_scenes.zip")
    if os.path.exists(real_zip):
        dest = os.path.join(data_root, "ftorf_real_scenes")
        with zipfile.ZipFile(real_zip) as z:
            z.extractall(dest)
        for scene in FTORF_REAL_SCENES:
            inner = os.path.join(dest, f"{scene}.zip")
            if os.path.exists(inner):
                with zipfile.ZipFile(inner) as z:
                    z.extractall(os.path.join(dest, scene))
                os.remove(inner)
        stray = os.path.join(dest, "data_color25.zip")
        if os.path.exists(stray):
            os.remove(stray)
        print(f"unpacked F-ToRF real scenes to {dest}")

    synth_zip = os.path.join(data_root, "synthetic_scenes.zip")
    if os.path.exists(synth_zip):
        dest = os.path.join(data_root, "ftorf_synthetic_scenes")
        with zipfile.ZipFile(synth_zip) as z:
            z.extractall(dest)
        for folder in os.listdir(dest):
            if folder.startswith("occlusion_"):
                shutil.rmtree(os.path.join(dest, folder))
        print(f"unpacked F-ToRF synthetic scenes to {dest}")


def renumber_torf_frames(scene_path: str) -> None:
    """ToRF archives are 1-based; shift every frame file to 0-based ids
    (reference prepare_data.py:47-57)."""
    for folder in os.listdir(scene_path):
        fpath = os.path.join(scene_path, folder)
        if not os.path.isdir(fpath) or folder.startswith("cams"):
            continue
        files = sorted(f for f in os.listdir(fpath) if f[:4].isdigit())
        for f in files:
            fid = max(int(f[:4]) - 1, 0)
            os.rename(os.path.join(fpath, f),
                      os.path.join(fpath, f"{fid:04d}" + f[4:]))


def unpack_torf(data_root: str) -> None:
    dest = os.path.join(data_root, "torf_scenes")
    for fp in os.listdir(data_root):
        if not fp.endswith(".zip"):
            continue
        scene = fp.split("-")[0]
        if scene not in TORF_SCENES:
            continue
        with zipfile.ZipFile(os.path.join(data_root, fp)) as z:
            z.extractall(dest)
        renumber_torf_frames(os.path.join(dest, scene))
        print(f"unpacked + renumbered {scene}")


def merge_aux(data_root: str, aux_root: str = "gftorf_data_aux_files") -> None:
    if not os.path.isdir(aux_root):
        return
    for dirpath, _, files in os.walk(aux_root):
        rel = os.path.relpath(dirpath, aux_root)
        dst = os.path.join(data_root, rel)
        os.makedirs(dst, exist_ok=True)
        for f in files:
            shutil.copy2(os.path.join(dirpath, f), os.path.join(dst, f))
    shutil.rmtree(aux_root)
    print("merged auxiliary files")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="data")
    a = p.parse_args()
    unpack_ftorf(a.data_root)
    unpack_torf(a.data_root)
    merge_aux(a.data_root)
