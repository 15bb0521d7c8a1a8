"""Comparison video panels: per-channel rows of annotated clips
(Input | Ours | Spiral | FreezeFrameSpiral), the counterpart of the
reference's moviepy-based create_video_panel (render.py:226-285).

This image has no ffmpeg backend, so _write_video probes for an mp4
writer and falls back to GIF; composition is plain numpy + cv2 text.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

_LABEL_H = 16
_MARGIN = 6


def _write_video(path_base: str, frames: List[np.ndarray], fps: float) -> str:
    """Write frames as mp4 when an ffmpeg backend exists, else GIF.
    Returns the written path."""
    import imageio.v2 as imageio

    try:
        w = imageio.get_writer(path_base + ".mp4", fps=fps)
        for f in frames:
            w.append_data(f)
        w.close()
        return path_base + ".mp4"
    except Exception:
        imageio.mimsave(path_base + ".gif", frames, duration=1.0 / fps)
        return path_base + ".gif"


def _annotate(img: np.ndarray, label: str) -> np.ndarray:
    """White margin + label strip above the clip (the reference's
    moviepy margin + TextClip overlay, render_ftorf_viz_traj.py:409-477:
    top margin 22 with an annotation, plain 10px margins without)."""
    import cv2

    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    h, w = img.shape[:2]
    top = _LABEL_H + _MARGIN if label else _MARGIN
    out = np.full((h + top + _MARGIN, w + 2 * _MARGIN, 3), 255, np.uint8)
    out[top:top + h, _MARGIN:_MARGIN + w] = img
    if label:
        cv2.putText(out, label, (_MARGIN, _LABEL_H - 2),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.35, (0, 0, 0), 1,
                    cv2.LINE_AA)
    return out


def _load_clip(folder: str) -> Optional[List[np.ndarray]]:
    import imageio.v2 as imageio

    if not os.path.isdir(folder):
        return None
    files = sorted(f for f in os.listdir(folder) if f.endswith(".png"))
    if not files:
        return None
    return [imageio.imread(os.path.join(folder, f)) for f in files]


def _placeholder(shape, label):
    import cv2

    img = np.full(shape, 230, np.uint8)
    cv2.putText(img, label, (4, shape[0] // 2), cv2.FONT_HERSHEY_SIMPLEX,
                0.4, (90, 90, 90), 1, cv2.LINE_AA)
    return img


def _bordered_placeholder(h, w, lines):
    """White tile with a 2px gray border and centered gray caption
    line(s) — the reference's 'Unknown' / 'N of 4' + 'quads acquired'
    placeholder cells (render_ftorf_viz_traj.py:426-452, twoRows)."""
    import cv2

    img = np.full((h, w, 3), 255, np.uint8)
    img[:2, :] = img[-2:, :] = 128
    img[:, :2] = img[:, -2:] = 128
    n = len(lines)
    for i, text in enumerate(lines):
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.4, 1)
        y = h // 2 + int((i - (n - 1) / 2) * (th + 8)) + th // 2
        cv2.putText(img, text, (max((w - tw) // 2, 2), y),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.4, (150, 150, 150), 1,
                    cv2.LINE_AA)
    return img


def _vline_cell(height, width=10, line_width=3):
    """A white column with a black vertical separator line, the
    reference's get_vline (render_ftorf_viz_traj.py:479-486)."""
    img = np.full((height, width, 3), 255, np.uint8)
    x0 = (width - line_width) // 2
    img[:, x0:x0 + line_width] = 0
    return img


def _time_axis_strip(panel_h, row_h, labels, width=72):
    """Left-hand time-axis strip: 'Time' caption, a downward arrow, and
    one label per row — the reference's draw_time_axis_as_image /
    make_time_axis_video (render_ftorf_viz_traj.py:488-521), drawn with
    cv2 instead of matplotlib."""
    import cv2

    img = np.full((panel_h, width, 3), 255, np.uint8)
    cv2.putText(img, "Time", (2, 14), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                (0, 0, 0), 1, cv2.LINE_AA)
    x = int(width * 0.8)
    cv2.arrowedLine(img, (x, 6), (x, panel_h - 6), (0, 0, 0), 2,
                    cv2.LINE_AA, tipLength=12.0 / panel_h)
    for i, label in enumerate(labels):
        y = int((i + 0.5) * row_h)
        cv2.putText(img, label, (2, y + 4), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                    (0, 0, 0), 1, cv2.LINE_AA)
    return img


def create_website_panel(model_path: str, iteration: int,
                         traj_dir: Optional[str] = None,
                         fps: float = 10.0) -> Optional[str]:
    """The paper/website comparison panel (render_ftorf_viz_traj.py:
    528-600): [C-ToF input depth | baseline methods | Ours 4x-interp
    depth | Ours 3D-trajectory overlay]. Baseline clips are read from
    model_path/baselines/<name>/ when present, else placeholder tiles —
    the reference hard-codes paths to TöRF/F-TöRF/DeformableGS renders
    that only exist after running those codebases."""
    traj_dir = traj_dir or os.path.join(model_path, f"traj_{iteration}")
    cells = [
        (os.path.join(model_path, "input", "depth"), "C-ToF"),
        (os.path.join(model_path, "baselines", "torf"), "ToRF"),
        (os.path.join(model_path, "baselines", "ftorf"), "F-ToRF"),
        (os.path.join(traj_dir, "depth_quad"), "Ours (4x interp)"),
        (os.path.join(traj_dir, "traj"), "Ours (3D trajectories)"),
    ]
    clips, n_frames, shape = [], 0, None
    for folder, label in cells:
        clip = _load_clip(folder)
        if clip:
            clip = [_annotate(f, label) for f in clip]
            n_frames = max(n_frames, len(clip))
            shape = clip[0].shape
        clips.append((clip, label))
    if n_frames == 0:
        return None
    frames = []
    for t in range(n_frames):
        row = []
        for i, (clip, label) in enumerate(clips):
            if i == 3:
                # Separator between the input/baseline group and the
                # Ours group (render_ftorf_viz_traj.py:563-566).
                row.append(_vline_cell(shape[0]))
            if clip:
                row.append(clip[t % len(clip)])
            else:
                row.append(_placeholder(shape, f"{label}: n/a"))
        h = max(r.shape[0] for r in row)
        row = [np.pad(r, ((0, h - r.shape[0]), (0, 0), (0, 0)),
                      constant_values=255) for r in row]
        frames.append(np.concatenate(row, axis=1))
    out = _write_video(
        os.path.join(model_path, f"iteration_{iteration}_website_panel"),
        frames, fps,
    )
    print(f"[website_panel]: {out}")
    return out


_QUAD_NAMES = ["0", "pi/2", "pi", "3pi/2"]


def create_quad_cadence_panel(model_path: str, iteration: int,
                              traj_dir: Optional[str] = None,
                              fps: float = 2.5) -> Optional[str]:
    """The raw-quads staircase panel (render_ftorf_viz_traj.py:592-680):
    4 rows, one per quad slot. Row k shows the GT quad captured at slot
    k on the diagonal of a 4-column group ('Unknown' bordered
    placeholders elsewhere — only one quad type is acquired per frame),
    a 'k+1 of 4 / quads acquired' cell, a vertical separator, then the
    rendered quad and depth for that slot. A time-axis strip with per-row
    labels runs down the left (:488-521). Captions annotate row 1 only,
    like the reference's font_size=20 header row.
    """
    traj_dir = traj_dir or os.path.join(model_path, f"traj_{iteration}")

    gt_clips = [_load_clip(os.path.join(model_path, "input", f"quad_q{k}"))
                for k in range(4)]
    ren_clips = [_load_clip(os.path.join(traj_dir, f"quad_q{k}"))
                 for k in range(4)]
    dep_clips = [_load_clip(os.path.join(traj_dir, f"depth_q{k}"))
                 for k in range(4)]
    have = [c for c in gt_clips + ren_clips + dep_clips if c]
    if not have:
        return None
    h, w = have[0][0].shape[:2]
    n_frames = max(len(c) for c in have)

    rows = []
    for k in range(4):
        first = k == 0
        cells = []
        # GT group: captured quad on the diagonal, Unknown elsewhere.
        for q in range(4):
            label = f"Quad {_QUAD_NAMES[q]}" if first else ""
            if q == k and gt_clips[k]:
                cells.append((gt_clips[k], label, None))
            else:
                cells.append((None, label, ["Unknown"]))
        cells.append((None, "C-ToF Depth" if first else "",
                      [f"{k + 1} of 4", "quads acquired"]))
        cells.append("vline")
        cells.append((ren_clips[k],
                      f"Ours (Rendered Quad {_QUAD_NAMES[k]})"
                      if first else "", ["n/a"]))
        cells.append((dep_clips[k], "Ours (Depth)" if first else "",
                      ["n/a"]))
        rows.append(cells)

    panel_frames = []
    for t in range(n_frames):
        row_imgs = []
        for cells in rows:
            imgs = []
            for cell in cells:
                if cell == "vline":
                    imgs.append(None)  # sized after the row height known
                    continue
                clip, label, ph_lines = cell
                if clip:
                    img = clip[t % len(clip)]
                    if img.shape[:2] != (h, w):
                        img = np.asarray(img)[:h, :w]
                else:
                    img = _bordered_placeholder(h, w, ph_lines)
                imgs.append(_annotate(img, label))
            rh = max(i.shape[0] for i in imgs if i is not None)
            imgs = [_vline_cell(rh) if i is None else np.pad(
                i, ((0, rh - i.shape[0]), (0, 0), (0, 0)),
                constant_values=255) for i in imgs]
            row_imgs.append(np.concatenate(imgs, axis=1))
        wmax = max(r.shape[1] for r in row_imgs)
        row_imgs = [np.pad(r, ((0, 0), (0, wmax - r.shape[1]), (0, 0)),
                           constant_values=255) for r in row_imgs]
        body = np.concatenate(row_imgs, axis=0)
        axis = _time_axis_strip(body.shape[0], row_imgs[0].shape[0],
                                [f"t{k}" for k in range(4)])
        panel_frames.append(np.concatenate([axis, body], axis=1))

    out = _write_video(
        os.path.join(model_path, f"iteration_{iteration}_quad_panel"),
        panel_frames, fps,
    )
    print(f"[quad_panel]: {out}")
    return out


def create_video_panel(model_path: str, iteration: int, fps: float = 10.0,
                       input_folder: str = "input",
                       renders_base: Optional[str] = None,
                       scene_type: str = "torf") -> Optional[str]:
    """Compose the per-channel comparison grid across splits.

    Rows: one per channel (color/real/imag only for non-ftorf scenes,
    matching render.py:227-252). Columns: input GT, test renders, and
    for torf scenes the spiral + freeze-frame-spiral sweeps. Splits of
    different lengths loop (shorter clips repeat).
    """
    renders_base = renders_base or os.path.join(
        model_path, f"renders_{iteration}"
    )
    channels = ["depth", "depth_tof", "amp"]
    if scene_type != "ftorf":
        channels = ["color"] + channels + ["real", "imag"]

    columns = [(os.path.join(model_path, input_folder), "Input")]
    columns.append((os.path.join(renders_base, "test"), "Ours"))
    if scene_type == "torf":
        columns.append(
            (os.path.join(renders_base, "renders_spiral"), "Ours_Spiral")
        )
        columns.append(
            (os.path.join(renders_base, "freezeframe_spiral"),
             "Ours_FreezeFrame")
        )

    rows = []
    n_frames = 0
    for ch in channels:
        cells = []
        for folder, label in columns:
            clip = _load_clip(os.path.join(folder, ch))
            if clip:
                cells.append(([_annotate(f, f"{label}({ch})") for f in clip]))
                n_frames = max(n_frames, len(clip))
        if cells:
            rows.append(cells)
    if not rows or n_frames == 0:
        return None

    # Uniform cell size per row; stack rows vertically (white bg).
    panel_frames = []
    for t in range(n_frames):
        row_imgs = []
        for cells in rows:
            imgs = [c[t % len(c)] for c in cells]
            h = max(i.shape[0] for i in imgs)
            w = max(i.shape[1] for i in imgs)
            padded = []
            for i in imgs:
                p = np.full((h, w, 3), 255, np.uint8)
                p[: i.shape[0], : i.shape[1]] = i
                padded.append(p)
            row_imgs.append(np.concatenate(padded, axis=1))
        wmax = max(r.shape[1] for r in row_imgs)
        full = []
        for r in row_imgs:
            p = np.full((r.shape[0], wmax, 3), 255, np.uint8)
            p[:, : r.shape[1]] = r
            full.append(p)
        panel_frames.append(np.concatenate(full, axis=0))

    out = _write_video(
        os.path.join(model_path, f"iteration_{iteration}_video_panel"),
        panel_frames, fps,
    )
    print(f"[video_panel]: {out}")
    return out
