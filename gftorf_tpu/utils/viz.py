"""Visualization helpers: phasor/red-blue maps, depth colormaps, flow
wheel images (utils/graphics_utils.py:117-137, torf_utils.py:150-305)."""

from __future__ import annotations

import numpy as np


def to8b(x):
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def normalize_im(im):
    return (im - im.min()) / max(im.max() - im.min(), 1e-12)


def normalize_im_gt(im, gts):
    lo = min(g.min() for g in gts)
    hi = max(g.max() for g in gts)
    return (im - lo) / max(hi - lo, 1e-12)


def phase2real_img(phase_hw2: np.ndarray):
    """Red(+)/blue(-) visualization of real & imaginary channels."""
    def signed_rgb(ch):
        pos = np.clip(ch, 0, None)
        neg = np.clip(-ch, 0, None)
        return np.stack([pos, np.zeros_like(ch), neg], axis=-1)

    return signed_rgb(phase_hw2[..., 0]), signed_rgb(phase_hw2[..., 1])


def phasor2real_img_amp(phasor_hw3: np.ndarray):
    real, imag = phase2real_img(phasor_hw3[..., :2])
    return real, imag, phasor_hw3[..., 2]


def depth_to_disp_viz(depth, depth_range, min_fac=0.05, max_fac=0.55):
    """Magma-mapped disparity like the reference debug dumps
    (train.py:297-298)."""
    from matplotlib import cm

    lo = min_fac * depth_range * 0.9
    hi = max_fac * depth_range * 1.1
    disp = 1.0 - (depth - lo) / (hi - lo)
    return to8b(cm.magma(np.clip(disp, 0, 1))[..., :3])


# Per-scene near/far viz windows for the paper depth videos
# (torf_utils.py:474-495 — published constants, kept verbatim).
PAPER_VIZ_BOUNDS = {
    "sliding_cube": (0.07, 0.24, 15),
    "occlusion": (0.03, 0.21, 15),
    "speed_test_texture": (0.08, 0.32, 15),
    "speed_test_chair": (0.08, 0.32, 15),
    "arcing_cube": (0.03, 0.38, 15),
    "z_motion_speed_test": (0.06, 0.34, 15),
    "acute_z_speed_test": (0.01, 0.52, 15),
}


def paper_viz_bounds(scene_name: str):
    """(near, far, has_gt) disparity-viz window for a scene name."""
    if scene_name in PAPER_VIZ_BOUNDS:
        nf, ff, md = PAPER_VIZ_BOUNDS[scene_name]
        return nf * md * 0.9, ff * md * 1.1, True
    if "data_color" in scene_name:
        return 0.45, 6.05, False
    return 0.135, 10.725, False


def depth_to_disp_viz_window(depth, lo, hi):
    """Magma disparity with an explicit (lo, hi) depth window."""
    from matplotlib import cm

    disp = 1.0 - (depth - lo) / (hi - lo)
    return to8b(cm.magma(np.clip(disp, 0, 1))[..., :3])


def flow_to_image(flow, flow_ref=None):
    """Middlebury-style flow wheel visualization (torf_utils.py:150-305,
    simplified HSV implementation with the same normalization rule)."""
    import colorsys

    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u**2 + v**2)
    ref = flow_ref if flow_ref is not None else flow
    maxrad = max(np.sqrt(ref[..., 0] ** 2 + ref[..., 1] ** 2).max(), 1e-6)
    ang = np.arctan2(-v, -u) / np.pi  # [-1, 1]
    hue = (ang + 1.0) / 2.0
    sat = np.clip(rad / maxrad, 0, 1)
    hsv = np.stack([hue, sat, np.ones_like(hue)], axis=-1)
    import matplotlib.colors as mcolors

    rgb = mcolors.hsv_to_rgb(hsv)
    return to8b(rgb)
