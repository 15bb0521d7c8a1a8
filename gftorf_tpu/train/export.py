"""Inference-artifact export: PLYs, offsets, deform weights.

Mirrors Scene.save (scene/__init__.py:127-136): point_cloud.ply
(SIBR-compatible subset), point_cloud_full.ply (adds phase/amp SH and
seg colors), phase_offset.npy / dc_offset.npy, deform weights. PLY
attribute names match GaussianModel.save_ply (gaussian_model.py:315-367)
so reference tooling can open our models.
"""

from __future__ import annotations

import os

import numpy as np

from gftorf_tpu.utils.checkpoint import save_pytree, load_pytree
from gftorf_tpu.utils.ply import read_ply, write_ply


def gaussian_ply_props(params, alive, full: bool) -> dict:
    """Ordered property dict for a (dead-slot-compacted) PLY."""
    idx = np.where(np.asarray(alive))[0]
    p = {k: np.asarray(v)[idx] for k, v in params._asdict().items()
         if k not in ("phase_offset", "dc_offset")}
    n = len(idx)
    props = {}
    xyz = p["xyz"]
    props["x"], props["y"], props["z"] = xyz.T.astype(np.float32)
    for name in ("nx", "ny", "nz"):
        props[name] = np.zeros(n, np.float32)
    # colors: (N, M, 3) -> dc (3) + rest (3*(M-1)), channel-major like the
    # reference's transpose(1, 2).flatten (gaussian_model.py:345-346)
    sh = p["sh_color"]
    m = sh.shape[1]
    for i in range(3):
        props[f"f_dc_{i}"] = sh[:, 0, i].astype(np.float32)
    rest = sh[:, 1:, :].transpose(0, 2, 1).reshape(n, -1)
    for i in range(rest.shape[1]):
        props[f"f_rest_{i}"] = rest[:, i].astype(np.float32)
    props["opacity"] = p["opacity"][:, 0].astype(np.float32)
    for i in range(p["scaling"].shape[1]):
        props[f"scale_{i}"] = p["scaling"][:, i].astype(np.float32)
    for i in range(4):
        props[f"rot_{i}"] = p["rotation"][:, i].astype(np.float32)
    if full:
        props["phase_f_dc_0"] = p["sh_phase"][:, 0].astype(np.float32)
        for i in range(m - 1):
            props[f"phase_f_rest_{i}"] = p["sh_phase"][:, 1 + i].astype(np.float32)
        props["amp_f_dc_0"] = p["sh_amp"][:, 0].astype(np.float32)
        for i in range(m - 1):
            props[f"amp_f_rest_{i}"] = p["sh_amp"][:, 1 + i].astype(np.float32)
        for i in range(3):
            props[f"f_seg_color_{i}"] = p["seg_color"][:, i].astype(np.float32)
    return props


def save_scene_artifacts(trainer, iteration: int) -> str:
    cfg = trainer.cfg
    out = os.path.join(cfg.model.model_path,
                       f"point_cloud/iteration_{iteration}")
    os.makedirs(out, exist_ok=True)
    params = trainer.model.params
    alive = trainer.model.aux.alive
    write_ply(os.path.join(out, "point_cloud.ply"),
              gaussian_ply_props(params, alive, full=False))
    write_ply(os.path.join(out, "point_cloud_full.ply"),
              gaussian_ply_props(params, alive, full=True))
    np.save(os.path.join(out, "phase_offset.npy"),
            np.asarray(params.phase_offset))
    np.save(os.path.join(out, "dc_offset.npy"), np.asarray(params.dc_offset))
    save_pytree(os.path.join(out, "deform_model.npz"), trainer.deform)
    return out


def write_proxy_pcds(trainer, iteration: int, max_frames: int = 0) -> str:
    """Per-frame proxy point clouds: the GT ToF depth (red) and the
    rendered depth (blue) back-projected to world space, written as
    model_path/proxy_pcd/frame_N/input.ply alongside cameras.json and a
    copy of the trained point cloud — the reference's depth-map proxy
    export (dataset_readers.py:608-713, 1005-1120 + scene/__init__.py:
    150-166), used to inspect geometry against the raw sensor."""
    import json
    import shutil

    import jax

    from gftorf_tpu.data.scene import camera_to_json, take_frame
    from gftorf_tpu.ops.flow import distance_to_points3d
    from gftorf_tpu.ops.tof import depth_from_tof
    from gftorf_tpu.train.evaluate import eval_frame

    cfg = trainer.cfg
    model_path = cfg.model.model_path
    static = trainer._static_for(max(trainer.iteration, 1))
    frames = trainer.scene.train_frames
    cams = trainer.scene.data.train_cameras
    json_cams = [camera_to_json(i, c) for i, c in enumerate(cams)]
    trained_ply = os.path.join(
        model_path, "point_cloud", f"iteration_{iteration}",
        "point_cloud.ply",
    )

    count = len(cams) if not max_frames else min(len(cams), max_frames)
    root = os.path.join(model_path, "proxy_pcd")
    for fid in range(count):
        frame = take_frame(frames, fid)
        _, _, out_tof = eval_frame(
            static, trainer.model.params, trainer.deform,
            trainer.model.aux.alive, frame,
        )
        k = np.asarray(frame.intrinsics_tof)
        view_t = frame.cam_tof.viewmatrix

        def backproject(dist_1hw):
            pts = distance_to_points3d(
                dist_1hw, view_t, k[0, 0], k[1, 1], k[0, 2], k[1, 2]
            )
            return np.asarray(pts).reshape(3, -1).T  # (HW, 3)

        z_in = depth_from_tof(
            np.moveaxis(np.asarray(frame.gt_phasor), 0, -1),
            float(frame.cam_tof.depth_range), float(frame.phase_offset),
        )[None]
        pts_in = backproject(jax.numpy.asarray(z_in))
        pts_render = backproject(out_tof.depth)
        xyz = np.concatenate([pts_in, pts_render], axis=0)
        n_half = pts_in.shape[0]
        colors = np.zeros((2 * n_half, 3), np.uint8)
        colors[:n_half, 0] = 255  # input depth: red
        colors[n_half:, 2] = 255  # rendered depth: blue

        frame_dir = os.path.join(root, f"frame_{fid}")
        pc_dir = os.path.join(frame_dir, "point_cloud",
                              f"iteration_{iteration}")
        os.makedirs(pc_dir, exist_ok=True)
        props = {}
        props["x"], props["y"], props["z"] = xyz.T.astype(np.float32)
        for name in ("nx", "ny", "nz"):
            props[name] = np.zeros(2 * n_half, np.float32)
        props["red"], props["green"], props["blue"] = colors.T
        props["phase"] = np.zeros(2 * n_half, np.float32)
        props["amplitude"] = np.zeros(2 * n_half, np.float32)
        for name in ("seg_red", "seg_green", "seg_blue"):
            props[name] = np.zeros(2 * n_half, np.uint8)
        write_ply(os.path.join(frame_dir, "input.ply"), props)
        with open(os.path.join(frame_dir, "cameras.json"), "w") as f:
            json.dump(json_cams, f, indent=4)
        if os.path.exists(trained_ply):
            shutil.copy(trained_ply,
                        os.path.join(pc_dir, "point_cloud.ply"))
    return root


def load_gaussians_from_ply(path: str, sh_degree: int = 3):
    """Load a point_cloud_full.ply back into GaussianParams arrays
    (host numpy), like GaussianModel.load_ply (gaussian_model.py:378-454)."""
    import jax.numpy as jnp

    from gftorf_tpu.models.gaussians import GaussianParams

    props = read_ply(path)
    n = len(props["x"])
    m = (sh_degree + 1) ** 2
    xyz = np.stack([props["x"], props["y"], props["z"]], -1)

    sh_color = np.zeros((n, m, 3), np.float32)
    for i in range(3):
        sh_color[:, 0, i] = props[f"f_dc_{i}"]
    rest = np.stack(
        [props[f"f_rest_{i}"] for i in range(3 * (m - 1))], -1
    ).reshape(n, 3, m - 1)
    sh_color[:, 1:, :] = rest.transpose(0, 2, 1)

    def seq(prefix, count):
        return np.stack([props[f"{prefix}_{i}"] for i in range(count)], -1)

    sh_phase = np.concatenate(
        [props["phase_f_dc_0"][:, None], seq("phase_f_rest", m - 1)], -1
    )
    sh_amp = np.concatenate(
        [props["amp_f_dc_0"][:, None], seq("amp_f_rest", m - 1)], -1
    )
    n_scale = len([k for k in props if k.startswith("scale_")])
    scaling = seq("scale", n_scale)
    rotation = seq("rot", 4)
    opacity = props["opacity"][:, None]
    seg = seq("f_seg_color", 3) if "f_seg_color_0" in props else np.zeros(
        (n, 3), np.float32
    )
    return GaussianParams(
        xyz=jnp.asarray(xyz), sh_color=jnp.asarray(sh_color),
        sh_phase=jnp.asarray(sh_phase), sh_amp=jnp.asarray(sh_amp),
        scaling=jnp.asarray(scaling), rotation=jnp.asarray(rotation),
        opacity=jnp.asarray(opacity), seg_color=jnp.asarray(seg),
        phase_offset=jnp.zeros((1,)), dc_offset=jnp.zeros((1,)),
    )
