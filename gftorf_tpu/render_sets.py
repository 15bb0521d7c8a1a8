"""Render trained models to per-channel image sequences.

Mirrors render.py:36-209 of the reference: for each split, query the
deformation at the frame time, render color+phasor through the ToF and
color cameras, and write real/imag/amp/depth/depth_tof/color/dd/quad
channels as pngs + npys, plus GIF previews (ffmpeg is not available in
this image; the reference writes mp4s).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gftorf_tpu.config import Config
from gftorf_tpu.data.scene import Scene, take_frame
from gftorf_tpu.models.deform import DeformConfig
from gftorf_tpu.models.gaussians import (
    AdamState,
    GaussianAux,
    GaussianModelState,
)
from gftorf_tpu.ops.tof import depth_from_tof
from gftorf_tpu.train.evaluate import eval_frame
from gftorf_tpu.train.export import load_gaussians_from_ply
from gftorf_tpu.train.loop import Trainer
from gftorf_tpu.utils.checkpoint import load_pytree
from gftorf_tpu.utils.viz import (
    depth_to_disp_viz,
    normalize_im,
    phasor2real_img_amp,
    to8b,
)


def _latest_iteration(model_path: str) -> int:
    pc = os.path.join(model_path, "point_cloud")
    iters = [int(d.split("_")[1]) for d in os.listdir(pc)
             if d.startswith("iteration_")]
    return max(iters)


def load_trained(model_path: str, iteration: int = -1):
    """Rebuild a Trainer in inference mode from saved artifacts."""
    cfg = Config.from_json(os.path.join(model_path, "cfg_args_full.json"))
    cfg.model.model_path = model_path
    if iteration < 0:
        iteration = _latest_iteration(model_path)
    art = os.path.join(model_path, "point_cloud", f"iteration_{iteration}")

    scene = Scene(cfg, init_model=False)
    params = load_gaussians_from_ply(
        os.path.join(art, "point_cloud_full.ply"), cfg.model.sh_degree
    )
    params = params._replace(
        phase_offset=jnp.asarray(np.load(os.path.join(art, "phase_offset.npy"))),
        dc_offset=jnp.asarray(np.load(os.path.join(art, "dc_offset.npy"))),
    )
    n = params.xyz.shape[0]
    zeros = jax.tree.map(jnp.zeros_like, params)
    scene.model_state = GaussianModelState(
        params=params,
        aux=GaussianAux(
            alive=jnp.ones((n,), bool),
            max_radii2d=jnp.zeros((n,)),
            xyz_grad_accum=jnp.zeros((n,)),
            denom=jnp.zeros((n,)),
        ),
        adam=AdamState(mu=zeros, nu=zeros, step=jnp.int32(0)),
    )
    trainer = Trainer(cfg, scene=scene, startup_artifacts=False)
    trainer.iteration = iteration
    trainer.active_sh_degree = cfg.model.sh_degree
    deform, _ = load_pytree(os.path.join(art, "deform_model.npz"),
                            trainer.deform)
    trainer.deform = deform
    return trainer, cfg, iteration


def _write_gif(path, frames):
    import imageio

    if len(frames) > 1:
        imageio.mimsave(path, frames, duration=0.08)


def render_split(trainer, frames, n_frames, out_dir, cfg, max_frames=0,
                 write_video=True, static=None, frame_id_override=None):
    """Render a stacked frame split to per-channel sequences.

    ``static`` overrides the step static (the spiral path retimes the
    deform query by replacing total_num_views); ``frame_id_override``
    pins the deform time to one frame for every camera (the reference's
    freeze-frame spiral, render.py:340-357).
    """
    os.makedirs(out_dir, exist_ok=True)
    if static is None:
        static = trainer._static_for(max(trainer.iteration, 1))
    chans = ["color", "real", "imag", "amp", "depth", "depth_norm",
             "depth_tof", "dd"]
    if cfg.opt.use_quad:
        chans.append("quad")
    for ch in chans:
        os.makedirs(os.path.join(out_dir, ch), exist_ok=True)
    gif_frames = {ch: [] for ch in chans}

    count = n_frames if not max_frames else min(n_frames, max_frames)
    depth_range = trainer.scene.data.depth_range
    for i in range(count):
        frame = take_frame(frames, i)
        if frame_id_override is not None:
            frame = frame._replace(frame_id=jnp.int32(frame_id_override))
        metrics, out_color, out_tof = eval_frame(
            static, trainer.model.params, trainer.deform,
            trainer.model.aux.alive, frame,
        )
        color = np.moveaxis(np.asarray(out_color.color), 0, -1)
        phasor = np.asarray(out_tof.phasor)
        depth = np.asarray(out_tof.depth[0])
        dd = np.asarray(out_tof.depth_distortion[0])
        phase_offset = (
            float(trainer.model.params.phase_offset[0])
            if cfg.opt.optimize_phase_offset
            else float(frame.phase_offset)
        )
        depth_tof = np.asarray(depth_from_tof(
            np.moveaxis(phasor[:3], 0, -1), depth_range, phase_offset))

        real, imag, amp = phasor2real_img_amp(np.moveaxis(phasor[:3], 0, -1))
        imgs = {
            "color": to8b(color),
            "real": to8b(np.abs(real)),
            "imag": to8b(np.abs(imag)),
            "amp": to8b(normalize_im(amp)),
            "depth": depth_to_disp_viz(depth, depth_range),
            "depth_norm": to8b(normalize_im(depth)),
            "depth_tof": depth_to_disp_viz(depth_tof, depth_range),
            "dd": to8b(normalize_im(dd)),
        }
        if cfg.opt.use_quad:
            imgs["quad"] = to8b(normalize_im(np.abs(phasor[3])))
        import imageio

        for ch, img in imgs.items():
            imageio.imwrite(os.path.join(out_dir, ch, f"{i:04d}.png"), img)
            gif_frames[ch].append(img)
        np.save(os.path.join(out_dir, "depth", f"{i:04d}.npy"), depth)
        np.save(os.path.join(out_dir, "depth_tof", f"{i:04d}.npy"), depth_tof)

    if write_video:
        for ch, fr in gif_frames.items():
            if fr:
                _write_gif(os.path.join(out_dir, f"{ch}.gif"), fr)


def render_input_split(trainer, frames, n_frames, out_dir, cfg,
                       max_frames=0):
    """Dump the GT observations as channel sequences (the reference's
    save_input, render.py:150-223): the 'Input' column of the panel."""
    import imageio.v2 as imageio

    count = n_frames if not max_frames else min(n_frames, max_frames)
    depth_range = trainer.scene.data.depth_range
    chans = ["color", "real", "imag", "amp", "depth", "depth_tof"]
    if cfg.opt.use_quad:
        chans += [f"quad_q{k}" for k in range(4)]
    for ch in chans:
        os.makedirs(os.path.join(out_dir, ch), exist_ok=True)
    for i in range(count):
        frame = take_frame(frames, i)
        gt_phasor = np.asarray(frame.gt_phasor)  # (3,H,W) real/imag/amp
        color = np.moveaxis(np.asarray(frame.gt_image), 0, -1)
        depth_tof = np.asarray(depth_from_tof(
            np.moveaxis(gt_phasor, 0, -1), depth_range,
            float(frame.phase_offset)))
        # same red/blue signed encoding as render_split, so the panel's
        # Input and Ours cells are directly comparable
        real, imag, amp = phasor2real_img_amp(np.moveaxis(gt_phasor, 0, -1))
        imgs = {
            "color": to8b(color),
            "real": to8b(np.abs(real)),
            "imag": to8b(np.abs(imag)),
            "amp": to8b(normalize_im(amp)),
            "depth": depth_to_disp_viz(depth_tof, depth_range),
            "depth_tof": depth_to_disp_viz(depth_tof, depth_range),
        }
        if cfg.opt.use_quad:
            # GT quad captured at this frame's slot (i%4), at quad
            # cadence — the reference's input quad_q{k}_{type} videos
            # (render_ftorf_viz_traj.py save-input path) that feed the
            # staircase panel's diagonal.
            k = i % 4
            q = np.abs(np.asarray(frame.gt_quad[k]))
            imgs[f"quad_q{k}"] = to8b(normalize_im(q))
        for ch, img in imgs.items():
            imageio.imwrite(os.path.join(out_dir, ch, f"{i:04d}.png"), img)


def render_sets(model_path: str, iteration: int = -1, skip_train=False,
                skip_test=False, skip_video=False, max_frames=0):
    trainer, cfg, it = load_trained(model_path, iteration)
    base = os.path.join(model_path, f"renders_{it}")
    if not skip_test:
        render_split(trainer, trainer.scene.test_frames,
                     len(trainer.scene.data.test_cameras),
                     os.path.join(base, "test"), cfg, max_frames,
                     not skip_video)
    if not skip_train and (
        trainer.scene.test_frames is not trainer.scene.train_frames
    ):
        render_split(trainer, trainer.scene.train_frames,
                     trainer.scene.num_train, os.path.join(base, "train"),
                     cfg, max_frames, not skip_video)

    # Spiral + freeze-frame spiral paths, torf scenes only
    # (render.py:352-357): the spiral sweep plays scene time along the
    # path (denominator = num spiral views), the freeze-frame sweep pins
    # time to the middle training frame.
    if trainer.scene.scene_type == "torf" and trainer.scene.num_spiral:
        import dataclasses

        n_sp = trainer.scene.num_spiral
        spiral = trainer.scene.spiral_frames
        base_static = trainer._static_for(max(it, 1))
        st_spiral = dataclasses.replace(
            base_static, total_num_views=max(n_sp, 2)
        )
        render_split(trainer, spiral, n_sp,
                     os.path.join(base, "renders_spiral"), cfg, max_frames,
                     not skip_video, static=st_spiral)
        render_split(trainer, spiral, n_sp,
                     os.path.join(base, "freezeframe_spiral"), cfg,
                     max_frames, not skip_video, static=base_static,
                     frame_id_override=cfg.model.total_num_views // 2)

    if not skip_video and not skip_test:
        from gftorf_tpu.video_panel import create_video_panel

        render_input_split(trainer, trainer.scene.test_frames,
                           len(trainer.scene.data.test_cameras),
                           os.path.join(model_path, "input"), cfg,
                           max_frames)
        create_video_panel(model_path, it,
                           scene_type=trainer.scene.scene_type)
    print(f"renders written to {base}")
    return base
