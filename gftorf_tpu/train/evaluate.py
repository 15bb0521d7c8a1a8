"""Evaluation: the training_report metrics (train.py:508-603) computed
with a jitted no-grad render over the train/test splits."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gftorf_tpu.models.gaussians import (
    get_features_phasor,
    get_motion_mask,
    get_opacity,
    get_rotation,
    get_scaling,
)
from gftorf_tpu.ops.tof import depth_from_tof
from gftorf_tpu.render.rasterize import rasterize
from gftorf_tpu.train import losses as L
from gftorf_tpu.train.step import FrameData, StepStatic, _compose, _query_deform


@functools.partial(jax.jit, static_argnums=(0,))
def eval_frame(static: StepStatic, params, deform_params, alive,
               frame: FrameData):
    """Render one frame (constant zero bg) and compute report metrics."""
    n = params.xyz.shape[0]
    if static.dynamic_on:
        d_xyz, d_rot, d_sh, d_sh_p, _, _ = _query_deform(
            static, deform_params, params, frame.frame_id, alive=alive
        )
    else:
        m = (static.deform.sh_degree + 1) ** 2
        d_xyz = jnp.zeros((n, 3))
        d_rot = jnp.zeros((n, 4))
        d_sh = jnp.zeros((n, m, 3))
        d_sh_p = jnp.zeros((n, m, 2))

    means3d, scales, rots, opac, shs, shs_p, include = _compose(
        static, params, d_xyz, d_rot, d_sh, alive
    )
    opac_inc = jnp.where(include, opac, 0.0)
    zeros2d = jnp.zeros((n, 2))

    hc, wc = static.config_color.height, static.config_color.width
    ht, wt = static.config_tof.height, static.config_tof.width
    bg_c = jnp.zeros((7, hc, wc))
    bg_t = jnp.zeros((7, ht, wt))

    phase_offset = (
        params.phase_offset[0] if static.optimize_phase_offset
        else frame.phase_offset
    )
    dc_offset = (
        params.dc_offset[0] if static.optimize_dc_offset else frame.dc_offset
    )

    out_tof = rasterize(
        means3d, scales, rots, opac_inc, shs, shs_p, phase_offset, dc_offset,
        zeros2d, bg_t, camera=frame.cam_tof, config=static.config_tof,
        active_sh_degree=static.active_sh_degree,
    )
    if static.single_camera:
        out_color = out_tof
    else:
        out_color = rasterize(
            means3d, scales, rots, opac_inc, shs, shs_p, phase_offset,
            dc_offset, zeros2d, bg_c, camera=frame.cam_color,
            config=static.config_color,
            active_sh_degree=static.active_sh_degree,
        )

    metrics = {}
    metrics["l1_color"] = L.l1_loss(out_color.color, frame.gt_image)
    metrics["psnr_color"] = L.psnr(out_color.color, frame.gt_image)

    if static.scene_type in ("torf", "ftorf"):
        phasor = out_tof.phasor
        if static.use_quad:
            inv = jnp.asarray(static.tof_inverse_permutation, jnp.int32)
            k = frame.frame_id % 4
            tof_gt = jnp.take(frame.gt_quad, k, axis=0)[None]
            tof_r = jnp.take(phasor[3:][inv], k, axis=0)[None]
        else:
            nph = static.num_phasor_channels
            tof_gt = frame.gt_phasor[:nph]
            tof_r = phasor[:nph]
        metrics["l1_p"] = L.l1_loss(tof_r, tof_gt)
        metrics["l2_p"] = L.l2_loss(tof_r, tof_gt)
        metrics["psnr_p"] = L.psnr(tof_r, tof_gt)

        depth_tof = depth_from_tof(
            jnp.moveaxis(phasor[:3], 0, -1), frame.cam_tof.depth_range,
            phase_offset=phase_offset,
        )[None]
        metrics["l1_d"] = L.l1_loss(out_tof.depth, frame.gt_distance)
        metrics["l2_d"] = L.l2_loss(out_tof.depth, frame.gt_distance)
        metrics["l2_d_tof"] = L.l2_loss(depth_tof, frame.gt_distance)
        metrics["mae_d_tof"] = L.l1_loss(depth_tof, frame.gt_distance)

    return metrics, out_color, out_tof


def evaluate_split(trainer, frames: FrameData, n_frames: int,
                   max_frames: int = 0) -> dict:
    from gftorf_tpu.utils.metrics import lpips, lpips_available

    static = trainer._static_for(trainer.iteration or 1)
    use_lpips = lpips_available()
    totals = None
    count = 0
    idxs = range(n_frames if not max_frames else min(n_frames, max_frames))
    for i in idxs:
        frame = jax.tree.map(lambda a: a[i], frames)
        metrics, out_color, _ = eval_frame(
            static, trainer.model.params, trainer.deform,
            trainer.model.aux.alive, frame,
        )
        metrics = {k: float(v) for k, v in metrics.items()}
        if use_lpips:
            metrics["lpips"] = float(lpips(out_color.color, frame.gt_image))
        if totals is None:
            totals = dict(metrics)
        else:
            for k, v in metrics.items():
                totals[k] += v
        count += 1
    out = {k: v / count for k, v in totals.items()}
    if not use_lpips:
        # weights unobtainable in this image (no egress); see
        # tools/convert_lpips_weights.py
        out["lpips"] = None
    return out


def evaluate_and_report(trainer, max_frames: int = 0) -> dict:
    out = {
        "test": evaluate_split(
            trainer, trainer.scene.test_frames,
            len(trainer.scene.data.test_cameras), max_frames,
        )
    }
    if trainer.scene.test_frames is not trainer.scene.train_frames:
        out["train"] = evaluate_split(
            trainer, trainer.scene.train_frames, trainer.scene.num_train,
            max_frames,
        )
    else:
        out["train"] = out["test"]
    return out
