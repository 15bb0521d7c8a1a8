"""Training-time visual debugging: predicted/GT/error channel dumps and
parameter histograms.

Counterpart of the reference's tmp_debug_* image dumps
(train.py:57-98,287-398) and the TensorBoard histograms
(train.py:595-601). Images land under model_path/tmp_debug_<channel>/
as {iteration:06d}.png; histograms are plain dicts the Trainer log
writes into train_log.jsonl (no TensorBoard dependency)."""

from __future__ import annotations

import os

import jax
import numpy as np

from gftorf_tpu.models.gaussians import get_opacity, get_scaling
from gftorf_tpu.ops.sh import sh2pa
from gftorf_tpu.ops.tof import depth_from_tof
from gftorf_tpu.train.evaluate import eval_frame
from gftorf_tpu.utils.viz import (
    depth_to_disp_viz,
    normalize_im,
    phasor2real_img_amp,
    to8b,
)


def _err(pred, gt):
    return to8b(normalize_im(np.abs(pred - gt)))


def dump_debug_images(trainer, idx: int, iteration: int) -> None:
    """Render training camera `idx` and write predicted / GT / error
    images per channel under model_path/tmp_debug_*."""
    import imageio.v2 as imageio

    model_path = trainer.cfg.model.model_path
    if not model_path:
        return
    static = trainer._static_for(max(iteration, 1))
    # The training step gates need_dd on the dd-loss schedule; the debug
    # dump must always show the real depth-distortion channel (the
    # reference's tmp_debug dumps are unconditional, train.py:287-398),
    # so re-enable it for this render regardless of the loss gates.
    if not static.config_tof.need_dd:
        import dataclasses

        static = dataclasses.replace(
            static,
            config_tof=dataclasses.replace(static.config_tof, need_dd=True),
        )
    frame = jax.tree.map(lambda a: a[idx], trainer.scene.train_frames)
    _, out_color, out_tof = eval_frame(
        static, trainer.model.params, trainer.deform,
        trainer.model.aux.alive, frame,
    )
    depth_range = trainer.scene.data.depth_range
    phasor = np.asarray(out_tof.phasor)
    gt_phasor = np.asarray(frame.gt_phasor)
    # signed red/blue visualizations for pred+gt, errors on raw channels
    real_v, imag_v, amp = phasor2real_img_amp(np.moveaxis(phasor[:3], 0, -1))
    g_real_v, g_imag_v, g_amp = phasor2real_img_amp(
        np.moveaxis(gt_phasor, 0, -1)
    )
    color = np.moveaxis(np.asarray(out_color.color), 0, -1)
    g_color = np.moveaxis(np.asarray(frame.gt_image), 0, -1)
    depth = np.asarray(out_tof.depth[0])
    phase_depth = np.asarray(depth_from_tof(
        np.moveaxis(phasor[:3], 0, -1), depth_range,
        float(frame.phase_offset)))
    # Scattering-phase diagnostics (train.py:63-66,196-198): amplitude
    # with the 1/d^2 falloff undone — amp * depth^2 — computed from the
    # composited depth and from the ToF phase depth, vs GT.
    g_phase_depth = np.asarray(depth_from_tof(
        np.moveaxis(gt_phasor, 0, -1), depth_range,
        float(frame.phase_offset)))
    g_scat = g_amp * g_phase_depth**2
    scat = amp * depth**2
    scat_tof = amp * phase_depth**2

    imgs = {
        "real": (to8b(real_v), to8b(g_real_v),
                 _err(phasor[0], gt_phasor[0])),
        "imag": (to8b(imag_v), to8b(g_imag_v),
                 _err(phasor[1], gt_phasor[1])),
        "amp": (to8b(normalize_im(amp)), to8b(normalize_im(g_amp)),
                _err(amp, g_amp)),
        "color": (to8b(color), to8b(g_color), _err(color, g_color)),
        "depth": (depth_to_disp_viz(depth, depth_range), None, None),
        "dd": (to8b(normalize_im(
            np.asarray(out_tof.depth_distortion[0]))), None, None),
        "phase_depth": (depth_to_disp_viz(phase_depth, depth_range),
                        None, None),
        "scattering_phase": (to8b(normalize_im(scat)),
                             to8b(normalize_im(g_scat)),
                             _err(scat, g_scat)),
        "scattering_phase_tof_depth": (to8b(normalize_im(scat_tof)), None,
                                       _err(scat_tof, g_scat)),
    }
    if trainer.cfg.opt.use_quad:
        k = int(frame.frame_id) % 4
        inv = trainer.scene.tof_inverse_permutation
        pred_q = phasor[3:][list(inv)][k]
        gt_q = np.asarray(frame.gt_quad)[k]
        imgs["quad"] = (to8b(np.abs(pred_q)), to8b(np.abs(gt_q)),
                        _err(pred_q, gt_q))

    fid = int(frame.frame_id)
    for ch, (pred, gt, err) in imgs.items():
        d = os.path.join(model_path, f"tmp_debug_{ch}")
        os.makedirs(d, exist_ok=True)
        imageio.imwrite(os.path.join(d, f"{iteration:06d}_{fid:04d}.png"),
                        pred)
        if gt is not None:
            dg = os.path.join(model_path, f"tmp_debug_{ch}_gt")
            os.makedirs(dg, exist_ok=True)
            imageio.imwrite(
                os.path.join(dg, f"{iteration:06d}_{fid:04d}.png"), gt
            )
        if err is not None:
            de = os.path.join(model_path, f"tmp_debug_{ch}_error")
            os.makedirs(de, exist_ok=True)
            imageio.imwrite(
                os.path.join(de, f"{iteration:06d}_{fid:04d}.png"), err
            )


def param_series(model) -> dict:
    """Raw per-live-Gaussian series behind the reference's TB
    histograms (train.py:595-601): opacity, center distance, amplitude,
    mean scale — as {name: 1-D np.ndarray}."""
    alive = np.asarray(model.aux.alive)
    params = model.params
    return {
        "opacity": np.asarray(get_opacity(params))[alive, 0],
        "dist": np.linalg.norm(np.asarray(params.xyz)[alive], axis=-1),
        "amplitude": np.asarray(sh2pa(params.sh_amp[:, 0]))[alive],
        "scale": np.asarray(get_scaling(params))[alive].mean(-1),
    }


def param_histograms(model, bins: int = 32) -> dict:
    """Opacity / center-distance / amplitude histograms over live
    Gaussians (the reference's TB histograms, train.py:595-601), as
    {name: {"edges": [...], "counts": [...]}} for train_log.jsonl."""
    series = param_series(model)
    out = {}
    for name, vals in series.items():
        if vals.size == 0:
            out[name] = {"edges": [], "counts": []}
            continue
        counts, edges = np.histogram(vals, bins=bins)
        out[name] = {
            "edges": [round(float(e), 6) for e in edges],
            "counts": [int(c) for c in counts],
        }
    return out
