"""The jitted training step: render both cameras, assemble the 9-term
loss, differentiate, and apply both Adam updates.

One fused XLA program per static configuration (loss windows flip a few
times over a run -> a handful of recompiles), mirroring one iteration of
the reference hot loop (train.py:118-482):

    bg map -> deform query -> render(color cam) + render(tof cam)
    -> losses -> grads -> clip deform -> Adam x2 -> densification stats

Cross-reference map:
 - deform time conditioning / quad-frame interpolation: train.py:164-177
 - static/dynamic composition: gaussian_renderer/__init__.py:81-105
 - loss assembly: train.py:201-277
 - optimizer gymnastics (freeze after densify_until_iter, deform pause
   after opacity resets): train.py:467-474 — expressed here as lr
   multipliers computed host-side.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gftorf_tpu.models.deform import (
    DeformConfig,
    DeformParams,
    apply_deform,
    clip_by_global_norm,
)
from gftorf_tpu.models.gaussians import (
    AdamState,
    GaussianAux,
    GaussianModelState,
    GaussianParams,
    add_densification_stats,
    adam_update,
    get_features_phasor,
    get_motion_mask,
    get_opacity,
    get_rotation,
    get_scaling,
)
from gftorf_tpu.ops.flow import (
    distance_to_points3d,
    intrinsics_matrix,
    project_flow,
    project_points,
)
from gftorf_tpu.ops.tof import depth_from_tof
from gftorf_tpu.render.rasterize import rasterize
from gftorf_tpu.render.settings import CameraSpec, RasterConfig
from gftorf_tpu.train import losses as L


class FrameData(NamedTuple):
    """Per-frame observations; stack with leading N axis for the dataset."""

    frame_id: jnp.ndarray  # () int32
    cam_color: CameraSpec
    cam_tof: CameraSpec
    gt_image: jnp.ndarray  # (3, Hc, Wc)
    gt_phasor: jnp.ndarray  # (3, Ht, Wt) real/imag/amp
    gt_quad: jnp.ndarray  # (4, Ht, Wt)
    gt_distance: jnp.ndarray  # (1, Ht, Wt)
    forward_flow: jnp.ndarray  # (2, Ht, Wt)
    backward_flow: jnp.ndarray  # (2, Ht, Wt)
    has_forward_flow: jnp.ndarray  # () bool
    has_backward_flow: jnp.ndarray  # () bool
    phase_offset: jnp.ndarray  # () camera-calibrated phase offset
    dc_offset: jnp.ndarray  # ()
    intrinsics_tof: jnp.ndarray  # (3, 3) K_tof
    intrinsics_color: jnp.ndarray  # (3, 3) K color


class LossWeights(NamedTuple):
    """Traced per-iteration loss weights (lambda_color flips at tof_iters)."""

    color: jnp.ndarray
    tof: jnp.ndarray
    dssim: jnp.ndarray
    depth: jnp.ndarray
    dd: jnp.ndarray
    flow: jnp.ndarray
    oe: jnp.ndarray
    scale: jnp.ndarray
    mlp_reg: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class StepStatic:
    """Hashable static configuration of the step program."""

    scene_type: str  # 'torf' | 'ftorf' | 'color'
    config_color: RasterConfig
    config_tof: RasterConfig
    deform: DeformConfig
    active_sh_degree: int
    total_num_views: int
    render_regions: Tuple[str, ...]
    dynamic_on: bool  # dataset.dynamic and iteration > warm_up
    sync_phase: bool  # use_quad and warm_up < it <= optimize_sync_iters
    use_quad: bool
    use_wl1c: bool
    use_wl1p: bool
    wl1p_e: float
    num_phasor_channels: int
    color_on: bool
    depth_on: bool
    dd_on: bool
    oe_on: bool
    scale_on: bool
    mlp_reg_on: bool
    flow_on: bool
    optimize_phase_offset: bool
    optimize_dc_offset: bool
    random_bg: bool
    bg_color: Tuple[float, ...] = (0.0,) * 7
    tof_permutation: Tuple[int, ...] = (0, 1, 2, 3)
    tof_inverse_permutation: Tuple[int, ...] = (0, 1, 2, 3)
    scene_extent: float = 1.0
    # F-ToRF has identical color/ToF cameras (identity extrinsics, same
    # intrinsics); one rasterization already produces both the color and
    # phasor outputs, so the second pass is pure waste.
    single_camera: bool = False


def _query_deform(static: StepStatic, deform_params, params, fid):
    """d_xyz for every point (masked to dynamic by callers); mirrors
    query_dmlp + the F-ToRF interpolation (train.py:164-177)."""
    xyz_n = jax.lax.stop_gradient(params.xyz) / static.scene_extent
    denom = max(static.total_num_views - 1, 1)

    def q(t_scalar):
        t = jnp.broadcast_to(t_scalar, (xyz_n.shape[0], 1))
        return apply_deform(deform_params, static.deform, xyz_n, t)

    if static.scene_type == "torf":
        d_xyz, d_rot, d_sh, d_sh_p = q(fid.astype(jnp.float32) / denom)
        return d_xyz, d_rot, d_sh, d_sh_p, d_xyz, d_xyz
    # ftorf: lerp between the neighboring integration (multiple-of-4) frames
    curr = (fid // 4) * 4
    nxt = curr + 4
    d_curr, d_rot, d_sh, d_sh_p = q(curr.astype(jnp.float32) / denom)
    d_next, _, _, _ = q(nxt.astype(jnp.float32) / denom)
    if static.sync_phase:
        d_xyz = d_curr
    else:
        frac_next = (fid - curr).astype(jnp.float32)
        frac_curr = (nxt - fid).astype(jnp.float32)
        lerp = 0.25 * (frac_next * d_next + frac_curr * d_curr)
        d_xyz = jnp.where(fid % 4 == 0, d_curr, lerp)
    return d_xyz, d_rot, d_sh, d_sh_p, d_curr, d_next


def _compose(static: StepStatic, params, d_xyz, d_rot, d_sh, alive):
    """Static/dynamic composition (gaussian_renderer/__init__.py:81-105).

    Returns (means3d, scales, rotations, opacity, shs, shs_p, include).
    Instead of zeroing excluded points like the reference, we drop them
    from binning via the include mask (same output, less work).
    """
    motion = get_motion_mask(params)
    inc_static = "static" in static.render_regions
    inc_dynamic = "dynamic" in static.render_regions
    include = jnp.where(motion, inc_dynamic, inc_static) & alive

    m = motion[:, None]
    means3d = jnp.where(m, params.xyz + d_xyz, params.xyz)
    rotations = jnp.where(
        m, get_rotation(params._replace(rotation=params.rotation + d_rot)),
        get_rotation(params),
    )
    shs = jnp.where(motion[:, None, None], params.sh_color + d_sh, params.sh_color)
    shs_p = get_features_phasor(params)
    return (
        means3d,
        get_scaling(params),
        rotations,
        get_opacity(params)[:, 0],
        shs,
        shs_p,
        include,
    )


def _select_tof(static: StepStatic, phasor, frame, weights):
    """Pick rendered-vs-GT ToF channels (train.py:208-228)."""
    perm = jnp.asarray(static.tof_permutation, jnp.int32)
    inv_perm = jnp.asarray(static.tof_inverse_permutation, jnp.int32)
    if static.use_quad:
        if static.sync_phase:
            tof_gt = frame.gt_quad[perm][2][None]
            tof_rendered = phasor[3:][2][None]
        else:
            k = frame.frame_id % 4
            tof_gt = jnp.take(frame.gt_quad, k, axis=0)[None]
            tof_rendered = jnp.take(phasor[3:][inv_perm], k, axis=0)[None]
    else:
        n = static.num_phasor_channels
        tof_gt = frame.gt_phasor[:n]
        tof_rendered = phasor[:n]
    return tof_rendered, tof_gt


@functools.partial(jax.jit, static_argnums=(0,))
def train_step(
    static: StepStatic,
    model: GaussianModelState,
    deform_params: DeformParams,
    deform_adam,
    frame: FrameData,
    key: jnp.ndarray,
    weights: LossWeights,
    lrs: GaussianParams,
    deform_lr,
    gauss_step_scale,  # 0.0 freezes the gaussian optimizer
    deform_step_scale,  # 0.0 pauses the deform optimizer
):
    params, aux, adam = model
    n_points = params.xyz.shape[0]

    # --- Background maps (train.py:122-128). Separate keys per camera
    # size; identical map when sizes match (like the reference).
    hc, wc = static.config_color.height, static.config_color.width
    ht, wt = static.config_tof.height, static.config_tof.width
    if static.random_bg:
        bg_tof = jax.random.uniform(key, (7, ht, wt), minval=-1.0, maxval=1.0)
        bg_color_map = (
            bg_tof
            if (hc, wc) == (ht, wt)
            else jax.random.uniform(
                jax.random.fold_in(key, 1), (7, hc, wc), minval=-1.0, maxval=1.0
            )
        )
    else:
        const = jnp.asarray(static.bg_color, jnp.float32)
        bg_tof = jnp.broadcast_to(const[:, None, None], (7, ht, wt))
        bg_color_map = jnp.broadcast_to(const[:, None, None], (7, hc, wc))
    bg_flow = jnp.zeros((7, ht, wt))

    phase_off_cam = frame.phase_offset
    dc_off_cam = frame.dc_offset

    def forward(p: GaussianParams, dfp: DeformParams, means2d_zero):
        if static.dynamic_on:
            d_xyz, d_rot, d_sh, d_sh_p, d_curr, d_next = _query_deform(
                static, dfp, p, frame.frame_id
            )
        else:
            zeros3 = jnp.zeros((n_points, 3))
            m = (static.deform.sh_degree + 1) ** 2
            d_xyz = d_curr = d_next = zeros3
            d_rot = jnp.zeros((n_points, 4))
            d_sh = jnp.zeros((n_points, m, 3))
            d_sh_p = jnp.zeros((n_points, m, 2))

        means3d, scales, rots, opac, shs, shs_p, include = _compose(
            static, p, d_xyz, d_rot, d_sh, aux.alive
        )
        opac_inc = jnp.where(include, opac, 0.0)

        phase_offset = (
            p.phase_offset[0] if static.optimize_phase_offset else phase_off_cam
        )
        dc_offset = p.dc_offset[0] if static.optimize_dc_offset else dc_off_cam

        out_tof = rasterize(
            means3d, scales, rots, opac_inc, shs, shs_p,
            phase_offset, dc_offset, means2d_zero, bg_tof,
            camera=frame.cam_tof, config=static.config_tof,
            active_sh_degree=static.active_sh_degree,
        )
        if static.single_camera:
            out_color = out_tof
        else:
            out_color = rasterize(
                means3d, scales, rots, opac_inc, shs, shs_p,
                phase_offset, dc_offset, means2d_zero, bg_color_map,
                camera=frame.cam_color, config=static.config_color,
                active_sh_degree=static.active_sh_degree,
            )
        return out_color, out_tof, (d_xyz, d_rot, d_curr, d_next, include, opac_inc)

    def loss_fn(p: GaussianParams, dfp: DeformParams, means2d_zero):
        out_color, out_tof, (d_xyz, d_rot, d_curr, d_next, include, opac_inc) = (
            forward(p, dfp, means2d_zero)
        )
        image = out_color.color
        phasor = out_tof.phasor
        depth = out_tof.depth

        total = jnp.float32(0.0)
        metrics = {}

        # Color loss (train.py:204-206)
        if static.color_on:
            if static.use_wl1c:
                ll1 = L.weighted_l1_loss(image, frame.gt_image, 0.01, 3)
            else:
                ll1 = L.l1_loss(image, frame.gt_image)
            total += weights.color * (
                (1.0 - weights.dssim) * ll1
                + weights.dssim * (1.0 - L.ssim(image, frame.gt_image))
            )
            metrics["l1_color"] = ll1

        # ToF loss (train.py:208-228)
        if static.scene_type in ("torf", "ftorf"):
            tof_rendered, tof_gt = _select_tof(static, phasor, frame, weights)
            if static.use_wl1p:
                if static.use_quad:
                    ll1p = L.weighted_l2_loss_quad(tof_rendered, tof_gt, static.wl1p_e)
                else:
                    ll1p = L.weighted_l1_loss(
                        tof_rendered, tof_gt, static.wl1p_e,
                        static.num_phasor_channels,
                    )
            else:
                ll1p = L.l2_loss(tof_rendered, tof_gt)
            total += weights.tof * (
                (1.0 - weights.dssim) * ll1p
                + weights.dssim * (1.0 - L.ssim(tof_rendered, tof_gt))
            )
            metrics["l1_p"] = ll1p

        # Depth loss for baselines (train.py:230-234)
        if static.depth_on:
            if static.scene_type in ("torf", "ftorf"):
                gt_phase_depth = depth_from_tof(
                    jnp.moveaxis(frame.gt_phasor[:3], 0, -1),
                    frame.cam_tof.depth_range,
                    phase_offset=phase_off_cam,
                )[None]
                total += weights.depth * (
                    (1.0 - weights.dssim) * L.l1_loss(depth, gt_phase_depth)
                    + weights.dssim * (1.0 - L.ssim(depth, gt_phase_depth))
                )
            else:
                total += weights.depth * (
                    (1.0 - weights.dssim)
                    * L.l1_loss(out_color.depth, frame.gt_distance)
                    + weights.dssim
                    * (1.0 - L.ssim(out_color.depth, frame.gt_distance))
                )

        # Deformation regularizer (train.py:239-240)
        if static.mlp_reg_on and static.dynamic_on:
            motion = get_motion_mask(p)
            reg = jnp.sum(jnp.abs(d_xyz) * motion[:, None]) / (
                3.0 * jnp.maximum(jnp.sum(motion), 1)
            )
            total += weights.mlp_reg * reg

        # Flow loss (train.py:243-261) on integration frames only.
        if static.flow_on and static.dynamic_on:
            def flow_branch(_):
                k_tof = frame.intrinsics_tof
                view_tof = frame.cam_tof.viewmatrix
                pts3d = distance_to_points3d(
                    jax.lax.stop_gradient(depth), view_tof,
                    k_tof[0, 0], k_tof[1, 1], k_tof[0, 2], k_tof[1, 2],
                )
                pts2d = project_points(pts3d, view_tof, k_tof)
                dummy2d = jnp.zeros_like(means2d_zero)

                def render_flow(flow3d):
                    motion = get_motion_mask(p)
                    flow_masked = jnp.where(motion[:, None], flow3d, 0.0)
                    out = rasterize(
                        jax.lax.stop_gradient(
                            jnp.where(motion[:, None], p.xyz + d_curr, p.xyz)
                        ),
                        jax.lax.stop_gradient(get_scaling(p)),
                        jax.lax.stop_gradient(get_rotation(p)),
                        jax.lax.stop_gradient(opac_inc),
                        None, None, 0.0, 0.0, dummy2d, bg_flow,
                        camera=frame.cam_tof, config=static.config_tof,
                        active_sh_degree=static.active_sh_degree,
                        colors_precomp=flow_masked,
                    )
                    return out.color

                fwd = render_flow(d_next - d_xyz)
                fwd2d = project_flow(pts2d, pts3d, fwd, view_tof, k_tof)
                f_l2 = jnp.where(
                    frame.has_forward_flow,
                    jnp.mean(jnp.square(fwd2d - frame.forward_flow)),
                    0.0,
                )
                # backward flow needs d_prev
                denom = max(static.total_num_views - 1, 1)
                prev_t = ((frame.frame_id // 4) * 4 - 4).astype(jnp.float32) / denom
                xyz_n = jax.lax.stop_gradient(p.xyz) / static.scene_extent
                d_prev, _, _, _ = apply_deform(
                    dfp, static.deform, xyz_n,
                    jnp.broadcast_to(prev_t, (n_points, 1)),
                )
                bwd = render_flow(d_prev - d_xyz)
                bwd2d = project_flow(pts2d, pts3d, bwd, view_tof, k_tof)
                b_l2 = jnp.where(
                    frame.has_backward_flow,
                    jnp.mean(jnp.square(bwd2d - frame.backward_flow)),
                    0.0,
                )
                return f_l2, b_l2

            f_l2, b_l2 = jax.lax.cond(
                frame.frame_id % 4 == 0,
                flow_branch,
                lambda _: (jnp.float32(0.0), jnp.float32(0.0)),
                operand=None,
            )
            total += weights.flow * (f_l2 + b_l2)
            metrics["flow_l2"] = f_l2 + b_l2

        # Depth-distortion loss (train.py:266-267)
        if static.dd_on:
            total += weights.dd * jnp.mean(out_tof.depth_distortion)

        # Opacity entropy on dynamic gaussians (train.py:270-272)
        if static.oe_on:
            motion = get_motion_mask(p) & aux.alive
            op = get_opacity(p)[:, 0]
            ent = -op * jnp.log(op + 1e-10) - (1 - op) * jnp.log(1 - op + 1e-10)
            total += weights.oe * jnp.sum(ent * motion) / jnp.maximum(
                jnp.sum(motion), 1
            )

        # Scale regularizer on visible gaussians (train.py:275-277)
        if static.scale_on:
            vis = out_tof.radii > 0
            s = get_scaling(p)
            per = jnp.mean(s, axis=-1) ** 2
            total += weights.scale * jnp.sum(per * vis) / jnp.maximum(
                jnp.sum(vis), 1
            )

        metrics["loss"] = total
        aux_out = (out_color, out_tof, metrics)
        return total, aux_out

    means2d_zero = jnp.zeros((n_points, 2))
    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
    (g_params, g_deform, g_means2d), (out_color, out_tof, metrics) = grad_fn(
        params, deform_params, means2d_zero
    )

    # --- Densification stats (train.py:441-449)
    motion = get_motion_mask(params)
    if tuple(static.render_regions) == ("static",):
        apply_mask = ~motion
    elif tuple(static.render_regions) == ("dynamic",):
        apply_mask = motion
    else:
        apply_mask = None
    new_aux = add_densification_stats(
        aux, g_means2d, out_tof.radii, out_tof.pixels[:, 0], apply_mask
    )

    # --- Optimizers (train.py:467-474). Dead capacity slots must receive
    # exactly-zero gradients (belt to the safe-normalize suspenders: any
    # NaN there would poison Adam moments and, via the deform MLP's
    # full-capacity input, the whole model).
    def mask_dead(g):
        if g.ndim >= 1 and g.shape[0] == n_points:
            return jnp.where(
                aux.alive.reshape((n_points,) + (1,) * (g.ndim - 1)),
                g, jnp.zeros_like(g),
            )
        return g

    g_params = jax.tree.map(mask_dead, g_params)
    lrs_eff = jax.tree.map(lambda lr: lr * gauss_step_scale, lrs)
    new_params, new_adam = adam_update(params, g_params, adam, lrs_eff)

    g_deform = clip_by_global_norm(g_deform, 1.0)
    d_lr = jax.tree.map(lambda _: deform_lr * deform_step_scale, deform_params)
    new_deform, new_deform_adam = adam_update(
        deform_params, g_deform, deform_adam, d_lr
    )

    metrics["num_rendered"] = out_tof.num_rendered
    metrics["dup_overflow"] = out_tof.dup_overflow
    metrics["tile_overflow"] = out_tof.tile_overflow
    metrics["visible"] = jnp.sum(out_tof.radii > 0)

    new_model = GaussianModelState(new_params, new_aux, new_adam)
    return new_model, new_deform, new_deform_adam, metrics
