"""Per-Gaussian preprocessing: cull, project, build conics and features.

Pure-jnp, fully differentiable reimplementation of the reference's
preprocess kernel (cuda_rasterizer/forward.cu:251-419). One function over
(P, ...) arrays; XLA vectorizes it — no kernel needed, this stage is
bandwidth-trivial compared to compositing.

Gradient-semantics notes (these make jax.grad match the reference's
hand-written backward, backward.cu:265-606):
 - color clamp at 0 and amplitude clamp at 0 use max(0, .) whose autodiff
   zeroes the gradient exactly like the CUDA `clamped` bookkeeping;
 - the 1.3*tan(fov) view clamp uses jnp.clip (zero gradient outside,
   matching x_grad_mul/y_grad_mul in backward.cu:296-297);
 - the phase DC-removal (forward.cu:115) subtracts stop_gradient(SH_C0 *
   sh_p[0].phase): the reference backward does NOT account for the DC
   removal (backward.cu:168-169 backprops the full basis), so the value
   matches the forward and the gradient matches the reference backward;
 - quaternions are used unnormalized (forward.cu:181) and the gradient is
   w.r.t. the unnormalized quaternion (backward.cu:459-461).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gftorf_tpu.ops.covariance import (
    build_cov3d,
    conic_from_cov2d,
    ewa_project_cov2d,
    screen_radius,
)
from gftorf_tpu.ops.sh import SH_C0, eval_sh
from gftorf_tpu.ops.tof import phasor_channels
from gftorf_tpu.ops.transforms import (
    ndc2pix,
    transform_point_4x3,
    transform_point_4x4,
)
from gftorf_tpu.render.settings import CameraSpec, RasterConfig


class PreprocessOutputs(NamedTuple):
    valid: jnp.ndarray  # (P,) bool — survives culling
    mean2d: jnp.ndarray  # (P, 2) pixel coords
    depth_view: jnp.ndarray  # (P,) view-space z (sort key)
    conic: jnp.ndarray  # (P, 3) inverse 2D covariance
    opacity: jnp.ndarray  # (P,)
    rgb: jnp.ndarray  # (P, 3)
    phasor: jnp.ndarray  # (P, 7)
    dist: jnp.ndarray  # (P,) distance to light
    dist_ndc: jnp.ndarray  # (P,) NDC-mapped distance
    radius: jnp.ndarray  # (P,) float radius (ceil applied)
    rect: jnp.ndarray  # (P, 4) int32 tile rect [x0, y0, x1, y1)
    tiles_touched: jnp.ndarray  # (P,) int32


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    shs_p: Optional[jnp.ndarray],
    phase_offset,
    dc_offset,
    means2d_ndc: jnp.ndarray,
    camera: CameraSpec,
    config: RasterConfig,
    active_sh_degree: int,
    colors_precomp: Optional[jnp.ndarray] = None,
    phasors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
) -> PreprocessOutputs:
    """Preprocess all Gaussians for one camera.

    Args:
        means3d: (P, 3). scales: (P, 3). rotations: (P, 4) quats (r,x,y,z).
        opacities: (P,) or (P, 1), already sigmoid-activated.
        shs: (P, M, 3) color SH or None (then colors_precomp required).
        shs_p: (P, M, 2) (phase, amp) SH or None.
        phase_offset, dc_offset: scalars (traced).
        means2d_ndc: (P, 2) zeros; gradients w.r.t. this give the
            NDC-space screen gradient used for densification (same
            convention as the reference's dL_dmean2D).
        colors_precomp: (P, 3) used instead of SH (e.g. flow splatting).
        phasors_precomp: (P, 2) (phase, amplitude) instead of SH. Note the
            reference does NOT add phase_offset in this branch
            (forward.cu:367); we reproduce that.
        cov3d_precomp: (P, 6) packed covariance instead of scale/rot.
    """
    P = means3d.shape[0]
    opacities = opacities.reshape(P)

    # --- Projection & frustum cull (forward.cu:290-305, auxiliary.h:152-179)
    p_view = transform_point_4x3(means3d, camera.viewmatrix)
    depth_view = p_view[..., 2]
    in_frustum = (depth_view >= camera.znear) & (depth_view <= camera.zfar)
    # Culled Gaussians never contribute, but their values must stay finite
    # (NaN * 0 = NaN would poison gradients), so divisions below use
    # frustum-sanitized inputs.
    p_view = jnp.where(in_frustum[..., None], p_view, jnp.ones_like(p_view))

    p_hom = transform_point_4x4(means3d, camera.projmatrix)
    denom = p_hom[..., 3] + 1e-7
    p_w = 1.0 / jnp.where(in_frustum, denom, jnp.ones_like(denom))
    p_proj = p_hom[..., :3] * p_w[..., None]
    ndc_xy = p_proj[..., :2] + means2d_ndc
    mean2d = jnp.stack(
        [ndc2pix(ndc_xy[..., 0], config.width), ndc2pix(ndc_xy[..., 1], config.height)],
        axis=-1,
    )

    # --- Covariance (forward.cu:307-337)
    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = build_cov3d(scales, config.scale_modifier, rotations)
    cov2d = jax.vmap(
        lambda t, c: ewa_project_cov2d(
            t, c, camera.viewmatrix, camera.focal_x, camera.focal_y,
            camera.tan_fovx, camera.tan_fovy,
        )
    )(p_view, cov3d)
    conic, det = conic_from_cov2d(cov2d)
    det_ok = det != 0.0
    radius = screen_radius(cov2d, det)

    # --- Tile rect (auxiliary.h:49-59)
    gw, gh = config.grid_w, config.grid_h
    r = jax.lax.stop_gradient(radius)
    m2d = jax.lax.stop_gradient(mean2d)
    x0 = jnp.clip(jnp.floor((m2d[..., 0] - r) / config.tile_w), 0, gw).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((m2d[..., 1] - r) / config.tile_h), 0, gh).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.floor((m2d[..., 0] + r + config.tile_w - 1) / config.tile_w), 0, gw
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.floor((m2d[..., 1] + r + config.tile_h - 1) / config.tile_h), 0, gh
    ).astype(jnp.int32)
    tiles_touched = (x1 - x0) * (y1 - y0)
    # Zero-opacity cull (deviation from forward.cu, which only skips
    # alpha < 1/255 per pixel): an instance with opacity exactly 0
    # contributes nothing to any output and its upstream gradients are
    # blocked by the caller's include/alive masking, but it would still
    # occupy a lane in every tile it touches. Training zeroes opacity
    # for excluded/pruned capacity slots, so without this cull dead
    # slots bloat the dense (T, L) layout and can force spurious
    # max_per_tile escalation. Output-identical; the only gradient it
    # drops is dL/dopacity AT opacity == 0, which no caller consumes.
    valid = in_frustum & det_ok & (tiles_touched > 0) & (opacities > 0.0)
    tiles_touched = jnp.where(valid, tiles_touched, 0)
    rect = jnp.stack([x0, y0, x1, y1], axis=-1)

    # --- View direction for SH. rsqrt(sum+eps) keeps the gradient exactly
    # zero at the origin: dead/padded slots sit at xyz=0 with the camera
    # possibly at the origin too, and d|x|/dx at 0 is NaN otherwise —
    # which poisons Adam state the moment SH degree > 0 activates this
    # path.
    dir_raw = means3d - camera.campos
    dir_n = dir_raw * jax.lax.rsqrt(
        jnp.sum(dir_raw * dir_raw, axis=-1, keepdims=True) + 1e-20
    )

    # --- Color (forward.cu:344-359)
    if shs is not None:
        rgb = eval_sh(active_sh_degree, jnp.swapaxes(shs, -1, -2), dir_n) + 0.5
        rgb = jnp.maximum(rgb, 0.0)
    elif colors_precomp is not None:
        rgb = colors_precomp
    else:
        rgb = jnp.zeros((P, 3), means3d.dtype)

    # --- ToF phasor (forward.cu:361-407)
    dist = jnp.linalg.norm(p_view, axis=-1)
    dist_ndc = camera.zfar / (camera.zfar - camera.znear) * (1.0 - camera.znear / dist)

    if shs_p is not None:
        pa = eval_sh(active_sh_degree, jnp.swapaxes(shs_p, -1, -2), dir_n) + 0.5
        # Phase: remove DC with reference-matching gradient (see module doc).
        phase_sh = pa[..., 0] - jax.lax.stop_gradient(0.5 + SH_C0 * shs_p[..., 0, 0])
        amp = jnp.maximum(pa[..., 1], 0.0)
        phasor = phasor_channels(
            dist, phase_sh, amp, camera.depth_range, phase_offset, dc_offset,
            config.use_view_dependent_phase,
        )
    elif phasors_precomp is not None:
        phase_sh = phasors_precomp[..., 0]
        amp = phasors_precomp[..., 1]
        # Reference precomp branch omits phase_offset (forward.cu:367).
        phasor = phasor_channels(
            dist, phase_sh, amp, camera.depth_range, 0.0, dc_offset,
            config.use_view_dependent_phase,
        )
    else:
        phasor = jnp.zeros((P, 7), means3d.dtype)

    radius_out = jnp.where(valid, radius, 0.0)
    return PreprocessOutputs(
        valid=valid,
        mean2d=mean2d,
        depth_view=depth_view,
        conic=conic,
        opacity=opacities,
        rgb=rgb,
        phasor=phasor,
        dist=dist,
        dist_ndc=dist_ndc,
        radius=radius_out,
        rect=rect,
        tiles_touched=tiles_touched,
    )
