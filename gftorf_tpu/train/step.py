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
   after opacity resets): train.py:467-474 — the freeze is a static
   branch (the post-freeze program skips the per-Gaussian backward);
   the pause is a traced step-skip (moments and counter untouched).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

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
from gftorf_tpu.parallel.mesh import cached_mesh
from gftorf_tpu.parallel.sharded import rasterize_sharded
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


# Fixed metric layout of the packed per-step metrics vector (unused
# entries are zero so the layout never depends on the static config).
METRIC_NAMES = (
    "loss", "l1_color", "l1_p", "flow_l2", "num_rendered", "dup_overflow",
    "tile_overflow", "visible", "num_points", "compact_overflow",
    "tile_max", "rendered_max",
)


class LossWeights(NamedTuple):
    """Per-iteration loss weights (lambda_color flips at tof_iters)."""

    color: float
    tof: float
    dssim: float
    depth: float
    dd: float
    flow: float
    oe: float
    scale: float
    mlp_reg: float


class SchedStatic(NamedTuple):
    """Static schedule constants folded into the step program.

    Learning rates, loss lambdas and optimizer gating are deterministic
    functions of the iteration counter; computing them *inside* jit from
    a single traced ``it`` scalar removes ~20 host->device transfers per
    step (each a multi-ms round trip through the TPU tunnel). Mirrors
    get_expon_lr_func (utils/general_utils.py:41-75) + training_setup
    (gaussian_model.py:247-313) + the loss lambdas of train.py:201-277.

    ``lambda_color`` / ``opacity_reset_interval`` hold their *current*
    values (they change once, at tof_iters — one extra recompile).
    """

    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_max_steps: int = 30000
    feature_lr: float = 0.0025
    feature_phase_lr_init: float = 0.0001
    feature_phase_lr_final: float = 0.000001
    feature_amp_lr_init: float = 0.0001
    feature_amp_lr_final: float = 0.0001
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    phase_offset_lr: float = 0.0
    dc_offset_lr: float = 0.0
    optimize_offset_start: int = 0
    deform_lr_init: float = 0.00016
    deform_lr_final: float = 0.0000016
    warm_up: int = 3000
    weights: LossWeights = LossWeights(1.0, 1.0, 0.2, 0.0, 0.0, 0.0,
                                       0.0, 0.0, 0.0)
    opacity_reset_interval: int = 3000
    densify_until_iter: int = 15000
    # Loss windows, applied as TRACED weight gates inside the step (a
    # zero weight instead of a recompile: each static phase flip costs
    # minutes of XLA compile through the TPU tunnel, and these terms are
    # cheap to compute unconditionally). Strict bounds like the
    # reference's `start < iteration < end` checks (train.py:264-277).
    tof_iters: int = 0  # >0: lambda_color -> 1.0 and opacity-reset
    #                     interval halves AFTER this iteration
    #                     (train.py:476-478)
    dd_window: Tuple[int, int] = (0, 0)
    oe_window: Tuple[int, int] = (0, 0)
    scale_window: Tuple[int, int] = (0, 0)
    flow_start: int = 0

    @staticmethod
    def from_opt(opt, lambda_color: float,
                 opacity_reset_interval: int) -> "SchedStatic":
        """Build from an OptimizationParams + the host-tracked mutables."""
        return SchedStatic(
            position_lr_init=opt.position_lr_init,
            position_lr_final=opt.position_lr_final,
            position_lr_max_steps=opt.position_lr_max_steps,
            feature_lr=opt.feature_lr,
            feature_phase_lr_init=opt.feature_phase_lr_init,
            feature_phase_lr_final=opt.feature_phase_lr_final,
            feature_amp_lr_init=opt.feature_amp_lr_init,
            feature_amp_lr_final=opt.feature_amp_lr_final,
            opacity_lr=opt.opacity_lr,
            scaling_lr=opt.scaling_lr,
            rotation_lr=opt.rotation_lr,
            phase_offset_lr=opt.phase_offset_lr,
            dc_offset_lr=opt.dc_offset_lr,
            optimize_offset_start=opt.optimize_offset_start,
            deform_lr_init=opt.deform_lr_init,
            deform_lr_final=opt.deform_lr_final,
            warm_up=opt.warm_up,
            weights=LossWeights(
                color=lambda_color, tof=opt.lambda_tof,
                dssim=opt.lambda_dssim, depth=opt.lambda_depth,
                dd=opt.lambda_dd, flow=opt.lambda_flow, oe=opt.lambda_oe,
                scale=opt.lambda_scale, mlp_reg=opt.lambda_mlp_reg,
            ),
            opacity_reset_interval=opacity_reset_interval,
            densify_until_iter=opt.densify_until_iter,
            tof_iters=opt.tof_iters,
            dd_window=(opt.dd_loss_iter_start, opt.dd_loss_iter_end),
            oe_window=(opt.oe_loss_iter_start, opt.oe_loss_iter_end),
            scale_window=(opt.scale_loss_iter_start, opt.scale_loss_iter_end),
            flow_start=opt.flow_loss_iter_start,
        )


def _weights_at(static: "StepStatic", it) -> LossWeights:
    """Effective loss weights at iteration ``it``, computed in-jit so
    window boundaries and the tof_iters color flip do not recompile the
    step (each phase recompile costs minutes through the TPU tunnel).
    Gated terms run with weight 0.0 outside their window — they are all
    cheap relative to one rasterization."""
    s = static.sched
    w = s.weights

    def window(bounds, lam):
        b, e = bounds
        if lam == 0.0 or e <= b + 1:
            return 0.0
        return jnp.where((b < it) & (it < e), lam, 0.0)

    color = w.color
    if s.tof_iters > 0:
        color = jnp.where(it > s.tof_iters, 1.0, w.color)
    scale = window(s.scale_window, w.scale)
    if w.scale != 0.0:
        scale = jnp.where(it > s.warm_up, scale, 0.0)
    flow = w.flow
    if w.flow != 0.0 and s.flow_start > 0:
        flow = jnp.where(it > s.flow_start, w.flow, 0.0)
    return w._replace(
        color=color,
        dd=window(s.dd_window, w.dd),
        oe=window(s.oe_window, w.oe),
        scale=scale,
        flow=flow,
    )


def _expon_lr(it_f, lr_init: float, lr_final: float, max_steps: int):
    """In-jit log-lerp schedule (general_utils.py:41-75, delay_steps=0)."""
    import math

    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.float32(0.0)
    ms = max_steps if max_steps != 0 else 1
    t = jnp.clip(it_f / ms, 0.0, 1.0)
    log_lerp = jnp.exp(
        math.log(max(lr_init, 1e-38)) * (1.0 - t)
        + math.log(max(lr_final, 1e-38)) * t
    )
    return jnp.where(it_f < 0, 0.0, log_lerp)


def _gaussian_lrs_at(static: "StepStatic", it) -> GaussianParams:
    """Per-leaf lrs as a GaussianParams pytree (training_setup /
    update_learning_rate, gaussian_model.py:247-313)."""
    s = static.sched
    ext = static.scene_extent
    it_f = jnp.float32(it)
    xyz_lr = _expon_lr(it_f, s.position_lr_init * ext,
                       s.position_lr_final * ext, s.position_lr_max_steps)
    phase_lr = _expon_lr(it_f, s.feature_phase_lr_init * ext,
                         s.feature_phase_lr_final * ext,
                         s.position_lr_max_steps)
    amp_lr = _expon_lr(it_f, s.feature_amp_lr_init * ext * ext,
                       s.feature_amp_lr_final, s.position_lr_max_steps)
    m = (static.config_color.sh_degree + 1) ** 2
    color_lr = jnp.full((m, 1), s.feature_lr / 20.0,
                        jnp.float32).at[0, 0].set(s.feature_lr)
    off_on = it > s.optimize_offset_start
    return GaussianParams(
        xyz=xyz_lr,
        sh_color=color_lr,
        sh_phase=phase_lr,
        sh_amp=amp_lr,
        scaling=jnp.float32(s.scaling_lr),
        rotation=jnp.float32(
            0.0 if static.deform.isotropic else s.rotation_lr
        ),
        opacity=jnp.float32(s.opacity_lr),
        seg_color=jnp.float32(0.0),
        phase_offset=jnp.where(off_on, s.phase_offset_lr, 0.0),
        dc_offset=jnp.where(off_on, s.dc_offset_lr, 0.0),
    )


def _deform_lr_at(static: "StepStatic", it):
    """Deform schedule stepped with (it - warm_up) (train.py:147)."""
    s = static.sched
    return _expon_lr(
        jnp.float32(it - s.warm_up), s.deform_lr_init, s.deform_lr_final,
        s.position_lr_max_steps - s.warm_up,
    )


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
    # Deform-time sync window (train.py:168: `fid % 4 == 0 or iteration <=
    # opt.optimize_sync_iters`): unlike the quad-loss sync branch this one
    # is NOT gated on use_quad/warm_up.
    deform_sync: bool = False
    # Whether THIS step's camera is an integration frame (fid % 4 == 0,
    # the only frames the reference's flow supervision touches,
    # train.py:243-261). The host knows the picked camera, so the
    # single-camera Trainer sets this statically: non-flow steps drop
    # the flow channels/loss entirely and flow steps run the branch
    # inline — no lax.cond (whose branch-boundary buffer copies cost
    # ~6 ms/step, round-5 profile). None = gate at runtime (DP batches
    # mix flow/non-flow frames; eval paths don't compute flow at all).
    flow_frame: Optional[bool] = None
    # The Trainer maintains the [dynamic+alive | static+alive | dead]
    # row layout (models.gaussians.sort_layout, re-sorted at every
    # densify/prune/restore event). When set, the render and deform
    # compactions become static slices + zero-pads instead of
    # gather/scatter pairs — the capacity-linear gathers and their
    # backward scatter-adds were the dominant step cost at 100k points
    # (round-5 profile). Off (default) = the order-independent gather
    # path (direct train_step users, unsorted states).
    compact_layout: bool = False
    # iteration >= densify_until_iter: the reference never calls
    # gaussians.optimizer.step() again (train.py:469-470) and stops
    # densification stats (train.py:441). Static so XLA drops the whole
    # per-Gaussian backward + Adam from the post-freeze program.
    frozen_gauss: bool = False
    # Schedule constants (lrs, lambdas, pause windows) evaluated in-jit.
    sched: SchedStatic = SchedStatic()
    # Device mesh (data, shard) for multi-chip training; None or 1x1 =
    # single device. 'data' batches training cameras (DP — grads averaged
    # across slices), 'shard' splits each render's primitives + tile rows
    # (TP/SP analog, parallel/sharded.py) and row-shards the deform MLP.
    mesh_shape: Optional[Tuple[int, int]] = None
    # Dynamic-compaction bucket for the deform MLP (0 = evaluate all
    # capacity slots). Host-tracked: next pow2 >= dynamic+alive count,
    # recomputed at densify/prune events (count is constant in between).
    deform_bucket: int = 0
    # Alive-compaction bucket for the render path (0 = preprocess all
    # capacity slots). Host-tracked next pow2 >= alive count: the
    # rendered (included) rows are gathered into a (B,) bucket before
    # rasterization so per-Gaussian preprocess/packing cost scales with
    # the live point count instead of the capacity (which carries up to
    # 2x headroom for densification between growth replays).
    render_bucket: int = 0
    # Trust region on the deformation (0 = off): per-point ||d_xyz|| is
    # clamped to deform_clip * scene_extent. No reference counterpart —
    # a stability guard against the bistable failure mode where the MLP
    # blows up early and evacuates every dynamic Gaussian from the
    # frustum (no recovery gradient once nothing rasterizes). The clamp
    # is inactive for a healthy run: converged |d_xyz| is a small
    # fraction of the scene extent, so a generous radius (default 0.5)
    # only engages during a divergence transient.
    deform_clip: float = 0.0


class StepAux(NamedTuple):
    """Small per-camera outputs carried out of the loss computation (the
    full rendered images stay internal to the grad program)."""

    metrics: dict  # name -> () f32
    radii: jnp.ndarray  # (P,) int32 tof-camera screen radii
    pixels: jnp.ndarray  # (P,) touched-pixel counts
    # Buffer diagnostics, combined over BOTH renders (tof and, when the
    # cameras differ, color — either can overflow independently):
    num_rendered: jnp.ndarray  # () int32 max over renders of the
    #   capacity-sizing basis (rendered_worst: worst-shard need in
    #   global dup_factor units; == num_rendered single-device)
    dup_overflow: jnp.ndarray  # () int32 (0/1)
    tile_overflow: jnp.ndarray  # () int32
    tile_max: jnp.ndarray  # () int32 deepest tile across renders


def _sharded_render(axis_name: str):
    """rasterize()-shaped wrapper over the multi-device rasterizer (must
    be called inside a shard_map context over `axis_name`)."""

    def render(means3d, scales, rotations, opacities, shs, shs_p,
               phase_offset, dc_offset, means2d_ndc, bg_map, *,
               camera, config, active_sh_degree=3, colors_precomp=None,
               flow_precomp=None):
        return rasterize_sharded(
            means3d, scales, rotations, opacities, shs, shs_p,
            phase_offset, dc_offset, means2d_ndc, bg_map,
            camera=camera, config=config, axis_name=axis_name,
            active_sh_degree=active_sh_degree, colors_precomp=colors_precomp,
            flow_precomp=flow_precomp,
        )

    return render


def _apply_deform_rows(deform_params, config, xyz_n, t, shard_axis,
                       x_emb=None):
    """Deform MLP over the primitive rows, optionally split across the
    shard axis (each device evaluates N/n rows, results all-gathered;
    the gather's transpose psums the MLP gradient contributions)."""
    if shard_axis is None:
        return apply_deform(deform_params, config, xyz_n, t, x_emb=x_emb)
    n = xyz_n.shape[0]
    n_dev = jax.lax.axis_size(shard_axis)
    per = -(-n // n_dev)
    start = jax.lax.axis_index(shard_axis) * per

    def slice_rows(x):
        pad = per * n_dev - x.shape[0]
        xp = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return jax.lax.dynamic_slice_in_dim(xp, start, per, axis=0)

    d_local = apply_deform(
        deform_params, config, slice_rows(xyz_n), slice_rows(t),
        x_emb=None if x_emb is None else slice_rows(x_emb),
    )
    return jax.tree.map(
        lambda x: jax.lax.all_gather(x, shard_axis, axis=0, tiled=True)[:n],
        d_local,
    )


def _deform_slots(static: StepStatic, params, alive):
    """Dynamic-compacted MLP input rows.

    The reference evaluates the deform MLP only on the dynamic subset
    (gaussian_model.py:170-174); evaluating all capacity slots costs
    2-3x the live count. With ``static.deform_bucket`` (host-tracked
    next-pow2 of the dynamic count — constant between densify events)
    we gather the dynamic+alive rows into a (B,) bucket, run the MLP
    there, and scatter back with OOB padding indices dropped.

    Returns (xyz_n_rows, expand) where expand maps (B, ...) -> (N, ...)
    with zeros on non-dynamic slots (identity when compaction is off).
    """
    xyz_n = jax.lax.stop_gradient(params.xyz) / static.scene_extent
    n = xyz_n.shape[0]
    b = static.deform_bucket
    if not b or b >= n or alive is None:
        return xyz_n, (lambda d: d)
    mask = get_motion_mask(params) & alive
    if static.compact_layout:
        # Sorted layout: the dynamic+alive rows are exactly [0, n_dyn)
        # with n_dyn <= b, so the bucket is a static slice. Rows in
        # [n_dyn, b) are static/dead — the MLP evaluates them (same
        # wasted-lane budget as the gather path's fill rows) and the
        # mask select below zeroes their outputs, which the gather
        # path's scatter achieved by never writing them.
        rows = xyz_n[:b]

        def expand(d_b):
            out = jnp.concatenate([
                d_b, jnp.zeros((n - b,) + d_b.shape[1:], d_b.dtype)
            ])
            keep = mask.reshape((n,) + (1,) * (d_b.ndim - 1))
            return jnp.where(keep, out, 0.0)

        return rows, expand
    (idx,) = jnp.where(mask, size=b, fill_value=n)
    rows = xyz_n[jnp.minimum(idx, n - 1)]

    def expand(d_b):
        return (
            jnp.zeros((n,) + d_b.shape[1:], d_b.dtype)
            .at[idx].set(d_b, mode="drop")
        )

    return rows, expand


def _query_deform(static: StepStatic, deform_params, params, fid,
                  shard_axis=None, alive=None):
    """d_xyz for every point (masked to dynamic by callers); mirrors
    query_dmlp + the F-ToRF interpolation (train.py:164-177)."""
    xyz_n, expand = _deform_slots(static, params, alive)
    denom = max(static.total_num_views - 1, 1)

    def clip_dxyz(d):
        # Trust region (StepStatic.deform_clip): norm-clamp d_xyz. Each
        # MLP sample is clamped independently; the ftorf lerp below is a
        # convex combination (0.25*(frac_next+frac_curr) == 1), so the
        # interpolated d_xyz stays inside the ball too.
        if static.deform_clip <= 0.0:
            return d
        max_norm = static.deform_clip * static.scene_extent
        n = jnp.linalg.norm(d, axis=-1, keepdims=True)
        return d * jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-12))

    def q(t_scalar):
        t = jnp.broadcast_to(t_scalar, (xyz_n.shape[0], 1))
        d = _apply_deform_rows(
            deform_params, static.deform, xyz_n, t, shard_axis
        )
        d = (clip_dxyz(d[0]),) + tuple(d[1:])
        return tuple(expand(x) for x in d)

    if static.scene_type == "torf":
        d_xyz, d_rot, d_sh, d_sh_p = q(fid.astype(jnp.float32) / denom)
        return d_xyz, d_rot, d_sh, d_sh_p, d_xyz, d_xyz
    # ftorf: lerp between the neighboring integration (multiple-of-4)
    # frames. The reference keeps ONLY d_xyz here — d_rot/d_sh/d_sh_p stay
    # 0.0 (train.py:171: `d_xyz_curr, _, _, _ = query_dmlp(...)`), so the
    # SH color-delta heads must not leak into the ftorf color path.
    # The two time samples ride ONE stacked MLP call (2B rows): same
    # math, twice the matmul row count per dispatch — the (B, 256)
    # blocks are otherwise too short to fill the MXU, and the stacked
    # form halves the per-layer dispatch count in both fwd and bwd.
    curr = (fid // 4) * 4
    nxt = curr + 4
    b = xyz_n.shape[0]
    t2 = jnp.concatenate([
        jnp.broadcast_to(curr.astype(jnp.float32) / denom, (b, 1)),
        jnp.broadcast_to(nxt.astype(jnp.float32) / denom, (b, 1)),
    ])
    # Both time samples share the points: embed xyz once and duplicate
    # the 63-wide sin/cos block instead of recomputing it (and its
    # backward) per sample.
    from gftorf_tpu.models.deform import embed_xyz
    x_emb1 = embed_xyz(static.deform, xyz_n)
    d2, _, _, _ = _apply_deform_rows(
        deform_params, static.deform,
        jnp.concatenate([xyz_n, xyz_n]), t2, shard_axis,
        x_emb=jnp.concatenate([x_emb1, x_emb1]),
    )
    d_curr = expand(clip_dxyz(d2[:b]))
    d_next = expand(clip_dxyz(d2[b:]))
    if static.deform_sync:
        d_xyz = d_curr
    else:
        frac_next = (fid - curr).astype(jnp.float32)
        frac_curr = (nxt - fid).astype(jnp.float32)
        lerp = 0.25 * (frac_next * d_next + frac_curr * d_curr)
        d_xyz = jnp.where(fid % 4 == 0, d_curr, lerp)
    n = d_xyz.shape[0]
    m = (static.deform.sh_degree + 1) ** 2
    d_rot = jnp.zeros((n, 4), d_xyz.dtype)
    d_sh = jnp.zeros((n, m, 3), d_xyz.dtype)
    d_sh_p = jnp.zeros((n, m, 2), d_xyz.dtype)
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


def _select_tof(static: StepStatic, phasor, frame):
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
    frames: FrameData,  # whole stacked dataset (resident on device)
    idx,  # () or (data,) int32 indices into frames
    it,  # () int32 iteration (1-based)
    base_key: jnp.ndarray,
):
    """One fused training iteration, single-device or over a device mesh.

    The only per-call host->device traffic is the camera indices and the
    iteration scalar; the frame gather, RNG fold, lr/weight schedules and
    the pause gating all happen on device (the tunnel runtime charges a
    multi-ms round trip per transfer, so per-iteration scalar plumbing
    dominated the step time before this).

    With ``static.mesh_shape=(data, shard)`` the loss is evaluated under
    shard_map: each data slice trains its own camera (idx carries `data`
    indices) with primitives/tiles/deform-MLP rows split over the shard
    axis; taking jax.grad *outside* the shard_map lets the collective
    transposes produce the psum'd parameter gradients (the configuration
    validated against single-device in tests/test_sharded.py).
    """
    params, aux, adam = model
    n_points = params.xyz.shape[0]
    idxs = jnp.atleast_1d(jnp.asarray(idx, jnp.int32))

    key = jax.random.fold_in(base_key, it)
    weights = _weights_at(static, it)
    lrs = _gaussian_lrs_at(static, it)
    deform_lr = _deform_lr_at(static, it)
    # Deform pause for 200 iters after each opacity reset
    # (train.py:471-472) — a skipped step, not an lr of zero. The reset
    # interval halves after tof_iters (train.py:478) — traced, like the
    # host-side reset cadence in train/loop.py, so the flip does not
    # recompile the step.
    s = static.sched
    reset_interval = jnp.int32(s.opacity_reset_interval)
    if s.tof_iters > 0:
        reset_interval = jnp.where(
            it > s.tof_iters, reset_interval // 2, reset_interval
        )
    deform_step_on = (
        (it % reset_interval > 200)
        | (it >= s.densify_until_iter)
    ).astype(jnp.float32)

    hc, wc = static.config_color.height, static.config_color.width
    ht, wt = static.config_tof.height, static.config_tof.width

    def per_frame(p, dfp, means2d_zero, idx_local, key_local, render,
                  shard_axis):
        frame = jax.tree.map(lambda a: a[idx_local], frames)
        phase_off_cam = frame.phase_offset
        dc_off_cam = frame.dc_offset

        # --- Background maps (train.py:122-128). Separate keys per
        # camera size; identical map when sizes match (like the
        # reference).
        if static.random_bg:
            bg_tof = jax.random.uniform(
                key_local, (7, ht, wt), minval=-1.0, maxval=1.0
            )
            bg_color_map = (
                bg_tof
                if (hc, wc) == (ht, wt)
                else jax.random.uniform(
                    jax.random.fold_in(key_local, 1), (7, hc, wc),
                    minval=-1.0, maxval=1.0,
                )
            )
        else:
            const = jnp.asarray(static.bg_color, jnp.float32)
            bg_tof = jnp.broadcast_to(const[:, None, None], (7, ht, wt))
            bg_color_map = jnp.broadcast_to(const[:, None, None], (7, hc, wc))
        if static.dynamic_on:
            d_xyz, d_rot, d_sh, d_sh_p, d_curr, d_next = _query_deform(
                static, dfp, p, frame.frame_id, shard_axis, aux.alive
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

        # 3D scene-flow vectors, fused into the main ToF rasterization as
        # extra channels with DETACHED alpha*T weights instead of the
        # reference's two extra render_flow rasterizations
        # (train.py:243-261; gaussian_renderer/__init__.py:141-204).
        # Exactness: the flow loss fires only on integration frames
        # (frame_id % 4 == 0), where _query_deform picks d_xyz = d_curr —
        # the main render's geometry IS the reference flow pass's
        # detached geometry `xyz + d_curr`; same weights, same depth
        # order, zero background.
        if static.flow_on and static.dynamic_on:
            def flow_vectors(_):
                denom = max(static.total_num_views - 1, 1)
                prev_t = (
                    (frame.frame_id // 4) * 4 - 4
                ).astype(jnp.float32) / denom
                rows, expand = _deform_slots(static, p, aux.alive)
                d_prev_b, _, _, _ = _apply_deform_rows(
                    dfp, static.deform, rows,
                    jnp.broadcast_to(prev_t, (rows.shape[0], 1)), shard_axis,
                )
                d_prev = expand(d_prev_b)
                motion = get_motion_mask(p)[:, None]
                return jnp.where(
                    motion,
                    jnp.concatenate([d_next - d_xyz, d_prev - d_xyz], -1),
                    0.0,
                )

            if static.flow_frame is None:
                # DP batch: frames in the batch may differ in
                # flow-frame-ness — gate at runtime. The conditional's
                # branch-boundary buffer copies cost ~6 ms/step
                # (round-5 profile), which is why the single-camera
                # path makes this static instead.
                flow_precomp = jax.lax.cond(
                    frame.frame_id % 4 == 0,
                    flow_vectors,
                    lambda _: jnp.zeros((n_points, 6)),
                    operand=None,
                )
            elif static.flow_frame:
                flow_precomp = flow_vectors(None)
            else:
                # Statically not an integration frame: skip the flow
                # channels entirely (no extra deform eval, no fused
                # flow columns in the compositor, no flow loss) — the
                # reference's render_flow only ever runs on fid%4==0
                # frames (train.py:243-261).
                flow_precomp = None
        else:
            flow_precomp = None

        # Alive compaction: gather the included rows into a (B,) bucket
        # so preprocess/packing scale with the live count, not capacity.
        # Fill rows duplicate slot n-1 with opacity forced to 0 — the
        # zero-opacity cull in preprocess drops them from binning, their
        # compositing weights are exactly 0, and the means2d_zero take
        # transposes scatter-add exact zeros back to the duplicated slot,
        # so outputs, gradients and densify stats are bit-compatible
        # with the uncompacted program.
        compact_overflow = jnp.int32(0)
        if (static.render_bucket and static.render_bucket < n_points
                and static.compact_layout):
            # Sorted layout (StepStatic.compact_layout): alive rows are
            # exactly [0, n_alive) with n_alive <= bucket, so the
            # compaction is a static slice — no gather, and its
            # backward is a zero-pad instead of a scatter-add. Rows in
            # [n_alive, B) are dead/excluded: opac_inc is 0 there, the
            # zero-opacity cull keeps them out of binning, and rexpand
            # pads exact zeros — the same bit-compat argument as the
            # gather path's fill rows. Included rows beyond the slice
            # (layout violation or stale bucket) are counted as
            # compact_overflow, which the Trainer turns into a hard
            # error.
            B = static.render_bucket
            compact_overflow = (
                jnp.sum(include) - jnp.sum(include[:B])
            ).astype(jnp.int32)

            def rgather(x):
                return x[:B]

            r_means3d, r_scales, r_rots = map(rgather, (means3d, scales, rots))
            r_opac = rgather(opac_inc)
            r_shs, r_shs_p = rgather(shs), rgather(shs_p)
            r_means2d = rgather(means2d_zero)
            r_flow = None if flow_precomp is None else rgather(flow_precomp)

            def rexpand(v):  # per-Gaussian render outputs -> capacity rows
                return jnp.concatenate([
                    v, jnp.zeros((n_points - B,) + v.shape[1:], v.dtype)
                ])
        elif static.render_bucket and static.render_bucket < n_points:
            (rend_rows,) = jnp.where(
                include, size=static.render_bucket, fill_value=n_points
            )
            # Invariant: the Trainer sizes the bucket from the alive
            # count ⊇ include at every densify/prune/restore event. A
            # nonzero value here means jnp.where silently truncated
            # rows — the Trainer turns it into a hard error.
            compact_overflow = (
                jnp.sum(include) - static.render_bucket
            ).clip(0).astype(jnp.int32)
            safe = jnp.minimum(rend_rows, n_points - 1)
            row_ok = rend_rows < n_points

            def rgather(x):
                return jnp.take(x, safe, axis=0)

            r_means3d, r_scales, r_rots = map(rgather, (means3d, scales, rots))
            r_opac = jnp.where(row_ok, rgather(opac_inc), 0.0)
            r_shs, r_shs_p = rgather(shs), rgather(shs_p)
            r_means2d = rgather(means2d_zero)
            r_flow = None if flow_precomp is None else rgather(flow_precomp)

            def rexpand(v):  # per-Gaussian render outputs -> capacity rows
                return (
                    jnp.zeros((n_points,) + v.shape[1:], v.dtype)
                    .at[rend_rows].set(v, mode="drop")
                )
        else:
            r_means3d, r_scales, r_rots = means3d, scales, rots
            r_opac, r_shs, r_shs_p = opac_inc, shs, shs_p
            r_means2d, r_flow = means2d_zero, flow_precomp
            rexpand = lambda v: v  # noqa: E731

        out_tof = render(
            r_means3d, r_scales, r_rots, r_opac, r_shs, r_shs_p,
            phase_offset, dc_offset, r_means2d, bg_tof,
            camera=frame.cam_tof, config=static.config_tof,
            active_sh_degree=static.active_sh_degree,
            flow_precomp=r_flow,
        )
        if static.single_camera:
            out_color = out_tof
        else:
            out_color = render(
                r_means3d, r_scales, r_rots, r_opac, r_shs, r_shs_p,
                phase_offset, dc_offset, r_means2d, bg_color_map,
                camera=frame.cam_color, config=static.config_color,
                active_sh_degree=static.active_sh_degree,
            )
        radii_full = rexpand(out_tof.radii)
        pixels_full = rexpand(out_tof.pixels[:, 0])
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
            tof_rendered, tof_gt = _select_tof(static, phasor, frame)
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

        # Deformation regularizer (train.py:239-240): |d_xyz|.mean() over
        # the dynamic subset. Pruned slots keep stale seg/xyz, so the mask
        # must include aux.alive (the reference's tensors only ever hold
        # live points).
        if static.mlp_reg_on and static.dynamic_on:
            motion = get_motion_mask(p) & aux.alive
            reg = jnp.sum(jnp.abs(d_xyz) * motion[:, None]) / (
                3.0 * jnp.maximum(jnp.sum(motion), 1)
            )
            total += weights.mlp_reg * reg

        # Flow loss (train.py:243-261) on integration frames only, from
        # the fused flow channels of the main ToF rasterization.
        if (static.flow_on and static.dynamic_on
                and static.flow_frame is not False):
            def flow_branch(_):
                k_tof = frame.intrinsics_tof
                view_tof = frame.cam_tof.viewmatrix
                pts3d = distance_to_points3d(
                    jax.lax.stop_gradient(depth), view_tof,
                    k_tof[0, 0], k_tof[1, 1], k_tof[0, 2], k_tof[1, 2],
                )
                pts2d = project_points(pts3d, view_tof, k_tof)
                fwd2d = project_flow(
                    pts2d, pts3d, out_tof.flow[0:3], view_tof, k_tof
                )
                f_l2 = jnp.where(
                    frame.has_forward_flow,
                    jnp.mean(jnp.square(fwd2d - frame.forward_flow)),
                    0.0,
                )
                bwd2d = project_flow(
                    pts2d, pts3d, out_tof.flow[3:6], view_tof, k_tof
                )
                b_l2 = jnp.where(
                    frame.has_backward_flow,
                    jnp.mean(jnp.square(bwd2d - frame.backward_flow)),
                    0.0,
                )
                return f_l2, b_l2

            if static.flow_frame is None:
                f_l2, b_l2 = jax.lax.cond(
                    frame.frame_id % 4 == 0,
                    flow_branch,
                    lambda _: (jnp.float32(0.0), jnp.float32(0.0)),
                    operand=None,
                )
            else:  # statically an integration frame (True handled here;
                # False skipped this whole block above)
                f_l2, b_l2 = flow_branch(None)
            total += weights.flow * (f_l2 + b_l2)
            # flow fires before its weight window opens (the gate is a
            # traced weight, not a recompile) — keep the log clean.
            metrics["flow_l2"] = jnp.where(
                jnp.asarray(weights.flow) > 0, f_l2 + b_l2, 0.0
            )

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

        # Scale regularizer on visible gaussians (train.py:275-277).
        # The zero-opacity cull already zeroes radii for excluded/pruned
        # rows; `& include` is kept as defense in depth (it also guards
        # the uncompacted path against future cull changes).
        if static.scale_on:
            vis = (radii_full > 0) & include
            s = get_scaling(p)
            per = jnp.mean(s, axis=-1) ** 2
            total += weights.scale * jnp.sum(per * vis) / jnp.maximum(
                jnp.sum(vis), 1
            )

        metrics["loss"] = total
        metrics["compact_overflow"] = compact_overflow
        # Combine buffer diagnostics over both renders — but only when
        # the color render is live in the loss graph. When color_on and
        # depth_on are both off its image is unused and XLA DCEs the
        # whole second rasterization; consuming its diagnostics here
        # would silently resurrect it.
        color_live = (not static.single_camera
                      and (static.color_on or static.depth_on))
        def worst(o):
            return o.num_rendered if o.rendered_worst is None \
                else o.rendered_worst

        if color_live:
            num_rend = jnp.maximum(worst(out_tof), worst(out_color))
            dup_ovf = jnp.maximum(out_tof.dup_overflow.astype(jnp.int32),
                                  out_color.dup_overflow.astype(jnp.int32))
            tile_ovf = jnp.maximum(out_tof.tile_overflow,
                                   out_color.tile_overflow)
            tile_max = jnp.maximum(out_tof.tile_max, out_color.tile_max)
        else:
            num_rend = worst(out_tof)
            dup_ovf = out_tof.dup_overflow.astype(jnp.int32)
            tile_ovf = out_tof.tile_overflow
            tile_max = out_tof.tile_max
        aux_out = StepAux(
            metrics=metrics,
            radii=radii_full,
            pixels=pixels_full,
            num_rendered=num_rend,
            dup_overflow=dup_ovf,
            tile_overflow=tile_ovf,
            tile_max=tile_max,
        )
        return total, aux_out

    # --- Wire per_frame into a (possibly shard_mapped) loss function.
    # aux leaves get a leading per-camera axis in both modes so the
    # reductions below are mode-independent.
    mesh_shape = static.mesh_shape
    sharded = mesh_shape is not None and mesh_shape[0] * mesh_shape[1] > 1
    if not sharded:

        def loss_fn(p, dfp, means2d_zero, idxs_arr):
            total, aux_out = per_frame(
                p, dfp, means2d_zero, idxs_arr[0], key, rasterize, None
            )
            return total, jax.tree.map(lambda x: jnp.asarray(x)[None], aux_out)

    else:
        data_ax, shard_ax = mesh_shape
        mesh = cached_mesh(data_ax, shard_ax)
        render = _sharded_render("shard")

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), P(), P("data")),
            out_specs=(P(), P("data")),
            check_vma=False,
        )
        def loss_fn(p, dfp, means2d_zero, idxs_arr):
            k = key
            if data_ax > 1:
                # distinct random bg per data slice; data_ax == 1 keeps
                # single-device numerics bit-identical
                k = jax.random.fold_in(k, jax.lax.axis_index("data"))
            total, aux_out = per_frame(
                p, dfp, means2d_zero, idxs_arr[0], k, render, "shard"
            )
            if data_ax > 1:
                total = jax.lax.pmean(total, "data")
            return total, jax.tree.map(lambda x: jnp.asarray(x)[None], aux_out)

    means2d_zero = jnp.zeros((n_points, 2))
    if static.frozen_gauss:
        # Post-densify_until_iter: the reference never steps the gaussian
        # optimizer or accumulates densification stats again
        # (train.py:441,469-470) — differentiate w.r.t. the deform MLP
        # only and let XLA drop the per-Gaussian backward entirely.
        grad_fn = jax.grad(loss_fn, argnums=1, has_aux=True)
        g_deform, sa = grad_fn(params, deform_params, means2d_zero, idxs)
        new_params, new_adam, new_aux = params, adam, aux
    else:
        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (g_params, g_deform, g_means2d), sa = grad_fn(
            params, deform_params, means2d_zero, idxs
        )

    # Per-camera reductions (leading axis = data slices; size 1 when
    # single-device). Radii: visible in ANY camera; pixels/NDC-grads:
    # summed over cameras — the batched generalization of the
    # reference's one-camera-per-iter accumulation (train.py:443-449).
    radii = jnp.max(sa.radii, axis=0)
    pixels = jnp.sum(sa.pixels, axis=0)
    metrics = {name: jnp.mean(v) for name, v in sa.metrics.items()}

    if not static.frozen_gauss:
        # --- Densification stats (train.py:441-449)
        motion = get_motion_mask(params)
        if tuple(static.render_regions) == ("static",):
            apply_mask = ~motion
        elif tuple(static.render_regions) == ("dynamic",):
            apply_mask = motion
        else:
            apply_mask = None
        new_aux = add_densification_stats(
            aux, g_means2d, radii, pixels, apply_mask
        )

        # --- Optimizers (train.py:467-474). Dead capacity slots must
        # receive exactly-zero gradients (belt to the safe-normalize
        # suspenders: any NaN there would poison Adam moments and, via the
        # deform MLP's full-capacity input, the whole model).
        def mask_dead(g):
            if g.ndim >= 1 and g.shape[0] == n_points:
                return jnp.where(
                    aux.alive.reshape((n_points,) + (1,) * (g.ndim - 1)),
                    g, jnp.zeros_like(g),
                )
            return g

        g_params = jax.tree.map(mask_dead, g_params)
        new_params, new_adam = adam_update(params, g_params, adam, lrs)

    g_deform = clip_by_global_norm(g_deform, 1.0)
    d_lr = jax.tree.map(lambda _: deform_lr, deform_params)
    new_deform, new_deform_adam = adam_update(
        deform_params, g_deform, deform_adam, d_lr, on=deform_step_on
    )

    metrics["num_rendered"] = jnp.sum(sa.num_rendered)
    metrics["dup_overflow"] = jnp.max(sa.dup_overflow.astype(jnp.int32))
    metrics["tile_overflow"] = jnp.max(sa.tile_overflow)
    metrics["visible"] = jnp.sum(radii > 0)
    metrics["num_points"] = jnp.sum(aux.alive)
    # Occupancy high-water marks for the Trainer's adaptive capacity
    # tracking (max over data slices — every slice renders with the same
    # static buffers, so sizing must cover the worst one).
    metrics["tile_max"] = jnp.max(sa.tile_max)
    metrics["rendered_max"] = jnp.max(sa.num_rendered)

    new_model = GaussianModelState(new_params, new_aux, new_adam)
    # One packed f32 vector -> a single device->host transfer per step
    # when the host drains metrics (vs ~10 scalar fetches).
    packed = jnp.stack([
        jnp.asarray(metrics.get(k, jnp.float32(0.0)), jnp.float32)
        for k in METRIC_NAMES
    ])
    return new_model, new_deform, new_deform_adam, packed
