"""Public renderer bridge: render / render_flow / render_eval.

API parity with the reference's gaussian_renderer/__init__.py (:19-300)
for users driving the rasterizer directly (the training step fuses these
internally for speed). Each function takes the functional state
(GaussianParams + optional deformation offsets) instead of a stateful
model object, and returns the same logical output dict.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from gftorf_tpu.models.gaussians import (
    GaussianParams,
    get_features_phasor,
    get_motion_mask,
    get_opacity,
    get_rotation,
    get_scaling,
)
from gftorf_tpu.render.rasterize import rasterize
from gftorf_tpu.render.settings import CameraSpec, RasterConfig


def _compose(params: GaussianParams, d_xyz, d_rot, d_sh, d_sh_p,
             render_regions: Sequence[str], alive=None):
    """Static/dynamic composition (gaussian_renderer/__init__.py:81-105)."""
    n = params.xyz.shape[0]
    motion = get_motion_mask(params)
    inc_static = "static" in render_regions
    inc_dynamic = "dynamic" in render_regions
    include = jnp.where(motion, inc_dynamic, inc_static)
    if alive is not None:
        include = include & alive

    m = motion[:, None]
    means3d = jnp.where(m, params.xyz + d_xyz, params.xyz)
    rotations = jnp.where(
        m, get_rotation(params._replace(rotation=params.rotation + d_rot)),
        get_rotation(params),
    )
    shs = jnp.where(motion[:, None, None], params.sh_color + d_sh,
                    params.sh_color)
    shs_p0 = get_features_phasor(params)
    shs_p = jnp.where(motion[:, None, None], shs_p0 + d_sh_p, shs_p0)
    opacity = jnp.where(include, get_opacity(params)[:, 0], 0.0)
    return means3d, get_scaling(params), rotations, opacity, shs, shs_p


def render(
    params: GaussianParams,
    d_xyz, d_rot, d_sh, d_sh_p,
    cam_color: CameraSpec, cam_tof: CameraSpec,
    config_color: RasterConfig, config_tof: RasterConfig,
    bg_map: jnp.ndarray,
    active_sh_degree: int = 3,
    render_regions: Sequence[str] = ("static", "dynamic"),
    optimize_phase_offset: bool = False,
    optimize_dc_offset: bool = False,
    cam_phase_offset=0.0,
    cam_dc_offset=0.0,
    alive=None,
):
    """Render both cameras; returns the reference's render() dict
    (gaussian_renderer/__init__.py:130-139)."""
    n = params.xyz.shape[0]
    means3d, scales, rots, opac, shs, shs_p = _compose(
        params, d_xyz, d_rot, d_sh, d_sh_p, render_regions, alive
    )
    phase_offset = (
        params.phase_offset[0] if optimize_phase_offset else cam_phase_offset
    )
    dc_offset = params.dc_offset[0] if optimize_dc_offset else cam_dc_offset
    means2d = jnp.zeros((n, 2))

    out_color = rasterize(
        means3d, scales, rots, opac, shs, shs_p, phase_offset, dc_offset,
        means2d, bg_map, camera=cam_color, config=config_color,
        active_sh_degree=active_sh_degree,
    )
    out_tof = rasterize(
        means3d, scales, rots, opac, shs, shs_p, phase_offset, dc_offset,
        means2d, bg_map, camera=cam_tof, config=config_tof,
        active_sh_degree=active_sh_degree,
    )
    return {
        "render": out_color.color,
        "render_phasor": out_tof.phasor,
        "render_depth": out_tof.depth,
        "render_depth_color": out_color.depth,
        "render_acc": out_tof.acc,
        "render_acc_color": out_color.acc,
        "depth_distortion": out_tof.depth_distortion,
        "depth_distortion_color": out_color.depth_distortion,
        "visibility_filter": out_tof.radii > 0,
        "radii": out_tof.radii,
        "distribution_tof": out_tof.distribution,
        "pixels": out_tof.pixels,
    }


def render_flow(
    params: GaussianParams,
    d_xyz, d_rot, flow3d,
    cam_tof: CameraSpec, config_tof: RasterConfig,
    active_sh_degree: int = 3,
    render_regions: Sequence[str] = ("static", "dynamic"),
    alive=None,
):
    """Splat 3D scene flow through the color channels with detached
    geometry (gaussian_renderer/__init__.py:141-204)."""
    n = params.xyz.shape[0]
    means3d, scales, rots, opac, _, _ = _compose(
        params, d_xyz, d_rot, jnp.zeros_like(params.sh_color),
        jnp.zeros((n,) + params.sh_phase.shape[1:] + (2,)),
        render_regions, alive,
    )
    motion = get_motion_mask(params)
    flow_masked = jnp.where(motion[:, None], flow3d, 0.0)
    h, w = config_tof.height, config_tof.width
    out = rasterize(
        jax.lax.stop_gradient(means3d),
        jax.lax.stop_gradient(scales),
        jax.lax.stop_gradient(rots),
        jax.lax.stop_gradient(opac),
        None, None, 0.0, 0.0, jnp.zeros((n, 2)), jnp.zeros((7, h, w)),
        camera=cam_tof, config=config_tof,
        active_sh_degree=active_sh_degree,
        colors_precomp=flow_masked,
    )
    return {"render_flow": out.color}


def render_eval(
    params: GaussianParams,
    d_xyz, d_rot, d_sh, d_sh_p,
    camera: CameraSpec, config: RasterConfig,
    bg_map: jnp.ndarray,
    active_sh_degree: int = 3,
    render_regions: Sequence[str] = ("static", "dynamic"),
    optimize_phase_offset: bool = False,
    optimize_dc_offset: bool = False,
    cam_phase_offset=0.0,
    cam_dc_offset=0.0,
    alive=None,
):
    """Single-camera evaluation render (gaussian_renderer/__init__.py:206-300)."""
    n = params.xyz.shape[0]
    means3d, scales, rots, opac, shs, shs_p = _compose(
        params, d_xyz, d_rot, d_sh, d_sh_p, render_regions, alive
    )
    phase_offset = (
        params.phase_offset[0] if optimize_phase_offset else cam_phase_offset
    )
    dc_offset = params.dc_offset[0] if optimize_dc_offset else cam_dc_offset
    out = rasterize(
        means3d, scales, rots, opac, shs, shs_p, phase_offset, dc_offset,
        jnp.zeros((n, 2)), bg_map, camera=camera, config=config,
        active_sh_degree=active_sh_degree,
    )
    return {
        "render": out.color,
        "render_phasor": out.phasor,
        "render_depth": out.depth,
        "render_acc": out.acc,
        "render_dd": out.depth_distortion,
        "distribution": out.distribution,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
    }
