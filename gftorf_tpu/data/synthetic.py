"""Synthetic random scenes for tests and benchmarks."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gftorf_tpu.ops.transforms import focal2fov, projection_matrix, world_to_view
from gftorf_tpu.render.settings import CameraSpec, RasterConfig


class SyntheticScene(NamedTuple):
    means3d: jnp.ndarray
    scales: jnp.ndarray
    rotations: jnp.ndarray
    opacities: jnp.ndarray
    shs: jnp.ndarray
    shs_p: jnp.ndarray
    phase_offset: jnp.ndarray
    dc_offset: jnp.ndarray
    camera: CameraSpec
    config: RasterConfig


def make_scene(
    key,
    num_points: int = 256,
    width: int = 48,
    height: int = 32,
    sh_degree: int = 3,
    depth_range: float = 10.0,
    znear: float = 0.1,
    zfar: float = 50.0,
    scale_range=(0.02, 0.15),
    use_view_dependent_phase: bool = False,
    max_per_tile: int = 2048,
    isotropic: bool = False,
    dup_factor: int = 12,
) -> SyntheticScene:
    ks = jax.random.split(key, 8)
    m = (sh_degree + 1) ** 2

    # Points spread inside the camera frustum, z in [1, 8].
    z = jax.random.uniform(ks[0], (num_points,), minval=1.0, maxval=8.0)
    x = jax.random.uniform(ks[1], (num_points,), minval=-0.45, maxval=0.45) * z
    y = jax.random.uniform(ks[2], (num_points,), minval=-0.35, maxval=0.35) * z
    means3d = jnp.stack([x, y, z], -1)

    scales = jax.random.uniform(
        ks[3], (num_points, 3), minval=scale_range[0], maxval=scale_range[1]
    )
    if isotropic:
        scales = jnp.repeat(scales[:, :1], 3, axis=1)
    quat = jax.random.normal(ks[4], (num_points, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[5], (num_points,), minval=0.2, maxval=0.95)

    shs = 0.3 * jax.random.normal(ks[6], (num_points, m, 3))
    shs_p = 0.2 * jax.random.normal(ks[7], (num_points, m, 2))
    # Keep amplitudes positive-ish via a DC bump.
    shs_p = shs_p.at[:, 0, 1].add(1.0)

    fov_x, fov_y = 0.9, 0.7
    view_t = world_to_view(np.eye(3), np.zeros(3))
    proj_t = projection_matrix(znear, zfar, fov_x, fov_y)
    camera = CameraSpec.create(
        view_t, proj_t, width, height, fov_x, fov_y, znear, zfar, depth_range
    )
    config = RasterConfig(
        height=height,
        width=width,
        sh_degree=sh_degree,
        max_per_tile=max_per_tile,
        use_view_dependent_phase=use_view_dependent_phase,
        dup_factor=dup_factor,
    )
    return SyntheticScene(
        means3d=means3d,
        scales=scales,
        rotations=quat,
        opacities=opac,
        shs=shs,
        shs_p=shs_p,
        phase_offset=jnp.float32(0.05),
        dc_offset=jnp.float32(0.02),
        camera=camera,
        config=config,
    )
