"""Synthetic F-ToRF/ToRF dataset writer in the reference's on-disk layout.

Renders a procedurally-built Gaussian scene (optionally with a moving
cluster) through the rasterizer and writes the directory structure the
readers expect (dataset_readers.py:716-1003):

    color/0000.npy          (H, W, 3)
    tofType{0..3}/NNNN.npy  (H, W)      raw quads (one per frame slot)
    synthetic_tof/NNNN.npy  (H, W, 3)   real/imag/amp
    synthetic_depth/NNNN.npy(H, W)      distance to light
    forward_flow_2/flow_NNNN.npy (2, H, W)
    backward_flow_2/flow_NNNN.npy
    cams/{tof,color}_intrinsics.npy, {tof,color}_extrinsics.npy,
    cams/depth_range.npy, phase_offset.npy, dc_offset.npy

Used by tests and benchmarks; doubles as a ground-truth-known benchmark
scene (exact depth supervision available).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gftorf_tpu.ops.transforms import focal2fov, projection_matrix_shift, world_to_view
from gftorf_tpu.render.rasterize import rasterize
from gftorf_tpu.render.settings import CameraSpec, RasterConfig


def _surface_grid(key, z, x_half, y_half, spacing, color_freq=1.7):
    """A wall of overlapping opaque Gaussians at constant depth z with a
    smooth procedural texture. Returns (xyz, scales, opac, sh_dc, amp)."""
    ks = jax.random.split(key, 4)
    nx = max(int(2 * x_half / spacing) + 1, 2)
    ny = max(int(2 * y_half / spacing) + 1, 2)
    xs = jnp.linspace(-x_half, x_half, nx)
    ys = jnp.linspace(-y_half, y_half, ny)
    gx, gy = jnp.meshgrid(xs, ys)
    n = nx * ny
    jitter = 0.25 * spacing * jax.random.normal(ks[0], (n, 2))
    xyz = jnp.stack(
        [gx.ravel() + jitter[:, 0], gy.ravel() + jitter[:, 1],
         jnp.full((n,), z)], -1)
    scales = jnp.full((n, 3), 0.85 * spacing)
    scales = scales.at[:, 2].set(0.15 * spacing)  # thin along depth
    opac = jax.random.uniform(ks[1], (n,), minval=0.88, maxval=0.98)
    tex = 0.5 + 0.35 * jnp.sin(color_freq * xyz[:, 0]) * jnp.sin(
        color_freq * 1.3 * xyz[:, 1])
    sh_dc = tex[:, None] + 0.08 * jax.random.normal(ks[2], (n, 3))
    amp = 1.2 + 0.8 * tex + 0.05 * jax.random.normal(ks[3], (n,))
    return xyz, scales, opac, sh_dc, amp


def make_room_gaussians(key, num_dynamic=2000, depth_range=15.0):
    """A realistic full-coverage scene: an opaque textured back wall
    filling the frustum, a half-width mid-depth wall (depth edge), and a
    rigidly-oscillating dynamic ball. Unlike the floating-blob layout,
    every pixel sees an opaque surface, which reproduces the recovery
    dynamics of real ToF captures around opacity resets (reference
    train.py:455-461): surviving surface points re-saturate instead of
    the scene collapsing into a translucent soup.

    Granularity matters: the reference's synthetic captures are
    mesh-rendered with per-pixel detail, and its densify loop prunes
    anything with accumulated screen radius > 10 px once the first
    opacity reset has passed (train.py:452-453, max_screen_size=10).
    GT surfels here are sized so a faithful fit stays well under that
    bar at 320x240 / fx=0.9W (radius = 3*sigma*fx/z <= ~8 px) — coarser
    blobs make the reference's own hyperparameters mass-prune the
    converged scene at iteration reset+100."""
    ks = jax.random.split(key, 8)
    # frustum half-extents per unit depth for fx = fy = 0.9*W, H = 0.75*W
    xz, yz = 0.5 / 0.9, 0.375 / 0.9
    wall_xyz, wall_s, wall_o, wall_dc, wall_amp = _surface_grid(
        ks[0], 6.0, 1.08 * xz * 6.0, 1.08 * yz * 6.0, 0.065)
    half_xyz, half_s, half_o, half_dc, half_amp = _surface_grid(
        ks[1], 3.6, 1.05 * xz * 3.6, 1.05 * yz * 3.6, 0.04, color_freq=2.6)
    keep = half_xyz[:, 0] < -0.25  # left-side wall only: depth edge
    half_xyz, half_s, half_o, half_dc, half_amp = (
        a[keep] for a in (half_xyz, half_s, half_o, half_dc, half_amp))

    # dynamic ball at mid depth on the right (z=2.8: scale <= ~0.025
    # keeps the screen radius under ~8 px)
    nb = num_dynamic
    d = jax.random.normal(ks[2], (nb, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r = 0.45 * jax.random.uniform(ks[3], (nb,)) ** (1.0 / 3.0)
    ball_xyz = jnp.array([0.9, 0.1, 2.8]) + d * r[:, None]
    ball_s = jax.random.uniform(ks[4], (nb, 3), minval=0.012, maxval=0.024)
    ball_o = jax.random.uniform(ks[5], (nb,), minval=0.85, maxval=0.98)
    ball_dc = (jnp.array([1.1, 0.6, 0.4])
               + 0.1 * jax.random.normal(ks[6], (nb, 3)))
    ball_amp = 1.8 + 0.2 * jax.random.normal(ks[7], (nb,))

    xyz = jnp.concatenate([wall_xyz, half_xyz, ball_xyz])
    n = xyz.shape[0]
    ns = n - nb
    scales = jnp.concatenate([wall_s, half_s, ball_s])
    opac = jnp.concatenate([wall_o, half_o, ball_o])
    sh_dc = jnp.concatenate([wall_dc, half_dc, ball_dc])
    amp = jnp.concatenate([wall_amp, half_amp, ball_amp])

    quat = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    m = 16
    shs = jnp.zeros((n, m, 3)).at[:, 0, :].set(sh_dc)
    shs_p = jnp.zeros((n, m, 2)).at[:, 0, 1].set(amp)
    dyn_mask = jnp.arange(n) >= ns
    velocity = jnp.where(
        dyn_mask[:, None],
        jnp.array([[0.3, 0.08, 0.15]]) * jnp.ones((n, 3)),
        jnp.zeros((n, 3)),
    )
    return dict(xyz=xyz, scales=scales, quat=quat, opac=opac, shs=shs,
                shs_p=shs_p, dyn_mask=dyn_mask, velocity=velocity)


def make_slide_gaussians(key, depth_range=15.0):
    """A sliding-occluder scene in the spirit of the reference's
    sliding_cube F-ToRF captures: an opaque textured back wall and a
    rigid, dense cube of Gaussians at mid depth translating linearly
    across the view — the wall band behind it is occluded then
    disoccluded, the depth edge sweeps the image, and the motion is
    non-periodic (tests the deform MLP's time interpolation harder than
    the oscillating ball)."""
    ks = jax.random.split(key, 6)
    xz, yz = 0.5 / 0.9, 0.375 / 0.9
    wall_xyz, wall_s, wall_o, wall_dc, wall_amp = _surface_grid(
        ks[0], 6.0, 1.08 * xz * 6.0, 1.08 * yz * 6.0, 0.065)

    # dense cube: jittered 3D grid, half-edge 0.35, at z=3.2 (fine
    # surfels: screen radius must stay <= ~8 px, see make_room_gaussians)
    half = 0.35
    side = 13
    lin = jnp.linspace(-half, half, side)
    gx, gy, gz = jnp.meshgrid(lin, lin, lin)
    cube = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
    nb = cube.shape[0]
    cube = cube + 0.012 * jax.random.normal(ks[1], (nb, 3))
    cube_xyz = jnp.array([-0.9, 0.05, 3.2]) + cube
    cube_s = jnp.full((nb, 3), 0.026)
    cube_o = jax.random.uniform(ks[2], (nb,), minval=0.9, maxval=0.98)
    cube_dc = (jnp.array([0.4, 0.9, 1.2])
               + 0.1 * jax.random.normal(ks[3], (nb, 3)))
    cube_amp = 2.0 + 0.15 * jax.random.normal(ks[4], (nb,))

    xyz = jnp.concatenate([wall_xyz, cube_xyz])
    n = xyz.shape[0]
    ns = n - nb
    scales = jnp.concatenate([wall_s, cube_s])
    opac = jnp.concatenate([wall_o, cube_o])
    sh_dc = jnp.concatenate([wall_dc, cube_dc])
    amp = jnp.concatenate([wall_amp, cube_amp])

    quat = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    m = 16
    shs = jnp.zeros((n, m, 3)).at[:, 0, :].set(sh_dc)
    shs_p = jnp.zeros((n, m, 2)).at[:, 0, 1].set(amp)
    dyn_mask = jnp.arange(n) >= ns
    velocity = jnp.where(
        dyn_mask[:, None],
        jnp.array([[1.8, 0.0, 0.0]]) * jnp.ones((n, 3)),
        jnp.zeros((n, 3)),
    )
    return dict(xyz=xyz, scales=scales, quat=quat, opac=opac, shs=shs,
                shs_p=shs_p, dyn_mask=dyn_mask, velocity=velocity,
                motion="linear")


def make_gt_gaussians(key, num_static=384, num_dynamic=128, depth_range=15.0):
    ks = jax.random.split(key, 10)
    n = num_static + num_dynamic

    z = jax.random.uniform(ks[0], (n,), minval=2.0, maxval=6.5)
    x = jax.random.uniform(ks[1], (n,), minval=-0.5, maxval=0.5) * z
    y = jax.random.uniform(ks[2], (n,), minval=-0.4, maxval=0.4) * z
    xyz = jnp.stack([x, y, z], -1)
    scales = jax.random.uniform(ks[3], (n, 3), minval=0.05, maxval=0.25)
    quat = jax.random.normal(ks[4], (n, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[5], (n,), minval=0.6, maxval=0.98)
    m = 16
    shs = 0.2 * jax.random.normal(ks[6], (n, m, 3))
    shs = shs.at[:, 0, :].add(1.0)
    shs_p = jnp.zeros((n, m, 2))
    shs_p = shs_p.at[:, 0, 1].set(
        jax.random.uniform(ks[7], (n,), minval=1.0, maxval=2.5)
    )
    # Motion: the dynamic cluster oscillates. Keep amplitudes moderate
    # relative to the scene (~9 units deep): violent motion makes the
    # deformation optimization bistable on any backend.
    dyn_mask = jnp.arange(n) >= num_static
    velocity = jnp.where(
        dyn_mask[:, None],
        jnp.array([[0.3, 0.08, 0.15]]) * jnp.ones((n, 3)),
        jnp.zeros((n, 3)),
    )
    return dict(xyz=xyz, scales=scales, quat=quat, opac=opac, shs=shs,
                shs_p=shs_p, dyn_mask=dyn_mask, velocity=velocity)


def dynamic_disp(g, t: float):
    """Displacement field of the dynamic cluster at normalized t:
    sinusoidal oscillation (default) or linear translation ("slide")."""
    if g.get("motion") == "linear":
        return g["velocity"] * (t - 0.5)
    return g["velocity"] * jnp.sin(2.0 * jnp.pi * t)


def gaussians_at_time(g, t: float):
    """Position of every Gaussian at normalized t."""
    return g["xyz"] + dynamic_disp(g, t)


def write_dataset(
    out_dir: str,
    num_frames: int = 16,
    width: int = 64,
    height: int = 48,
    depth_range: float = 15.0,
    phase_offset: float = 0.0,
    dc_offset: float = 0.1,
    seed: int = 0,
    torf_layout: bool = False,
    layout: str = "blobs",
    static: bool = False,
):
    """Render and write a synthetic scene. num_frames should be a
    multiple of 4 for the quad cadence. layout: "blobs" (floating
    Gaussians, cheap — tests), "room" (full-coverage opaque surfaces —
    realistic training dynamics, parity runs) or "slide" (sliding rigid
    occluder, linear motion). static=True zeroes all motion (static
    ToRF-style captures)."""
    key = jax.random.PRNGKey(seed)
    if layout == "room":
        g = make_room_gaussians(key, depth_range=depth_range)
    elif layout == "slide":
        g = make_slide_gaussians(key, depth_range=depth_range)
    else:
        g = make_gt_gaussians(key, depth_range=depth_range)
    if static:
        g["velocity"] = jnp.zeros_like(g["velocity"])
    n = g["xyz"].shape[0]

    fx = fy = 0.9 * width
    cx, cy = width / 2.0, height / 2.0
    fov_x, fov_y = focal2fov(fx, width), focal2fov(fy, height)
    znear, zfar = 0.05 * depth_range * 0.9, 0.55 * depth_range * 1.1

    view_t = world_to_view(np.eye(3), np.zeros(3))
    proj_t = projection_matrix_shift(znear, zfar, fx, fy, cx, cy, width,
                                     height, fov_x, fov_y)
    camera = CameraSpec.create(view_t, proj_t, width, height, fov_x, fov_y,
                               znear, zfar, depth_range)
    config = RasterConfig(height=height, width=width, max_per_tile=2048)

    for sub in ["color", "tofType0", "tofType1", "tofType2", "tofType3",
                "synthetic_tof", "synthetic_depth", "forward_flow_2",
                "backward_flow_2", "cams"] if not torf_layout else [
                "color", "tof", "distance", "cams"]:
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    bg = jnp.zeros((7, height, width))
    zeros2d = jnp.zeros((n, 2))

    @jax.jit
    def render_at(xyz):
        return rasterize(
            xyz, g["scales"], g["quat"], g["opac"], g["shs"], g["shs_p"],
            phase_offset, dc_offset, zeros2d, bg, camera=camera, config=config,
        )

    denom = max(num_frames - 1, 1)
    depths = {}
    for fid in range(num_frames):
        t = fid / denom
        xyz_t = gaussians_at_time(g, t)
        out = render_at(xyz_t)
        color = np.moveaxis(np.asarray(out.color), 0, -1).clip(0, None)
        phasor = np.moveaxis(np.asarray(out.phasor), 0, -1)
        depth = np.asarray(out.depth[0])
        depths[fid] = depth

        np.save(os.path.join(out_dir, "color", f"{fid:04d}.npy"),
                color.astype(np.float32))
        if torf_layout:
            np.save(os.path.join(out_dir, "tof", f"{fid:04d}.npy"),
                    phasor[..., :3].astype(np.float32))
            np.save(os.path.join(out_dir, "distance", f"{fid:04d}.npy"),
                    depth.astype(np.float32))
        else:
            np.save(os.path.join(out_dir, "synthetic_tof", f"{fid:04d}.npy"),
                    phasor[..., :3].astype(np.float32))
            np.save(os.path.join(out_dir, "synthetic_depth", f"{fid:04d}.npy"),
                    depth.astype(np.float32))
            # The quad captured at this frame slot (desynchronized cadence):
            # slot k of the current group uses quad channel k.
            k = fid % 4
            np.save(os.path.join(out_dir, f"tofType{k}", f"{fid:04d}.npy"),
                    phasor[..., 3 + k].astype(np.float32))

    if not torf_layout:
        # 2D flow between integration frames (fid -> fid+4), forward and
        # backward, computed from GT geometry via depth backprojection.
        from gftorf_tpu.ops.flow import (
            distance_to_points3d,
            intrinsics_matrix,
            project_flow,
            project_points,
        )

        k_mat = intrinsics_matrix(fx, fy, cx, cy)
        view_j = jnp.asarray(view_t)
        for fid in range(0, num_frames, 4):
            pts3d = distance_to_points3d(
                jnp.asarray(depths[fid])[None], view_j, fx, fy, cx, cy
            )
            pts2d = project_points(pts3d, view_j, k_mat)
            for name, other in (("forward_flow_2", fid + 4),
                                ("backward_flow_2", fid - 4)):
                if not (0 <= other < num_frames):
                    continue
                # Approximate scene flow: dynamic points move rigidly
                # (all dynamic points share the displacement field).
                t0 = fid / denom
                t1 = other / denom
                disp = np.asarray(dynamic_disp(g, t1) - dynamic_disp(g, t0))[-1]
                # Mask to pixels whose depth changes between the frames
                moving = np.abs(depths[fid] - depths[other]) > 1e-3
                flow3d = jnp.asarray(
                    np.where(moving[None, :, :], disp[:, None, None], 0.0),
                    jnp.float32,
                )
                flow2d = project_flow(pts2d, pts3d, flow3d, view_j, k_mat)
                np.save(os.path.join(out_dir, name, f"flow_{fid:04d}.npy"),
                        np.asarray(flow2d).astype(np.float32))

    # cams
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    exts = np.repeat(np.eye(4, dtype=np.float32)[None], num_frames, 0)
    cams = os.path.join(out_dir, "cams")
    np.save(os.path.join(cams, "tof_intrinsics.npy"), K)
    np.save(os.path.join(cams, "color_intrinsics.npy"), K)
    np.save(os.path.join(cams, "tof_extrinsics.npy"), exts)
    np.save(os.path.join(cams, "color_extrinsics.npy"), exts)
    np.save(os.path.join(cams, "depth_range.npy"),
            np.array(depth_range, np.float32))
    np.save(os.path.join(cams, "phase_offset.npy"),
            np.array(phase_offset, np.float32))
    np.save(os.path.join(cams, "dc_offset.npy"),
            np.array(dc_offset, np.float32))
    return g
