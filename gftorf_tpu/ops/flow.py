"""Optical-flow geometry: backprojection and perspective flow projection.

jnp ports of the reference's flow utilities (scene/torf_utils.py:80-124),
used by the F-ToRF flow-supervision loss (train.py:243-261). Matrices are
in the transposed (row-vector) convention used throughout this package;
the reference's ``world_view_transform.transpose(1,0)`` is the plain W2V
matrix, which here is ``view_t.T``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distance_to_points3d(distance_map, view_t, fx, fy, cx, cy):
    """Backproject a (1, H, W) distance (not z-depth) map to world points.

    Mirrors distance_to_points3d (torf_utils.py:80-93).

    Returns (3, H, W) world-space points.
    """
    h, w = distance_map.shape[1:]
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    ray = jnp.sqrt(((u - cx) / fx) ** 2 + ((v - cy) / fy) ** 2 + 1.0)
    z = distance_map[0] / ray
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts_cam = jnp.stack([x, y, z], axis=0).reshape(3, -1)  # (3, HW)
    # world = inv(W2V) @ cam ; W2V = view_t.T
    c2w = jnp.linalg.inv(view_t.T)
    pts_w = c2w[:3, :3] @ pts_cam + c2w[:3, 3:4]
    return pts_w.reshape(3, h, w)


def project_points(points3d, view_t, intrinsics):
    """Project (3, H, W) world points to (2, H, W) pixel coords
    (torf_utils.py:100-107)."""
    h, w = points3d.shape[1:]
    flat = points3d.reshape(3, -1)
    cam = view_t.T[:3, :3] @ flat + view_t.T[:3, 3:4]
    hom = intrinsics @ cam
    return (hom[:2] / (hom[2:] + 1e-7)).reshape(2, h, w)


def project_flow(points2d_curr, points3d_curr, flow3d, view_t, intrinsics):
    """Perspectively project 3D scene flow to 2D optical flow
    (torf_utils.py:116-124)."""
    moved = points3d_curr + flow3d
    points2d_next = project_points(moved, view_t, intrinsics)
    return points2d_next - points2d_curr


def intrinsics_matrix(fx, fy, cx, cy):
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32)
