"""3D covariance construction and EWA projection to screen space.

Matches the reference kernels' math exactly
(cuda_rasterizer/forward.cu:128-206):

 - ``build_cov3d``: Sigma = (S R)^T (S R) from per-axis scales and an
   **unnormalized** quaternion (the reference deliberately skips
   normalization in computeCov3D, forward.cu:181, and returns the gradient
   w.r.t. the unnormalized quaternion, backward.cu:459-461 — callers pass
   already-normalized rotations).
 - ``ewa_project_cov2d``: EWA splatting Jacobian with the 1.3*tan(fov)
   clamp of the view-space point (gradient zeroed outside the clamp, which
   jnp.clip reproduces) and the +0.3 px low-pass filter on the diagonal.

Shapes are unbatched; the rasterizer vmaps over Gaussians.
"""

from __future__ import annotations

import jax.numpy as jnp

# Low-pass filter added to the 2D covariance diagonal (forward.cu:164-165).
COV2D_LOWPASS = 0.3


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from quaternion (r, x, y, z); no normalization."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
            jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
            jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def build_cov3d(scale: jnp.ndarray, scale_modifier, quat: jnp.ndarray) -> jnp.ndarray:
    """World-space covariance, upper-triangular packed (6,).

    Layout: [xx, xy, xz, yy, yz, zz] as in forward.cu:199-205.
    """
    R = quat_to_rotmat(quat)
    M = R * (scale_modifier * scale)[..., None, :]  # rows scaled: M = R diag(s)
    # Explicit f32 precision: TPU matmuls default to bf16 passes.
    sigma = jnp.einsum("...ij,...kj->...ik", M, M, precision="highest")
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )


def ewa_project_cov2d(
    t: jnp.ndarray,
    cov3d: jnp.ndarray,
    view_t: jnp.ndarray,
    focal_x,
    focal_y,
    tan_fovx,
    tan_fovy,
) -> jnp.ndarray:
    """Project a 3D covariance to a 2D screen covariance (EWA splatting).

    Args:
        t: (3,) the Gaussian mean already in view space (callers sanitize
            culled points so tz != 0).

    Returns packed (3,): [cov_xx, cov_xy, cov_yy] including the low-pass
    term. Mirrors computeCov2D (forward.cu:128-167).
    """
    tz = t[..., 2]
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(t[..., 1] / tz, -lim_y, lim_y) * tz

    # J is the 2x3 Jacobian of the perspective projection at (tx, ty, tz).
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    W = view_t[:3, :3]  # rows of view_t = world-to-view rotation transposed
    # U = J @ W^T maps world direction -> screen; cov2d = U Sigma U^T.
    # view_t is stored transposed, so W[k, i] = R_view[i, k]: U[a, k] =
    # sum_i J[a, i] * W[k, i].
    u0 = j00 * W[:, 0] + j02 * W[:, 2]  # (3,) row 0 of U
    u1 = j11 * W[:, 1] + j12 * W[:, 2]  # (3,) row 1 of U

    c = cov3d
    sigma = jnp.stack(
        [
            jnp.stack([c[..., 0], c[..., 1], c[..., 2]], -1),
            jnp.stack([c[..., 1], c[..., 3], c[..., 4]], -1),
            jnp.stack([c[..., 2], c[..., 4], c[..., 5]], -1),
        ],
        axis=-2,
    )
    def dot(a, b):
        return jnp.einsum("...i,...i->...", a, b, precision="highest")

    s_u0 = jnp.einsum("...ij,...j->...i", sigma, u0, precision="highest")
    s_u1 = jnp.einsum("...ij,...j->...i", sigma, u1, precision="highest")
    cov_xx = dot(u0, s_u0) + COV2D_LOWPASS
    cov_xy = dot(u0, s_u1)
    cov_yy = dot(u1, s_u1) + COV2D_LOWPASS
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def conic_from_cov2d(cov2d: jnp.ndarray):
    """Invert the 2x2 covariance; returns (conic(3,), det).

    conic = [a, b, c] such that power = -0.5(a dx^2 + c dy^2) - b dx dy.
    """
    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    det_inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    conic = jnp.stack(
        [cov2d[..., 2] * det_inv, -cov2d[..., 1] * det_inv, cov2d[..., 0] * det_inv],
        axis=-1,
    )
    return conic, det


def screen_radius(cov2d: jnp.ndarray, det: jnp.ndarray) -> jnp.ndarray:
    """3-sigma screen radius from 2D covariance eigenvalues (forward.cu:334-337)."""
    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    return jnp.ceil(3.0 * jnp.sqrt(lambda1))
