"""Real spherical-harmonics evaluation (degrees 0..4).

Semantics match the reference's SH basis and conversion helpers
(/root/reference/utils/sh_utils.py:57-124 and the in-kernel evaluation at
/root/reference/submodules/diff-gaussian-rasterization-w-tof/cuda_rasterizer/forward.cu:20-125):
the hardcoded real-SH polynomials with the usual 3DGS sign conventions, a
+0.5 offset applied by the caller, and the (x - 0.5)/C0 DC packing.

Everything here is pure jnp and differentiable; the rasterizer vmaps it
over Gaussians.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis polynomials at unit directions.

    Args:
        degree: max SH degree, 0..4 (static).
        dirs: (..., 3) unit direction vectors.

    Returns:
        (..., (degree+1)**2) basis values such that
        ``eval = sum_k basis[..., k] * coeffs[..., k]``.
    """
    if not 0 <= degree <= 4:
        raise ValueError(f"SH degree must be in [0, 4], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [SH_C0 * one]
    if degree > 0:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree > 2:
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree > 3:
        out += [
            SH_C4[0] * xy * (xx - yy),
            SH_C4[1] * yz * (3.0 * xx - yy),
            SH_C4[2] * xy * (7.0 * zz - 1.0),
            SH_C4[3] * yz * (7.0 * zz - 3.0),
            SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            SH_C4[5] * xz * (7.0 * zz - 3.0),
            SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            SH_C4[7] * xz * (xx - 3.0 * yy),
            SH_C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(degree: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH coefficients at unit directions.

    Args:
        degree: active SH degree (static int, 0..4).
        sh: (..., C, M) coefficients with M >= (degree+1)**2; trailing
            channel dim C is evaluated independently.
        dirs: (..., 3) unit directions.

    Returns:
        (..., C) evaluated values (no +0.5 offset, no clamping).
    """
    basis = sh_basis(degree, dirs)  # (..., K)
    k = num_sh_coeffs(degree)
    return jnp.einsum("...cm,...m->...c", sh[..., :k], basis, precision="highest")


def rgb2sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / SH_C0


def sh2rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * SH_C0 + 0.5


# Phase/amplitude use the same affine packing as RGB in the reference.
def pa2sh(pa: jnp.ndarray) -> jnp.ndarray:
    return (pa - 0.5) / SH_C0


def sh2pa(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * SH_C0 + 0.5
