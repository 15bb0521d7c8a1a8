"""Unit tests for the math core (SH, transforms, covariance, ToF, KNN)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gftorf_tpu.ops import (
    eval_sh,
    rgb2sh,
    sh2rgb,
    world_to_view,
    projection_matrix,
    projection_matrix_shift,
    full_projection,
    camera_center,
    fov2focal,
    focal2fov,
    ndc2pix,
    quat_to_rotmat,
    build_cov3d,
    ewa_project_cov2d,
    conic_from_cov2d,
    depth_from_tof,
    tof_from_depth,
    phasor_channels,
    mean_knn_sq_dist,
)
from gftorf_tpu.ops.sh import sh_basis, SH_C0
from gftorf_tpu.ops.covariance import screen_radius
from gftorf_tpu.ops.transforms import transform_point_4x3, transform_point_4x4


def rand_unit(key, shape):
    v = jax.random.normal(key, shape + (3,))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class TestSH:
    def test_dc_only(self):
        sh = jnp.zeros((1, 16))
        sh = sh.at[0, 0].set(2.0)
        dirs = rand_unit(jax.random.PRNGKey(0), (5,))
        out = eval_sh(3, jnp.broadcast_to(sh, (5, 1, 16)), dirs)
        np.testing.assert_allclose(out, 2.0 * SH_C0, rtol=1e-6)

    def test_orthonormality(self):
        # Monte-Carlo integral of basis_i * basis_j over the sphere ~ delta_ij/(4pi)...
        # real SH are orthonormal: integral = delta_ij.
        key = jax.random.PRNGKey(1)
        dirs = rand_unit(key, (200000,))
        b = sh_basis(3, dirs)  # (N, 16)
        gram = 4 * jnp.pi * (b.T @ b) / dirs.shape[0]
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    def test_degree_consistency(self):
        key = jax.random.PRNGKey(2)
        sh = jax.random.normal(key, (4, 3, 25))
        dirs = rand_unit(jax.random.PRNGKey(3), (4,))
        # Zeroing higher coeffs must equal lower-degree eval.
        sh_trunc = sh.at[..., 4:].set(0.0)
        np.testing.assert_allclose(
            eval_sh(4, sh_trunc, dirs), eval_sh(1, sh, dirs), rtol=2e-5, atol=2e-6
        )

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(sh2rgb(rgb2sh(rgb)), rgb, rtol=1e-6)


class TestTransforms:
    def test_world_to_view_identity(self):
        m = world_to_view(np.eye(3), np.zeros(3))
        np.testing.assert_allclose(m, np.eye(4), atol=1e-7)

    def test_camera_center(self):
        # W2V translation t means camera at -R @ t for COLMAP convention.
        rng = np.random.RandomState(0)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        R = np.array(quat_to_rotmat(jnp.array(q)))
        t = rng.randn(3)
        m = world_to_view(R, t)
        c = camera_center(m)
        # point at camera center maps to origin in view space
        p_view = transform_point_4x3(jnp.array(c), jnp.array(m))
        np.testing.assert_allclose(p_view, 0.0, atol=1e-5)

    def test_projection_maps_near_far(self):
        znear, zfar = 0.1, 100.0
        proj = projection_matrix(znear, zfar, 1.0, 0.8)
        p_near = transform_point_4x4(jnp.array([0.0, 0.0, znear]), jnp.array(proj))
        p_far = transform_point_4x4(jnp.array([0.0, 0.0, zfar]), jnp.array(proj))
        assert abs(p_near[2] / p_near[3]) < 1e-5
        np.testing.assert_allclose(p_far[2] / p_far[3], 1.0, rtol=1e-5)

    def test_projection_fov_edge(self):
        fovx = 1.0
        proj = projection_matrix(0.1, 100.0, fovx, 0.8)
        # A point at x = z*tan(fov/2) maps to NDC x = 1.
        z = 5.0
        x = z * np.tan(fovx / 2)
        p = transform_point_4x4(jnp.array([x, 0.0, z]), jnp.array(proj))
        np.testing.assert_allclose(p[0] / p[3], 1.0, rtol=1e-5)

    def test_shift_matrix_centered_matches(self):
        w, h = 320, 240
        fovx, fovy = 1.0, 0.8
        fx, fy = fov2focal(fovx, w), fov2focal(fovy, h)
        m0 = projection_matrix(0.1, 50.0, fovx, fovy)
        m1 = projection_matrix_shift(0.1, 50.0, fx, fy, w / 2, h / 2, w, h, fovx, fovy)
        np.testing.assert_allclose(m0, m1, atol=1e-6)

    def test_fov_focal_roundtrip(self):
        assert focal2fov(fov2focal(0.9, 320), 320) == pytest.approx(0.9)

    def test_ndc2pix(self):
        # auxiliary.h:44-47: ((v+1)*S - 1)/2
        assert float(ndc2pix(jnp.float32(-1.0), 320)) == pytest.approx(-0.5)
        assert float(ndc2pix(jnp.float32(1.0), 320)) == pytest.approx(319.5)


class TestCovariance:
    def test_quat_identity(self):
        np.testing.assert_allclose(
            quat_to_rotmat(jnp.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-7
        )

    def test_quat_90z(self):
        q = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
        R = quat_to_rotmat(q)
        # rotates x axis to y axis
        np.testing.assert_allclose(R @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_cov3d_isotropic(self):
        cov = build_cov3d(jnp.array([2.0, 2.0, 2.0]), 1.0, jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(cov, [4.0, 0, 0, 4.0, 0, 4.0], atol=1e-6)

    def test_cov3d_rotation_invariant_trace(self):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (4,))
        q = q / jnp.linalg.norm(q)
        s = jnp.array([0.5, 1.0, 2.0])
        cov = build_cov3d(s, 1.0, q)
        trace = cov[0] + cov[3] + cov[5]
        np.testing.assert_allclose(trace, jnp.sum(s**2), rtol=1e-5)

    def test_ewa_frontal_point(self):
        # Gaussian on the optical axis with isotropic cov s^2 I:
        # cov2d = (f/z)^2 s^2 I + 0.3 I.
        view = jnp.eye(4)
        s, z, f = 0.5, 4.0, 300.0
        cov3d = build_cov3d(jnp.array([s] * 3), 1.0, jnp.array([1.0, 0, 0, 0]))
        cov2d = ewa_project_cov2d(jnp.array([0.0, 0.0, z]), cov3d, view, f, f, 1.0, 1.0)
        expect = (f / z) ** 2 * s**2 + 0.3
        np.testing.assert_allclose(cov2d, [expect, 0.0, expect], rtol=1e-5, atol=1e-5)

    def test_conic_inverse(self):
        cov2d = jnp.array([4.0, 1.0, 3.0])
        conic, det = conic_from_cov2d(cov2d)
        m = jnp.array([[4.0, 1.0], [1.0, 3.0]])
        inv = jnp.linalg.inv(m)
        np.testing.assert_allclose(det, jnp.linalg.det(m), rtol=1e-6)
        np.testing.assert_allclose(conic, [inv[0, 0], inv[0, 1], inv[1, 1]], rtol=1e-6)

    def test_radius(self):
        cov2d = jnp.array([9.0, 0.0, 4.0])
        conic, det = conic_from_cov2d(cov2d)
        r = screen_radius(cov2d, det)
        assert float(r) == np.ceil(3.0 * 3.0)


class TestToF:
    def test_depth_roundtrip(self):
        depth_range = 10.0
        depth = jnp.array([0.5, 2.0, 4.0, 4.9])  # within unambiguous range/2
        tof = tof_from_depth(depth, 1.0, depth_range)
        rec = depth_from_tof(tof, depth_range)
        np.testing.assert_allclose(rec, depth, rtol=1e-5)

    def test_depth_roundtrip_with_offset(self):
        depth_range = 8.0
        off = 0.3
        depth = jnp.array([1.0, 3.0])
        tof = tof_from_depth(depth, 2.0, depth_range, phase_offset=off)
        rec = depth_from_tof(tof, depth_range, phase_offset=off)
        np.testing.assert_allclose(rec, depth, rtol=1e-5)

    def test_phasor_channels(self):
        d = jnp.array([2.0])
        ph = phasor_channels(d, jnp.zeros(1), jnp.array([3.0]), 10.0, 0.1, 0.25, False)
        phase = 2.0 * 4 * np.pi / 10.0 + 0.1
        f = 1 / 4.0
        np.testing.assert_allclose(ph[0, 0], np.cos(phase) * 3 * f, rtol=1e-5)
        np.testing.assert_allclose(ph[0, 1], np.sin(phase) * 3 * f, rtol=1e-5)
        np.testing.assert_allclose(ph[0, 2], 3 * f, rtol=1e-6)
        np.testing.assert_allclose(ph[0, 3], (np.cos(phase) + 0.25) * 3 * f, rtol=1e-5)
        np.testing.assert_allclose(ph[0, 4], (-np.cos(phase) + 0.25) * 3 * f, rtol=1e-5)
        np.testing.assert_allclose(ph[0, 5], (np.sin(phase) + 0.25) * 3 * f, rtol=1e-5)
        np.testing.assert_allclose(ph[0, 6], (-np.sin(phase) + 0.25) * 3 * f, rtol=1e-5)

    def test_view_dependent_phase(self):
        d = jnp.array([2.0])
        ph0 = phasor_channels(d, jnp.array([0.7]), jnp.array([1.0]), 10.0, 0.0, 0.0, True)
        phase = 2.0 * 4 * np.pi / 10.0 + 0.7
        np.testing.assert_allclose(ph0[0, 0], np.cos(phase) / 4.0, rtol=1e-5)


class TestKNN:
    def test_grid_points(self):
        # Unit grid: each interior point's 3 nearest neighbors are at distance 1.
        xs = np.arange(5, dtype=np.float32)
        pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
        out = np.array(mean_knn_sq_dist(jnp.array(pts), block_size=64))
        np.testing.assert_allclose(out, 1.0, rtol=1e-5)

    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(500, 3).astype(np.float32)
        out = np.array(mean_knn_sq_dist(jnp.array(pts), block_size=128))
        d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        expect = np.sort(d, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(out, expect, rtol=1e-4)
