"""Native C++ KNN extension vs brute force and the jnp implementation."""

import numpy as np
import pytest

from gftorf_tpu.native import available, mean_knn_sq_dist_native


pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable (g++ missing?)"
)


def brute(pts, k=3):
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    return np.sort(d, axis=1)[:, :k].mean(1)


def test_matches_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.randn(2000, 3).astype(np.float32)
    out = mean_knn_sq_dist_native(pts)
    np.testing.assert_allclose(out, brute(pts), rtol=1e-5)


def test_clustered_points():
    rng = np.random.RandomState(1)
    # tight clusters stress the Morton-window rejection radius
    centers = rng.randn(20, 3) * 10
    pts = (centers[rng.randint(0, 20, 3000)]
           + 0.01 * rng.randn(3000, 3)).astype(np.float32)
    out = mean_knn_sq_dist_native(pts)
    np.testing.assert_allclose(out, brute(pts), rtol=1e-4)


def test_matches_jnp_version():
    import jax.numpy as jnp

    from gftorf_tpu.ops.knn import mean_knn_sq_dist

    rng = np.random.RandomState(2)
    pts = rng.randn(1500, 3).astype(np.float32)
    native = mean_knn_sq_dist_native(pts)
    device = np.asarray(mean_knn_sq_dist(jnp.asarray(pts), block_size=512))
    np.testing.assert_allclose(native, device, rtol=1e-4)
