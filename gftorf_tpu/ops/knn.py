"""Mean k-nearest-neighbor squared distance for Gaussian scale init.

TPU-native replacement for the reference's simple-knn CUDA extension
(simple_knn.cu:185-221), which computes for every point the mean of its 3
smallest neighbor squared distances, used once at init for
``scales = log(sqrt(mean_knn_sq_dist(points)))``
(scene/gaussian_model.py:194-199).

Instead of Morton-code spatial pruning (a serial-ish, branchy algorithm),
we do blocked exact pairwise distances + top-k: the distance matrix is one
big rank-3 contraction that maps straight onto the MXU, and P=100k points
in 4k-row blocks is ~100 GFLOP-scale work — cheap on TPU and exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, block_size: int = 4096) -> jnp.ndarray:
    """Mean of the k smallest nonzero-neighbor squared distances per point.

    Args:
        points: (P, 3) float32 positions.
        k: number of neighbors (reference uses 3).
        block_size: rows per pairwise block.

    Returns:
        (P,) mean squared distance to the k nearest neighbors.
    """
    points = points.astype(jnp.float32)
    n = points.shape[0]
    if n <= 1:
        return jnp.zeros((n,), jnp.float32)
    k = min(k, n - 1)
    pad = (-n) % block_size
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    np_ = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=-1)  # (Np,)

    def block_knn(block_pts, block_idx0):
        # Squared distances from this block to all points via one matmul.
        d = (
            jnp.sum(block_pts * block_pts, axis=-1, keepdims=True)
            - 2.0 * jnp.matmul(block_pts, pts.T, precision="highest")
            + sq[None, :]
        )
        # Exclude self-distance and padded columns.
        rows = block_idx0 + jnp.arange(block_pts.shape[0])
        cols = jnp.arange(np_)
        d = jnp.where(cols[None, :] == rows[:, None], jnp.inf, d)
        d = jnp.where(cols[None, :] >= n, jnp.inf, d)
        neg_top, _ = jax.lax.top_k(-d, k)
        return jnp.mean(jnp.maximum(-neg_top, 0.0), axis=-1)

    num_blocks = np_ // block_size
    blocks = pts.reshape(num_blocks, block_size, 3)
    out = jax.lax.map(
        lambda args: block_knn(args[0], args[1]),
        (blocks, jnp.arange(num_blocks) * block_size),
    )
    return out.reshape(np_)[:n]
