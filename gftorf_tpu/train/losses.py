"""Training losses (utils/loss_utils.py, utils/image_utils.py).

SSIM uses the standard 11x11 Gaussian window (sigma 1.5) as a depthwise
convolution with same-padding, matching the torch implementation
(loss_utils.py:74-114).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# A/B escape hatch for the round-5 banded-matmul SSIM (identical
# zero-padded semantics; this knob exists to attribute training-curve
# differences, not because the implementations disagree — both are
# golden-tested against torch).
_SSIM_IMPL = os.environ.get("GFTORF_SSIM_IMPL", "banded")


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def weighted_l1_loss(pred, gt, w, num_phasor_channels):
    """Amplitude-normalized phasor L1 (loss_utils.py:23-25): the weight is
    the norm over all channels of the prediction (detached)."""
    weight = w + jax.lax.stop_gradient(jnp.sqrt(jnp.sum(pred**2, axis=0)))
    return jnp.mean(
        jnp.abs((pred[:num_phasor_channels] - gt[:num_phasor_channels]) / weight)
    )


def weighted_l1_loss_quad(pred, gt, w):
    weight = w + jnp.abs(jax.lax.stop_gradient(pred))
    return jnp.mean(jnp.abs((pred - gt) / weight))


def weighted_l2_loss_quad(pred, gt, w):
    weight = w + jnp.abs(jax.lax.stop_gradient(pred))
    return jnp.mean(jnp.square((pred - gt) / weight))


def psnr(pred, gt):
    """Per-image PSNR (image_utils.py:17-19): mean over pixels per channel
    row in the torch version reduces over everything here for scalars."""
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


@functools.cache
def _gaussian_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    return (g / g.sum()).astype(np.float32)


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over a (C, H, W) image pair.

    The Gaussian window is separable; two 1-D depthwise convolutions
    replace the 11x11 one (the 2-D depthwise conv lowers pathologically
    on TPU: ~100 ms fwd+bwd at 240x320 vs ~2 ms separable).
    """
    w1 = jnp.asarray(_gaussian_1d(window_size))
    pad = window_size // 2
    _, h, w = img1.shape

    if _SSIM_IMPL == "conv":
        # Pre-round-5 lowering: two 1-D depthwise convolutions.
        c = img1.shape[0]
        kh = jnp.broadcast_to(w1[None, None, :, None],
                              (c, 1, window_size, 1))
        kw = jnp.broadcast_to(w1[None, None, None, :],
                              (c, 1, 1, window_size))

        def conv(x):
            y = jax.lax.conv_general_dilated(
                x[None], kh, (1, 1), [(pad, pad), (0, 0)],
                feature_group_count=c,
                precision=jax.lax.Precision.HIGHEST,
            )
            y = jax.lax.conv_general_dilated(
                y, kw, (1, 1), [(0, 0), (pad, pad)],
                feature_group_count=c,
                precision=jax.lax.Precision.HIGHEST,
            )
            return y[0]

        return _ssim_from_window_sums(img1, img2, conv)

    # Banded convolution matrices: y = Wh @ x @ Ww^T computes the same
    # separable zero-padded window sums as the depthwise convs, but as
    # two dense matmuls — the grouped 1-D convs lower to ~1 ms each on
    # TPU (x10 fwd + backward made SSIM ~9 ms of the training step,
    # round-5 profile) while the banded matmuls ride the MXU (the
    # wasted off-band zeros are free at these sizes).
    def band(n):
        idx = jnp.arange(n)
        off = idx[:, None] - idx[None, :] + pad  # (out, in) tap index
        taps = jnp.where((off >= 0) & (off < window_size), off, 0)
        return jnp.where(
            (off >= 0) & (off < window_size), w1[taps], 0.0
        )

    bh, bw = band(h), band(w)

    def conv(x):
        y = jnp.einsum("ij,cjw->ciw", bh, x,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("kw,ciw->cik", bw, y,
                          precision=jax.lax.Precision.HIGHEST)

    return _ssim_from_window_sums(img1, img2, conv)


def _ssim_from_window_sums(img1, img2, conv):
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(ssim_map)
