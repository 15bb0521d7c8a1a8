"""Image-quality metrics: PSNR, SSIM, LPIPS (lpipsPyTorch equivalent).

LPIPS needs pretrained AlexNet/VGG features. This environment has no
network egress and no torchvision, so `lpips()` loads feature weights
from a local .npz (set GFTORF_LPIPS_WEIGHTS or pass weights_path). The
conv arithmetic itself is implemented here in jnp, matching the standard
LPIPS formulation (unit-normalize features per channel, 1x1 linear
heads, spatial average). Without weights it raises a clear error.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gftorf_tpu.train.losses import psnr, ssim  # re-export

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b=None, stride=1):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def _alexnet_features(x, params):
    """AlexNet feature trunk (5 relu stages) from packed weights."""
    feats = []
    pads = [(2, 2), (2, 2), (1, 1), (1, 1), (1, 1)]
    strides = [4, 1, 1, 1, 1]
    pools = [True, True, False, False, False]
    for i in range(5):
        p = pads[i]
        x = jnp.pad(x, ((0, 0), (0, 0), p, p))
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], strides[i])
        x = jax.nn.relu(x)
        feats.append(x)
        if pools[i]:
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
            )
    return feats


def lpips_weights_path(weights_path: Optional[str] = None) -> Optional[str]:
    """Resolve the converted LPIPS weights npz, or None when absent
    (tools/convert_lpips_weights.py produces it on a networked machine;
    this image cannot — eval then reports lpips as n/a)."""
    path = weights_path or os.environ.get("GFTORF_LPIPS_WEIGHTS", "")
    return path if path and os.path.exists(path) else None


def lpips_available(weights_path: Optional[str] = None) -> bool:
    return lpips_weights_path(weights_path) is not None


def lpips(img1, img2, weights_path: Optional[str] = None):
    """LPIPS distance between (3, H, W) images in [0, 1].

    Requires a weights file (npz with conv{i}_w/b and lin{i}_w arrays;
    see tools/convert_lpips_weights.py).
    """
    path = lpips_weights_path(weights_path)
    if path is None:
        raise FileNotFoundError(
            "LPIPS needs pretrained feature weights; convert them with "
            "tools/convert_lpips_weights.py on a networked machine and "
            "set GFTORF_LPIPS_WEIGHTS (no network egress here)."
        )
    params = {k: jnp.asarray(v) for k, v in np.load(path).items()}

    def norm_input(img):
        x = img[None] * 2.0 - 1.0  # [0,1] -> [-1,1]
        return (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
            _SCALE
        )[None, :, None, None]

    f1 = _alexnet_features(norm_input(img1), params)
    f2 = _alexnet_features(norm_input(img2), params)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        lin = params[f"lin{i}_w"]  # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return total
