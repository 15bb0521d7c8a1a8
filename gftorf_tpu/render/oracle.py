"""Sequential numpy oracle: a direct transliteration of the reference's
per-pixel front-to-back compositing loop (forward.cu:424-676), used only
in tests to validate the prefix-op compositor's equivalence claim.

Forward-only, slow (python loop over pixels), tiny scenes only.
"""

from __future__ import annotations

import numpy as np

from gftorf_tpu.render.composite import ALPHA_EPS, ALPHA_MAX, T_STOP
from gftorf_tpu.render.preprocess import PreprocessOutputs
from gftorf_tpu.render.settings import RasterConfig


def composite_oracle(pre: PreprocessOutputs, bg_map, config: RasterConfig):
    """Sequentially composite preprocessed Gaussians.

    Returns dict of numpy arrays: color (3,H,W), phasor (7,H,W),
    depth/acc/dd (1,H,W), pixels (P,).
    """
    valid = np.asarray(pre.valid)
    mean2d = np.asarray(pre.mean2d)
    depth_view = np.asarray(pre.depth_view)
    conic = np.asarray(pre.conic)
    opac = np.asarray(pre.opacity)
    rgb = np.asarray(pre.rgb)
    phasor = np.asarray(pre.phasor)
    dist = np.asarray(pre.dist)
    dist_ndc = np.asarray(pre.dist_ndc)
    rect = np.asarray(pre.rect)
    bg = np.asarray(bg_map)

    H, W = config.height, config.width
    P = valid.shape[0]

    # Global stable depth sort of valid Gaussians (per-tile sort with a
    # shared key gives the same per-tile order).
    order = np.argsort(depth_view, kind="stable")
    order = order[valid[order]]

    out_color = np.zeros((3, H, W), np.float32)
    out_phasor = np.zeros((7, H, W), np.float32)
    out_depth = np.zeros((1, H, W), np.float32)
    out_acc = np.zeros((1, H, W), np.float32)
    out_dd = np.zeros((1, H, W), np.float32)
    pixels = np.zeros((P,), np.float32)

    for yy in range(H):
        ty = yy // config.tile_h
        for xx in range(W):
            tx = xx // config.tile_w
            T = 1.0
            C = np.zeros(3)
            PH = np.zeros(7)
            D = 0.0
            A = 0.0
            DD = DD_D = DD_D2 = 0.0
            for g in order:
                # Tile-rect membership replaces the binning.
                if not (rect[g, 0] <= tx < rect[g, 2] and rect[g, 1] <= ty < rect[g, 3]):
                    continue
                dx = mean2d[g, 0] - xx
                dy = mean2d[g, 1] - yy
                power = (
                    -0.5 * (conic[g, 0] * dx * dx + conic[g, 2] * dy * dy)
                    - conic[g, 1] * dx * dy
                )
                if power > 0.0:
                    continue
                alpha = min(ALPHA_MAX, opac[g] * np.exp(power))
                if alpha < ALPHA_EPS:
                    continue
                test_T = T * (1 - alpha)
                if test_T < T_STOP:
                    break
                w = alpha * T
                w_p = alpha * T * T
                C += rgb[g] * w
                PH += phasor[g] * w_p
                D += dist[g] * w
                z = dist_ndc[g]
                DD += w * (z * z * A - 2.0 * z * DD_D + DD_D2)
                DD_D += w * z
                DD_D2 += w * z * z
                A += w
                T = test_T
                pixels[g] += 1.0
            out_color[:, yy, xx] = C + T * bg[:3, yy, xx]
            out_phasor[:, yy, xx] = PH + T * bg[:7, yy, xx]
            out_depth[0, yy, xx] = D
            out_acc[0, yy, xx] = A
            out_dd[0, yy, xx] = DD

    return {
        "color": out_color,
        "phasor": out_phasor,
        "depth": out_depth,
        "acc": out_acc,
        "depth_distortion": out_dd,
        "pixels": pixels,
    }


def rasterize_oracle(
    means3d, scales, rotations, opacities, shs, shs_p,
    phase_offset, dc_offset, bg_map, camera, config: RasterConfig,
    active_sh_degree: int = 3, **kw,
):
    """Preprocess (jax) + sequential numpy compositing."""
    import jax.numpy as jnp

    from gftorf_tpu.render.preprocess import preprocess

    pre = preprocess(
        means3d, scales, rotations, opacities, shs, shs_p,
        phase_offset, dc_offset, jnp.zeros((means3d.shape[0], 2)),
        camera, config, active_sh_degree, **kw,
    )
    return composite_oracle(pre, bg_map, config)
