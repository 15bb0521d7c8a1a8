"""Tile compositing: front-to-back alpha blending as prefix operations.

The reference walks each tile's depth-sorted Gaussian list sequentially
per pixel (forward.cu:424-676) and hand-writes the reverse walk for
gradients (backward.cu:609-889). On TPU we reformulate the whole scan as
data-parallel prefix ops along the depth axis:

    T_i   (transmittance before instance i) = exclusive-cumprod(1 - a_j)
    done  (early-termination at T*(1-a) < 1e-4) = inclusive OR-scan of the
          failure predicate evaluated on the prefix transmittance
    color = (a*T) @ features          -- batched matmul (MXU)
    phasor= (a*T^2) @ phasor_features -- two-way light attenuation
    depth-distortion = sum_i w_i (z_i^2 A^<_i - 2 z_i WZ^<_i + WZ2^<_i)
          with A^<, WZ^<, WZ2^< exclusive cumsums

This is exactly the reference computation (the early-exit predicate on
the prefix product is equivalent to the sequential `done` flag because
rejected instances don't advance T), so `jax.grad` of this function *is*
the reference backward — including the alpha-T^2 recursion for phasors
(backward.cu:793-804), the background term (:850-858), and the
depth-distortion symmetric form (:824-833), with deterministic
segment-sum reductions instead of atomicAdd.

Tiles are processed element-wise under lax.map(batch_size=...) with
jax.checkpoint so backward memory stays at one batch of (pixels x L)
intermediates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gftorf_tpu.render.settings import RasterConfig

ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
T_STOP = 1e-4


class TileFeatures(NamedTuple):
    """Per-tile dense instance features, gathered by the binner."""

    gauss_id: jnp.ndarray  # (T, L) int32, -1 pad
    mean2d: jnp.ndarray  # (T, L, 2)
    conic: jnp.ndarray  # (T, L, 3)
    opacity: jnp.ndarray  # (T, L)
    rgb: jnp.ndarray  # (T, L, 3)
    phasor: jnp.ndarray  # (T, L, 7)
    dist: jnp.ndarray  # (T, L)
    dist_ndc: jnp.ndarray  # (T, L)
    # Optional fused scene-flow channels (fwd 3 + bwd 3), composited
    # with DETACHED alpha*T weights — replaces the reference's separate
    # render_flow passes (gaussian_renderer/__init__.py:141-204).
    flow: jnp.ndarray | None = None  # (T, L, 6) or None


class TileOutputs(NamedTuple):
    color: jnp.ndarray  # (T, PIX, 3)
    phasor: jnp.ndarray  # (T, PIX, 7)
    depth: jnp.ndarray  # (T, PIX)
    acc: jnp.ndarray  # (T, PIX)
    dd: jnp.ndarray  # (T, PIX)
    distribution: jnp.ndarray  # (T, PIX, 3)
    contrib_pixels: jnp.ndarray  # (T, L) pixels touched per instance
    flow: jnp.ndarray  # (T, PIX, 6) zeros when no flow features given


def _composite_tile(feats: TileFeatures, tile_origin, bg_tile, config: RasterConfig):
    """Composite one tile.

    Args:
        feats: TileFeatures leaves WITHOUT the tile dim: (L, ...) arrays.
        tile_origin: (2,) float pixel coords of the tile corner (x0, y0).
        bg_tile: (7, th, tw) background slice.

    Returns TileOutputs leaves without the tile dim.
    """
    th, tw = config.tile_h, config.tile_w
    pix = th * tw
    # Pixel coordinates within the tile, row-major like the image layout.
    dy = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0).reshape(pix)
    dx = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1).reshape(pix)
    px = tile_origin[0] + dx  # (PIX,)
    py = tile_origin[1] + dy
    inside = (px < config.width) & (py < config.height)

    # (PIX, L) Gaussian falloff power at each pixel.
    ddx = feats.mean2d[None, :, 0] - px[:, None]
    ddy = feats.mean2d[None, :, 1] - py[:, None]
    ca, cb, cc = feats.conic[None, :, 0], feats.conic[None, :, 1], feats.conic[None, :, 2]
    power = -0.5 * (ca * ddx * ddx + cc * ddy * ddy) - cb * ddx * ddy

    alpha = jnp.minimum(ALPHA_MAX, feats.opacity[None, :] * jnp.exp(power))
    present = feats.gauss_id[None, :] >= 0
    valid = (power <= 0.0) & (alpha >= ALPHA_EPS) & present & inside[:, None]

    a_eff = jnp.where(valid, alpha, 0.0)
    q = 1.0 - a_eff
    # Exclusive cumulative transmittance along the depth axis.
    t_excl = jnp.concatenate(
        [jnp.ones_like(q[..., :1]), jnp.cumprod(q[..., :-1], axis=-1)], axis=-1
    )
    # Early termination: the sequential loop marks `done` the first time
    # T*(1-alpha) drops below T_STOP and skips that instance too.
    fail = valid & (t_excl * q < T_STOP)
    done = jnp.cumsum(fail.astype(jnp.int32), axis=-1) > 0  # inclusive OR-scan
    contribute = valid & ~done

    w = jnp.where(contribute, alpha * t_excl, 0.0)
    w_p = w * t_excl  # alpha * T^2 (forward.cu:546)

    # Weighted feature sums ride the MXU as matmuls.
    f_w = jnp.concatenate(
        [feats.rgb, feats.dist[:, None], jnp.ones_like(feats.dist[:, None])],
        axis=-1,
    )  # (L, 5): rgb, dist, acc
    sums_w = jnp.matmul(w, f_w, precision="highest")  # (PIX, 5)
    color = sums_w[:, :3]
    depth = sums_w[:, 3]
    acc = sums_w[:, 4]
    phasor = jnp.matmul(w_p, feats.phasor, precision="highest")  # (PIX, 7)

    # Depth distortion on NDC-mapped distances (forward.cu:572-578).
    # Statically gated like the Pallas kernel: zeros when the consumer's
    # dd loss is off (RasterConfig.need_dd).
    if config.need_dd:
        z = feats.dist_ndc[None, :]
        wz = w * z
        wz2 = wz * z
        a_ex = jnp.cumsum(w, axis=-1) - w
        wz_ex = jnp.cumsum(wz, axis=-1) - wz
        wz2_ex = jnp.cumsum(wz2, axis=-1) - wz2
        dd = jnp.sum(w * (z * z * a_ex) - 2.0 * wz * wz_ex + w * wz2_ex,
                     axis=-1)
    else:
        dd = jnp.zeros((pix,), jnp.float32)

    final_t = jnp.prod(jnp.where(contribute, q, 1.0), axis=-1)  # (PIX,)

    # Background: color uses bg[:3], phasor all 7 channels (forward.cu:642-650).
    bg = bg_tile.reshape(7, pix)  # (7, PIX)
    color = color + final_t[:, None] * bg[:3].T
    phasor = phasor + final_t[:, None] * bg.T

    # First-sample distribution (forward.cu:561-567): stats only.
    contribute_sg = jax.lax.stop_gradient(contribute)
    if config.need_distribution:
        first = jnp.argmax(contribute_sg, axis=-1)  # (PIX,)
        has = jnp.any(contribute_sg, axis=-1)

        def take(arr):  # arr (PIX, L)
            return jnp.where(
                has,
                jnp.take_along_axis(arr, first[:, None], axis=-1)[:, 0],
                0.0,
            )

        distribution = jax.lax.stop_gradient(
            jnp.stack(
                [
                    take(jnp.where(contribute_sg, alpha, 0.0)),
                    take(jnp.broadcast_to(
                        feats.dist[None, :], contribute.shape)),
                    take(jnp.broadcast_to(
                        feats.phasor[None, :, 2], contribute.shape)),
                ],
                axis=-1,
            )
        )
    else:
        distribution = jnp.zeros((pix, 3), jnp.float32)

    contrib_pixels = jnp.sum(contribute_sg.astype(jnp.float32), axis=0)  # (L,)

    # Fused flow channels: same alpha*T weights as color but DETACHED —
    # gradients reach only the flow features, reproducing the reference's
    # geometry-detached render_flow (gaussian_renderer/__init__.py:160-171;
    # flow has no background term, train.py:243-261 passes bg = 0).
    if feats.flow is not None:
        flow = jnp.matmul(
            jax.lax.stop_gradient(w), feats.flow, precision="highest"
        )  # (PIX, 6)
    else:
        flow = jnp.zeros((pix, 6), jnp.float32)

    return TileOutputs(
        color=color,
        phasor=phasor,
        depth=depth,
        acc=acc,
        dd=dd,
        distribution=distribution,
        contrib_pixels=contrib_pixels,
        flow=flow,
    )


def composite_tiles(
    feats: TileFeatures,
    bg_map: jnp.ndarray,
    config: RasterConfig,
    tile_origins: jnp.ndarray | None = None,
) -> TileOutputs:
    """Composite all tiles, batched to bound memory.

    Args:
        feats: TileFeatures with leading dim T (== config.num_tiles when
            tile_origins is None).
        bg_map: (7, Ht, Wt) background covering exactly these tiles
            (row-major).
        config: image bounds for the inside test are config.height/width;
            when tile_origins is given these must be the GLOBAL image
            dims and origins must be global pixel coords (sharded path).
        tile_origins: optional (T, 2) float pixel coords of tile corners.
    """
    T = feats.gauss_id.shape[0]
    th, tw = config.tile_h, config.tile_w

    if tile_origins is None:
        gw = config.grid_w
        tile_idx = jnp.arange(T, dtype=jnp.int32)
        tile_origins = jnp.stack(
            [(tile_idx % gw) * tw, (tile_idx // gw) * th], axis=-1
        ).astype(jnp.float32)
    tile_origin = tile_origins

    # bg_map covers the tile span: rows = T / tiles-per-row.
    bg_h, bg_w = bg_map.shape[1], bg_map.shape[2]
    gw_local = bg_w // tw if bg_w % tw == 0 else -(-bg_w // tw)
    gh_local = T // gw_local
    pad_h, pad_w = gh_local * th - bg_h, gw_local * tw - bg_w
    bg_p = jnp.pad(bg_map, ((0, 0), (0, max(pad_h, 0)), (0, max(pad_w, 0))))
    bg_tiles = (
        bg_p.reshape(7, gh_local, th, gw_local, tw)
        .transpose(1, 3, 0, 2, 4)
        .reshape(T, 7, th, tw)
    )

    fn = jax.checkpoint(
        lambda args: _composite_tile(args[0], args[1], args[2], config)
    )
    return jax.lax.map(
        fn,
        (feats, tile_origin, bg_tiles),
        batch_size=min(config.tile_chunk, T),
    )


def tiles_to_image(tile_img: jnp.ndarray, config: RasterConfig) -> jnp.ndarray:
    """(T, PIX[, ch]) tile-major pixels -> (ch, H, W) image."""
    if tile_img.ndim == 2:
        tile_img = tile_img[..., None]
    ch = tile_img.shape[-1]
    gw, gh = config.grid_w, config.grid_h
    th, tw = config.tile_h, config.tile_w
    img = (
        tile_img.reshape(gh, gw, th, tw, ch)
        .transpose(4, 0, 2, 1, 3)
        .reshape(ch, gh * th, gw * tw)
    )
    return img[:, : config.height, : config.width]
