"""Tile binning: expand Gaussians into (gaussian, tile) instances, sort by
(tile, depth), and lay them out densely as (num_tiles, max_per_tile).

TPU-native replacement for the reference's cub pipeline
(rasterizer_impl.cu:72-140, 215-377): InclusiveSum + duplicateWithKeys +
DeviceRadixSort + identifyTileRanges. Differences by design:

 - fixed-capacity padded duplicate list (XLA needs static shapes); the
   expansion uses the searchsorted-over-cumsum trick instead of a scatter
   loop;
 - a two-key stable `jax.lax.sort` over (tile, view-depth) replaces the
   packed 64-bit radix sort. Stability preserves Gaussian submission
   order for equal depths, like the reference's radix sort over
   ascending-index input;
 - the sorted list is scattered into a dense (T, L) index grid so the
   compositor sees fully regular shapes; per-tile overflow beyond L is
   dropped and reported.

Everything here is integer bookkeeping: no gradients flow through it
(the compositor re-gathers differentiable features by index).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gftorf_tpu.render.settings import RasterConfig


class Binning(NamedTuple):
    gauss_id: jnp.ndarray  # (T, L) int32, index into Gaussians; -1 = empty
    tile_count: jnp.ndarray  # (T,) int32 instances per tile (clipped to L)
    num_rendered: jnp.ndarray  # () int32
    dup_overflow: jnp.ndarray  # () bool
    tile_overflow: jnp.ndarray  # () int32 max dropped in one tile


def bin_gaussians(
    rect: jnp.ndarray,
    depth_view: jnp.ndarray,
    valid: jnp.ndarray,
    config: RasterConfig,
    capacity: int,
) -> Binning:
    """Build the dense per-tile instance layout.

    Args:
        rect: (P, 4) int32 tile rects [x0, y0, x1, y1).
        depth_view: (P,) view-space z sort key (positive for valid).
        valid: (P,) bool.
        capacity: static duplicate-list capacity K.
    """
    P = rect.shape[0]
    T = config.num_tiles
    L = config.max_per_tile

    nx = rect[:, 2] - rect[:, 0]
    counts = jnp.where(valid, nx * (rect[:, 3] - rect[:, 1]), 0).astype(jnp.int32)
    cum = jnp.cumsum(counts)
    num_rendered = cum[-1]
    dup_overflow = num_rendered > capacity

    # Expand: slot k belongs to gaussian g = first index with cum[g] > k.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    g = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    slot_valid = slots < num_rendered
    g_c = jnp.clip(g, 0, P - 1)
    within = slots - (cum[g_c] - counts[g_c])
    # Row-major walk over the rect (y outer, x inner), matching
    # duplicateWithKeys (rasterizer_impl.cu:72-113).
    nx_g = jnp.maximum(nx[g_c], 1)
    tile_x = rect[g_c, 0] + within % nx_g
    tile_y = rect[g_c, 1] + within // nx_g
    tile = tile_y * config.grid_w + tile_x
    tile = jnp.where(slot_valid, tile, T).astype(jnp.int32)  # sentinel sorts last
    depth = jnp.where(slot_valid, depth_view[g_c], jnp.inf).astype(jnp.float32)

    # Stable two-key sort: primary tile, secondary depth.
    tile_s, _, g_s = jax.lax.sort((tile, depth, g_c), num_keys=2, is_stable=True)

    # Dense (T, L) layout: position within tile = index - tile_start.
    tile_start = jnp.searchsorted(tile_s, jnp.arange(T, dtype=jnp.int32), side="left")
    pos = jnp.arange(capacity, dtype=jnp.int32) - tile_start[jnp.clip(tile_s, 0, T - 1)]
    keep = (tile_s < T) & (pos < L)
    scatter_tile = jnp.where(keep, tile_s, T)  # out-of-range rows dropped
    scatter_pos = jnp.where(keep, pos, 0)
    gauss_id = jnp.full((T, L), -1, jnp.int32)
    gauss_id = gauss_id.at[scatter_tile, scatter_pos].set(g_s, mode="drop")

    tile_end = jnp.searchsorted(tile_s, jnp.arange(T, dtype=jnp.int32), side="right")
    raw_count = (tile_end - tile_start).astype(jnp.int32)
    tile_count = jnp.minimum(raw_count, L)
    tile_overflow = jnp.max(raw_count - tile_count)

    return Binning(
        gauss_id=gauss_id,
        tile_count=tile_count,
        num_rendered=num_rendered,
        dup_overflow=dup_overflow,
        tile_overflow=tile_overflow,
    )
