"""Tile binning: expand Gaussians into (gaussian, tile) instances, sort by
(tile, depth), and lay them out densely as (num_tiles, max_per_tile).

TPU-native replacement for the reference's cub pipeline
(rasterizer_impl.cu:72-140, 215-377): InclusiveSum + duplicateWithKeys +
DeviceRadixSort + identifyTileRanges. Designed around what is fast on
TPU (measured on v5e): lax.sort and prefix scans are nearly free, while
random gathers cost ~5 ms per million rows — so the stream expansion
uses scatter + cummax segment propagation instead of searchsorted
(which costs ~17 binary-search gathers per slot), and per-slot fields
come from a single gather of one packed int32.

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
    tile_max: jnp.ndarray  # () int32 deepest tile (pre-clip): the
    #   occupancy high-water mark the Trainer's adaptive capacity
    #   tracking shrinks max_per_tile toward (train/loop.py)


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

    # Pre-sort the gaussians by view depth: instances expanded in this
    # order are automatically depth-ordered within every tile, so the
    # capacity-length sort below needs only the tile key. This splits
    # the reference's 64-bit [tile|depth] radix key
    # (rasterizer_impl.cu:72-113) into a P-length depth sort (P ~ K/12)
    # plus a 1-key K-length sort — one array and one comparator key
    # fewer through the big sort, and no per-slot depth gather at all.
    # Tie order is preserved exactly: equal depths keep gaussian-index
    # order (stable), the same secondary order the slot layout gave.
    depth_key = jnp.where(valid, depth_view, jnp.inf).astype(jnp.float32)
    _, order = jax.lax.sort(
        (depth_key, jnp.arange(P, dtype=jnp.int32)), num_keys=1,
        is_stable=True,
    )
    rect = jnp.take(rect, order, axis=0)
    valid = jnp.take(valid, order)

    nx = rect[:, 2] - rect[:, 0]
    counts = jnp.where(valid, nx * (rect[:, 3] - rect[:, 1]), 0).astype(jnp.int32)
    cum = jnp.cumsum(counts)
    num_rendered = cum[-1]
    dup_overflow = num_rendered > capacity
    offsets = cum - counts  # (P,) start slot of each gaussian's span

    slots = jnp.arange(capacity, dtype=jnp.int32)
    slot_valid = slots < num_rendered

    # Segment-propagate the owning gaussian: scatter the index at each
    # span start (max resolves zero-count collisions toward the real
    # owner, which always has the larger index), then cummax.
    gids = jnp.arange(P, dtype=jnp.int32)
    seg = jnp.zeros((capacity,), jnp.int32).at[offsets].max(gids, mode="drop")
    g = jax.lax.cummax(seg)

    # Span-start position per slot: the owner's own offset. A gather by
    # g replaces a second scatter-max+cummax (identical by construction:
    # cummax over the scattered offsets resolves every slot to the
    # offset of the max-gid owner, which IS offsets[g]; ~1 ms/step of
    # scatter-max saved at the bench workload, round-5 trace).
    within = slots - jnp.take(offsets, g, axis=0)

    # Per-slot rect fields from one packed gather (grid dims < 256 each;
    # RasterConfig asserts this via capacity_for callers).
    packed = (
        rect[:, 0] | (rect[:, 1] << 8) | (jnp.maximum(nx, 1) << 16)
    ).astype(jnp.int32)
    pk = jnp.take(packed, g, axis=0)
    x0 = pk & 0xFF
    y0 = (pk >> 8) & 0xFF
    nxg = (pk >> 16) & 0xFF
    # Row-major walk over the rect (y outer, x inner), matching
    # duplicateWithKeys (rasterizer_impl.cu:72-113).
    tile_x = x0 + within % nxg
    tile_y = y0 + within // nxg
    tile = tile_y * config.grid_w + tile_x
    tile = jnp.where(slot_valid, tile, T).astype(jnp.int32)  # sentinel last

    # Stable single-key sort by tile: depth order within each tile is
    # inherited from the pre-sorted expansion order.
    tile_s, g_s = jax.lax.sort((tile, g), num_keys=1, is_stable=True)
    # g indexes the depth-sorted permutation; map back to gaussian ids.
    g_s = jnp.take(order, g_s, axis=0)

    # Dense (T, L) layout: position within tile = index - tile_start.
    tile_start = jnp.searchsorted(tile_s, jnp.arange(T, dtype=jnp.int32),
                                  side="left")
    tile_end = jnp.searchsorted(tile_s, jnp.arange(T, dtype=jnp.int32),
                                side="right")
    # Per-slot tile start via the same scatter+cummax propagation (the
    # sorted tile ids are monotone): scatter each slot's own index where a
    # new tile begins.
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), tile_s[1:] != tile_s[:-1]]
    )
    head_pos = jnp.where(is_head, slots, 0)
    seg_start = jax.lax.cummax(head_pos)
    pos = slots - seg_start
    keep = (tile_s < T) & (pos < L)
    scatter_tile = jnp.where(keep, tile_s, T)
    scatter_pos = jnp.where(keep, pos, 0)
    gauss_id = jnp.full((T, L), -1, jnp.int32)
    gauss_id = gauss_id.at[scatter_tile, scatter_pos].set(g_s, mode="drop")

    raw_count = (tile_end - tile_start).astype(jnp.int32)
    tile_count = jnp.minimum(raw_count, L)
    tile_overflow = jnp.max(raw_count - tile_count)

    return Binning(
        gauss_id=gauss_id,
        tile_count=tile_count,
        num_rendered=num_rendered,
        dup_overflow=dup_overflow,
        tile_overflow=tile_overflow,
        tile_max=jnp.max(raw_count),
    )


class FlatBinning(NamedTuple):
    """Aligned sorted-stream layout for the flat compositor
    (render/flat_stream.py): per-tile contiguous segments starting at
    FLAT_ALIGN multiples — the reference's identifyTileRanges layout
    (rasterizer_impl.cu:118-140) with alignment padding instead of a
    range table. No tile-depth capacity exists in this layout: any
    per-tile count within the duplicate capacity is represented."""

    gauss_flat: jnp.ndarray  # (K_pad,) int32 gaussian ids; -1 = padding
    chunk_tile: jnp.ndarray  # (K_pad/FLAT_ALIGN,) int32 owning tile
    num_rendered: jnp.ndarray  # () int32
    dup_overflow: jnp.ndarray  # () bool
    tile_max: jnp.ndarray  # () int32 deepest tile (occupancy metric)


def bin_gaussians_flat(
    rect: jnp.ndarray,
    depth_view: jnp.ndarray,
    valid: jnp.ndarray,
    config: RasterConfig,
    capacity: int,
    num_tiles: int | None = None,
) -> FlatBinning:
    """Build the aligned flat-stream layout (same expansion + sort as
    bin_gaussians; the dense (T, L) scatter is replaced by a scatter
    into per-tile aligned stream segments)."""
    from gftorf_tpu.render.flat_stream import FLAT_ALIGN, flat_stream_capacity

    P = rect.shape[0]
    T = num_tiles if num_tiles is not None else config.num_tiles
    A = FLAT_ALIGN
    K_pad = flat_stream_capacity(capacity, T)

    depth_key = jnp.where(valid, depth_view, jnp.inf).astype(jnp.float32)
    _, order = jax.lax.sort(
        (depth_key, jnp.arange(P, dtype=jnp.int32)), num_keys=1,
        is_stable=True,
    )
    rect = jnp.take(rect, order, axis=0)
    valid = jnp.take(valid, order)

    nx = rect[:, 2] - rect[:, 0]
    counts = jnp.where(valid, nx * (rect[:, 3] - rect[:, 1]), 0).astype(
        jnp.int32)
    cum = jnp.cumsum(counts)
    num_rendered = cum[-1]
    dup_overflow = num_rendered > capacity
    offsets = cum - counts

    slots = jnp.arange(capacity, dtype=jnp.int32)
    slot_valid = slots < num_rendered

    gids = jnp.arange(P, dtype=jnp.int32)
    seg = jnp.zeros((capacity,), jnp.int32).at[offsets].max(gids, mode="drop")
    g = jax.lax.cummax(seg)
    # start == offsets[g] (see bin_gaussians): gather replaces the
    # second scatter-max+cummax.
    within = slots - jnp.take(offsets, g, axis=0)

    packed = (
        rect[:, 0] | (rect[:, 1] << 8) | (jnp.maximum(nx, 1) << 16)
    ).astype(jnp.int32)
    pk = jnp.take(packed, g, axis=0)
    x0 = pk & 0xFF
    y0 = (pk >> 8) & 0xFF
    nxg = (pk >> 16) & 0xFF
    tile_x = x0 + within % nxg
    tile_y = y0 + within // nxg
    tile = tile_y * config.grid_w + tile_x
    tile = jnp.where(slot_valid, tile, T).astype(jnp.int32)

    tile_s, g_s = jax.lax.sort((tile, g), num_keys=1, is_stable=True)
    g_s = jnp.take(order, g_s, axis=0)

    tids = jnp.arange(T, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tids, side="left")
    tile_end = jnp.searchsorted(tile_s, tids, side="right")
    raw_count = (tile_end - tile_start).astype(jnp.int32)

    # Aligned segment bases: every tile gets at least one A-block (empty
    # tiles still must emit their bg-only output block).
    blocks_per_tile = jnp.maximum(1, -(-raw_count // A))
    base_block = jnp.cumsum(blocks_per_tile) - blocks_per_tile  # (T,)
    n_blocks = K_pad // A

    # Position within tile (scatter+cummax over the sorted stream).
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), tile_s[1:] != tile_s[:-1]]
    )
    head_pos = jnp.where(is_head, slots, 0)
    seg_start = jax.lax.cummax(head_pos)
    pos = slots - seg_start

    keep = tile_s < T
    dest = jnp.where(
        keep, jnp.take(base_block, jnp.minimum(tile_s, T - 1)) * A + pos,
        K_pad,
    )
    gauss_flat = jnp.full((K_pad,), -1, jnp.int32).at[dest].set(
        g_s, mode="drop"
    )

    # Block -> tile map: scatter each tile's index at its base block
    # (strictly increasing since blocks_per_tile >= 1), then cummax.
    # Tail blocks inherit the last tile — their rows are -1 padding.
    ct = jnp.zeros((n_blocks,), jnp.int32).at[base_block].max(
        tids, mode="drop"
    )
    chunk_tile = jax.lax.cummax(ct)

    return FlatBinning(
        gauss_flat=gauss_flat,
        chunk_tile=chunk_tile,
        num_rendered=num_rendered,
        dup_overflow=dup_overflow,
        tile_max=jnp.max(raw_count),
    )
