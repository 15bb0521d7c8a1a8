"""Multi-device rasterization and training via shard_map.

Decomposition (SURVEY §2.3: these are *new* components — the reference
is strictly single-GPU):

 1. **Primitive sharding (TP analog).** The P Gaussians are split across
    the ``shard`` axis; each device preprocesses P/n of them (cull,
    project, SH/phasor synthesis) and the compact per-Gaussian feature
    rows are all-gathered — the analog of gathering compacted visible
    sets. Collectives ride ICI.
 2. **Tile sharding (SP/CP analog).** The tile grid is row-sharded: each
    device bins and composites only its T/n tiles, with every Gaussian's
    tile rect clipped to the local tile range first so the duplicate
    list, sort, and (T/n, L) layout are all local-sized. This is the
    rasterizer's version of sequence parallelism — the "sequence" is the
    depth-sorted per-tile instance list.
 3. **Gradient reduction.** jax.grad through shard_map transposes the
    all-gather into a reduce-scatter/psum automatically, so per-Gaussian
    and MLP gradients are summed over devices deterministically.
 4. **Camera data parallelism** (``data`` axis): different training
    frames per slice with a final psum of parameter gradients — a
    batching knob the reference lacks (1 camera/iter, train.py:159).

The per-device compositor is the same prefix-op kernel as single-chip
(render/composite.py), so numerics are identical up to reduction order.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gftorf_tpu.render.binning import bin_gaussians
from gftorf_tpu.render.composite import (
    TileFeatures,
    composite_tiles,
    tiles_to_image,
)
from gftorf_tpu.render.preprocess import preprocess
from gftorf_tpu.render.settings import CameraSpec, RasterConfig, RenderOutputs


def _pad_to_multiple(x, m, axis=0):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def rasterize_sharded(
    means3d, scales, rotations, opacities, shs, shs_p,
    phase_offset, dc_offset, means2d_ndc, bg_map,
    camera: CameraSpec, config: RasterConfig,
    axis_name: str = "shard",
    active_sh_degree: int = 3,
    alive: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    phasors_precomp: Optional[jnp.ndarray] = None,
    flow_precomp: Optional[jnp.ndarray] = None,
):
    """Rasterize inside a shard_map context over `axis_name`.

    All inputs arrive REPLICATED (full arrays); the function internally
    splits work by the device's axis index and returns replicated
    outputs (images all-gathered at the end — they are small).
    """
    n_dev = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    P_total = means3d.shape[0]

    # ---- 1. primitive-sharded preprocess: slice my P/n rows.
    per = -(-P_total // n_dev)
    start = my * per

    def slice_rows(x):
        xp = _pad_to_multiple(x, per * n_dev, axis=0)
        return jax.lax.dynamic_slice_in_dim(xp, start, per, axis=0)

    pre_local = preprocess(
        slice_rows(means3d), slice_rows(scales), slice_rows(rotations),
        slice_rows(opacities.reshape(P_total)),
        slice_rows(shs) if shs is not None else None,
        slice_rows(shs_p) if shs_p is not None else None,
        phase_offset, dc_offset, slice_rows(means2d_ndc),
        camera, config, active_sh_degree,
        slice_rows(colors_precomp) if colors_precomp is not None else None,
        slice_rows(phasors_precomp) if phasors_precomp is not None else None,
    )
    if alive is not None:
        pre_local = pre_local._replace(
            valid=pre_local.valid & slice_rows(alive)
        )

    # ---- all-gather compact features (tiled=False -> concat on axis 0)
    pre = jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis_name, axis=0, tiled=True),
        pre_local,
    )

    # ---- 2. tile-row sharding: clip rects to my tile rows.
    rows = -(-config.grid_h // n_dev)
    row0 = my * rows
    local_grid_h = rows
    rect = jax.lax.stop_gradient(pre.rect)
    y0 = jnp.clip(rect[:, 1] - row0, 0, local_grid_h)
    y1 = jnp.clip(rect[:, 3] - row0, 0, local_grid_h)
    local_rect = jnp.stack([rect[:, 0], y0, rect[:, 2], y1], axis=-1)

    local_cfg = dataclasses.replace(
        config,
        height=rows * config.tile_h,
        width=config.width,
    )
    # Capacity per shard: full capacity / n_dev. An uneven tile-row load
    # (all Gaussians in one row band) can overflow a shard at 1/n of the
    # single-device threshold — dup_overflow below is pmaxed across
    # shards and rendered_worst reports the worst shard's need scaled to
    # global dup_factor units, so the Trainer's sized-to-need
    # grow-and-replay (train/loop.py _grow_and_replay) lands a factor
    # whose per-shard slice covers the deepest shard in one replay;
    # there is no silent-truncation path.
    capacity = max(1024, config.capacity_for(P_total) // n_dev)

    # local slice of the background map (pad rows to shard evenly)
    bg_p = jnp.pad(
        bg_map,
        ((0, 0), (0, rows * n_dev * config.tile_h - config.height), (0, 0)),
    )
    bg_local = jax.lax.dynamic_slice_in_dim(
        bg_p, row0 * config.tile_h, rows * config.tile_h, axis=1
    )

    # Global pixel-space tile origins for my local tile rows: mean2d is in
    # global pixel coords, and the inside test needs the global H/W.
    local_T = rows * config.grid_w
    t_local = jnp.arange(local_T, dtype=jnp.int32)
    tile_origins = jnp.stack(
        [
            (t_local % config.grid_w) * config.tile_w,
            (t_local // config.grid_w + row0) * config.tile_h,
        ],
        axis=-1,
    ).astype(jnp.float32)

    use_flat = (config.use_pallas and config.flat_stream
                and jax.default_backend() == "tpu")
    if use_flat:
        # Flat sorted-stream path: stream-sized gather, no tile-depth
        # capacity on the local tile rows (render/flat_stream.py).
        from gftorf_tpu.render.binning import bin_gaussians_flat
        from gftorf_tpu.render.flat_stream import composite_packed_flat
        from gftorf_tpu.render.pallas_composite import (
            pack_gaussian_features,
        )

        binning = bin_gaussians_flat(
            local_rect, jax.lax.stop_gradient(pre.depth_view), pre.valid,
            local_cfg, capacity, num_tiles=local_T,
        )
        ids = binning.gauss_flat
        idc = jnp.maximum(ids, 0)
        packed = pack_gaussian_features(
            pre,
            flow=(None if flow_precomp is None
                  else _pad_to_multiple(flow_precomp, per * n_dev)),
        )
        feat_fl = jnp.where(
            (ids >= 0)[:, None], jnp.take(packed, idc, axis=0), 0.0
        )
        out = composite_packed_flat(
            feat_fl, binning.chunk_tile, bg_local, config,
            tile_origins=tile_origins, num_tiles=local_T,
            has_flow=flow_precomp is not None,
        )
        tile_overflow = jnp.int32(0)
    else:
        binning = bin_gaussians(
            local_rect, jax.lax.stop_gradient(pre.depth_view), pre.valid,
            local_cfg, capacity,
        )
        ids = binning.gauss_id
        idc = jnp.maximum(ids, 0)
        feats = TileFeatures(
            gauss_id=ids,
            mean2d=jnp.take(pre.mean2d, idc, axis=0),
            conic=jnp.take(pre.conic, idc, axis=0),
            opacity=jnp.take(pre.opacity, idc, axis=0),
            rgb=jnp.take(pre.rgb, idc, axis=0),
            phasor=jnp.take(pre.phasor, idc, axis=0),
            dist=jnp.take(pre.dist, idc, axis=0),
            dist_ndc=jnp.take(pre.dist_ndc, idc, axis=0),
            # flow arrives replicated; pad rows like the gathered pre
            # arrays so instance ids (padded layout) line up.
            flow=(None if flow_precomp is None else jnp.take(
                _pad_to_multiple(flow_precomp, per * n_dev), idc, axis=0
            )),
        )
        tile_overflow = binning.tile_overflow

        if config.use_pallas and jax.default_backend() == "tpu":
            from gftorf_tpu.render.pallas_composite import (
                composite_tiles_pallas,
            )

            out = composite_tiles_pallas(
                feats, bg_local, config, tile_origins=tile_origins
            )
        else:
            out = composite_tiles(feats, bg_local, config,
                                  tile_origins=tile_origins)

    # ---- images: gather tile rows back to full height (replicated).
    def gather_img(tile_img):
        img = tiles_to_image(tile_img, local_cfg)  # (ch, rows*th, W)
        full = jax.lax.all_gather(img, axis_name, axis=1, tiled=True)
        return full[:, : config.height, :]

    pixels_local = jax.ops.segment_sum(
        out.contrib_pixels.reshape(-1), idc.reshape(-1), num_segments=P_total
    )
    pixels = jax.lax.psum(pixels_local, axis_name)

    radii_full = jax.lax.all_gather(
        jax.lax.stop_gradient(pre_local.radius), axis_name, axis=0, tiled=True
    )[:P_total]

    return RenderOutputs(
        color=gather_img(out.color),
        phasor=gather_img(out.phasor),
        depth=gather_img(out.depth),
        acc=gather_img(out.acc),
        depth_distortion=gather_img(out.dd),
        distribution=gather_img(out.distribution),
        pixels=pixels[:, None],
        radii=radii_full.astype(jnp.int32),
        num_rendered=jax.lax.psum(binning.num_rendered, axis_name),
        dup_overflow=jax.lax.pmax(
            binning.dup_overflow.astype(jnp.int32), axis_name
        ).astype(bool),
        tile_overflow=jax.lax.pmax(tile_overflow, axis_name),
        tile_max=jax.lax.pmax(binning.tile_max, axis_name),
        flow=None if flow_precomp is None else gather_img(out.flow),
        rendered_worst=jax.lax.pmax(binning.num_rendered, axis_name) * n_dev,
    )
