"""Top-level differentiable rasterizer: preprocess -> bin -> composite.

Public equivalent of the reference's `GaussianRasterizer.forward`
(diff_gaussian_rasterization_w_tof/__init__.py:226-269 and the CUDA
`Rasterizer::forward`, rasterizer_impl.cu:215-377), returning the same
logical outputs (RenderOutputs). The whole function is differentiable
end-to-end by jax.grad; the binning stage is integer bookkeeping under
stop_gradient exactly like the reference's sort.

Gradients w.r.t. `means2d_ndc` (a zeros input) reproduce the reference's
dL_dmean2D densification signal in NDC convention (backward.cu:876-877
with the 0.5*W/H factors folded in).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gftorf_tpu.render.binning import bin_gaussians
from gftorf_tpu.render.composite import (
    TileFeatures,
    composite_tiles,
    tiles_to_image,
)
from gftorf_tpu.render.preprocess import preprocess
from gftorf_tpu.render.settings import CameraSpec, RasterConfig, RenderOutputs


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    shs_p: Optional[jnp.ndarray],
    phase_offset,
    dc_offset,
    means2d_ndc: jnp.ndarray,
    bg_map: jnp.ndarray,
    camera: CameraSpec,
    config: RasterConfig,
    active_sh_degree: int = 3,
    colors_precomp: Optional[jnp.ndarray] = None,
    phasors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    flow_precomp: Optional[jnp.ndarray] = None,
) -> RenderOutputs:
    P = means3d.shape[0]
    pre = preprocess(
        means3d, scales, rotations, opacities, shs, shs_p,
        phase_offset, dc_offset, means2d_ndc, camera, config,
        active_sh_degree, colors_precomp, phasors_precomp, cov3d_precomp,
    )

    capacity = config.capacity_for(P)

    if (config.use_pallas and config.flat_stream
            and jax.default_backend() == "tpu"):
        return _rasterize_flat(pre, bg_map, config, capacity, P,
                               flow_precomp)

    binning = bin_gaussians(
        jax.lax.stop_gradient(pre.rect),
        jax.lax.stop_gradient(pre.depth_view),
        pre.valid,
        config,
        capacity,
    )

    ids = binning.gauss_id
    idc = jnp.maximum(ids, 0)

    if config.use_pallas and jax.default_backend() == "tpu":
        from gftorf_tpu.render.pallas_composite import (
            composite_packed_pallas,
            pack_gaussian_features,
        )

        # Single instance gather of one packed feature matrix (random
        # gathers are the expensive primitive on TPU); the kernel consumes
        # the gather-order (T, L, 24) layout directly.
        packed = pack_gaussian_features(pre, flow=flow_precomp)  # (P, 24)
        T, L = ids.shape
        packed_tl = jnp.take(packed, idc.reshape(-1), axis=0).reshape(T, L, 24)
        out = composite_packed_pallas(packed_tl, ids, bg_map, config,
                                      has_flow=flow_precomp is not None)
    else:
        feats = TileFeatures(
            gauss_id=ids,
            mean2d=jnp.take(pre.mean2d, idc, axis=0),
            conic=jnp.take(pre.conic, idc, axis=0),
            opacity=jnp.take(pre.opacity, idc, axis=0),
            rgb=jnp.take(pre.rgb, idc, axis=0),
            phasor=jnp.take(pre.phasor, idc, axis=0),
            dist=jnp.take(pre.dist, idc, axis=0),
            dist_ndc=jnp.take(pre.dist_ndc, idc, axis=0),
            flow=(None if flow_precomp is None
                  else jnp.take(flow_precomp, idc, axis=0)),
        )
        out = composite_tiles(feats, bg_map, config)

    # Per-Gaussian touched-pixel counts: deterministic segment-sum over the
    # instance list (replaces atomicAdd at forward.cu:629).
    pixels = jax.ops.segment_sum(
        out.contrib_pixels.reshape(-1), idc.reshape(-1), num_segments=P
    )

    return RenderOutputs(
        color=tiles_to_image(out.color, config),
        phasor=tiles_to_image(out.phasor, config),
        depth=tiles_to_image(out.depth, config),
        acc=tiles_to_image(out.acc, config),
        depth_distortion=tiles_to_image(out.dd, config),
        distribution=tiles_to_image(out.distribution, config),
        pixels=pixels[:, None],
        radii=jax.lax.stop_gradient(pre.radius).astype(jnp.int32),
        num_rendered=binning.num_rendered,
        dup_overflow=binning.dup_overflow,
        tile_overflow=binning.tile_overflow,
        tile_max=binning.tile_max,
        rendered_worst=binning.num_rendered,
        flow=(None if flow_precomp is None
              else tiles_to_image(out.flow, config)),
    )


def _rasterize_flat(pre, bg_map, config: RasterConfig, capacity: int, P: int,
                    flow_precomp, interpret: bool = False):
    """Flat sorted-stream path (render/flat_stream.py): the feature
    gather, compositing and backward scatter are all sized to the
    duplicate capacity instead of T*max_per_tile, and tile depth is
    unbounded (tile_overflow is identically 0)."""
    from gftorf_tpu.render.binning import bin_gaussians_flat
    from gftorf_tpu.render.flat_stream import composite_packed_flat
    from gftorf_tpu.render.pallas_composite import pack_gaussian_features

    binning = bin_gaussians_flat(
        jax.lax.stop_gradient(pre.rect),
        jax.lax.stop_gradient(pre.depth_view),
        pre.valid,
        config,
        capacity,
    )
    ids = binning.gauss_flat
    idc = jnp.maximum(ids, 0)
    packed = pack_gaussian_features(pre, flow=flow_precomp)  # (P, 24)
    # Padding rows must be all-zero (opacity 0 -> dead lanes); the
    # select fuses into the gather.
    feat_fl = jnp.where(
        (ids >= 0)[:, None], jnp.take(packed, idc, axis=0), 0.0
    )
    out = composite_packed_flat(
        feat_fl, binning.chunk_tile, bg_map, config,
        interpret=interpret, has_flow=flow_precomp is not None,
    )
    pixels = jax.ops.segment_sum(out.contrib_pixels, idc, num_segments=P)

    return RenderOutputs(
        color=tiles_to_image(out.color, config),
        phasor=tiles_to_image(out.phasor, config),
        depth=tiles_to_image(out.depth, config),
        acc=tiles_to_image(out.acc, config),
        depth_distortion=tiles_to_image(out.dd, config),
        distribution=tiles_to_image(out.distribution, config),
        pixels=pixels[:, None],
        radii=jax.lax.stop_gradient(pre.radius).astype(jnp.int32),
        num_rendered=binning.num_rendered,
        dup_overflow=binning.dup_overflow,
        tile_overflow=jnp.int32(0),
        tile_max=binning.tile_max,
        rendered_worst=binning.num_rendered,
        flow=(None if flow_precomp is None
              else tiles_to_image(out.flow, config)),
    )
