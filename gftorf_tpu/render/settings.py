"""Rasterizer configuration and I/O containers.

Split into:
 - ``CameraSpec``: per-camera *traced* arrays (matrices, intrinsics,
   near/far, depth_range) — changing these does not recompile.
 - ``RasterConfig``: *static* hashable config (image size, tile shape,
   buffer capacities, feature flags) — part of the jit cache key.
 - ``RenderOutputs``: the rasterizer's outputs, matching the reference's
   tensor contract (rasterize_points.cu:80-98) minus the dead
   normal/entropy/amp-distortion buffers (always-zero in the reference).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from gftorf_tpu.ops.transforms import (
    camera_center,
    full_projection,
    fov2focal,
)


class CameraSpec(NamedTuple):
    """Traced camera parameters for one rasterization pass."""

    viewmatrix: jnp.ndarray  # (4,4) transposed world-to-view
    projmatrix: jnp.ndarray  # (4,4) transposed full (view @ proj)
    campos: jnp.ndarray  # (3,) camera center in world space
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar
    focal_x: jnp.ndarray  # scalar, pixels
    focal_y: jnp.ndarray  # scalar, pixels
    znear: jnp.ndarray  # scalar
    zfar: jnp.ndarray  # scalar
    depth_range: jnp.ndarray  # scalar; c/f of the ToF sensor

    @staticmethod
    def create(view_t, proj_t, width, height, fov_x, fov_y,
               znear=0.01, zfar=100.0, depth_range=100.0) -> "CameraSpec":
        """Build from a (transposed) view matrix and projection matrix."""
        view_t = np.asarray(view_t, np.float32)
        proj_t = np.asarray(proj_t, np.float32)
        full = full_projection(view_t, proj_t)
        tan_x = np.tan(fov_x * 0.5)
        tan_y = np.tan(fov_y * 0.5)
        return CameraSpec(
            viewmatrix=jnp.asarray(view_t),
            projmatrix=jnp.asarray(full),
            campos=jnp.asarray(camera_center(view_t)),
            tan_fovx=jnp.float32(tan_x),
            tan_fovy=jnp.float32(tan_y),
            focal_x=jnp.float32(width / (2.0 * tan_x)),
            focal_y=jnp.float32(height / (2.0 * tan_y)),
            znear=jnp.float32(znear),
            zfar=jnp.float32(zfar),
            depth_range=jnp.float32(depth_range),
        )


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (hashable; part of jit cache key)."""

    height: int
    width: int
    tile_h: int = 16
    tile_w: int = 16
    # Max depth-sorted instances composited per tile; deeper tiles are
    # truncated (reported via RenderOutputs.tile_overflow).
    max_per_tile: int = 1024
    # Capacity of the (gaussian, tile) duplicate list. The reference sizes
    # this exactly per step (rasterizer_impl.cu:311); we keep it static
    # for XLA and report overflow.
    dup_capacity: int = 0  # 0 -> derived as dup_factor * P at trace time
    dup_factor: int = 12
    sh_degree: int = 3  # max degree carried in the coefficient arrays
    use_view_dependent_phase: bool = False
    scale_modifier: float = 1.0
    # Number of tiles composited per lax.map step (memory / parallelism
    # tradeoff in the XLA compositor).
    tile_chunk: int = 32
    # Use the Pallas compositing kernel when available.
    use_pallas: bool = True
    # Flat sorted-stream compositor (render/flat_stream.py): consume the
    # depth-sorted duplicate stream directly instead of the dense
    # (T, max_per_tile) layout. Gather/scatter volume tracks
    # num_rendered, tile depth is unbounded (no truncation, no
    # max_per_tile VMEM ceiling). Pallas-path only.
    flat_stream: bool = False
    # Static channel gates. The training step disables what its loss
    # never reads so the compositing kernels skip the work (the
    # depth-distortion moments alone are three extra prefix scans per
    # depth chunk); eval/render paths keep the defaults. When off, the
    # corresponding RenderOutputs channel is exact zeros.
    need_dd: bool = True  # depth_distortion (train.py:266-267 window)
    need_distribution: bool = True  # first-sample stats (forward.cu:561-567)

    def __post_init__(self):
        # The Pallas kernels chunk the depth axis in 128-lane multiples
        # and slice blocks of max_per_tile; keep it lane-aligned.
        aligned = -(-self.max_per_tile // 128) * 128
        if aligned != self.max_per_tile:
            object.__setattr__(self, "max_per_tile", aligned)

    @property
    def grid_w(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def grid_h(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.grid_w * self.grid_h

    @property
    def tile_pixels(self) -> int:
        return self.tile_h * self.tile_w

    def capacity_for(self, num_points: int) -> int:
        if self.dup_capacity:
            return self.dup_capacity
        return max(1024, self.dup_factor * num_points)


class RenderOutputs(NamedTuple):
    """Rasterizer outputs (channel-first images like the reference)."""

    color: jnp.ndarray  # (3, H, W)
    phasor: jnp.ndarray  # (7, H, W) real/imag/amp + 4 quads
    depth: jnp.ndarray  # (1, H, W) composited dist-to-light
    acc: jnp.ndarray  # (1, H, W) accumulated alpha
    depth_distortion: jnp.ndarray  # (1, H, W)
    distribution: jnp.ndarray  # (3, H, W) first-sample (alpha, dist, amp)
    pixels: jnp.ndarray  # (P, 1) touched-pixel counts (not differentiated)
    radii: jnp.ndarray  # (P,) int32 screen radius, 0 = culled
    # Diagnostics (stop-gradient):
    num_rendered: jnp.ndarray  # () int32 total duplicated instances
    dup_overflow: jnp.ndarray  # () bool: duplicate capacity exceeded
    tile_overflow: jnp.ndarray  # () int32 max instances dropped in a tile
    tile_max: jnp.ndarray  # () int32 deepest tile occupancy (pre-clip)
    # Fused scene-flow channels (6, H, W), present when flow_precomp was
    # given: alpha*T-composited with DETACHED weights — the reference's
    # render_flow output without its extra rasterization passes.
    flow: Optional[jnp.ndarray] = None
    # Duplicate-capacity sizing basis: the instance total a SINGLE
    # device's buffer must be able to hold, scaled to global dup_factor
    # units. Single-device: == num_rendered. Sharded: worst shard's
    # local count x n_shards (per-shard capacity is capacity/n, and an
    # uneven tile-row load concentrates instances on one shard — sizing
    # from the psum'd total would undershoot it). None -> num_rendered.
    rendered_worst: Optional[jnp.ndarray] = None
