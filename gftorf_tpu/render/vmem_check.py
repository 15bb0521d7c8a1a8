"""Compiler-truth check of the backward kernel's VMEM feasibility.

`pallas_composite._BWD_CAP_CALIBRATED` is a point-in-time table measured
against a specific TPU toolchain; a compiler upgrade can silently
invalidate it in either direction (mid-campaign Mosaic crash, or wasted
headroom). `check_bwd_cap` AOT-lowers and compiles the real backward
pallas_call at a claimed-feasible max_per_tile — no chip execution, and
the persistent compilation cache (utils/runtime.py) makes repeat checks
near-free — so the Trainer can fail LOUDLY at startup with a
recalibration hint instead of crashing at an escalation mid-run (the
round-4 campaign lost a run segment to exactly that, aroom iter 2206).

The probe grid defaults to the realistic per-camera tile count for the
tile shape (~320x240 images): Mosaic's scoped-VMEM allocation grows
with grid multi-buffering, so tiny-grid probes under-measure
(tools/vmem_probe.py calibration notes).
"""

from __future__ import annotations

import functools
import re

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gftorf_tpu.render.settings import RasterConfig


def realistic_grid(pix: int) -> int:
    """Tiles per 320x240 image for a given tile-pixel count (the
    calibration protocol's grid)."""
    return max(4, (320 * 240) // pix)


def try_compile_bwd(tile_h: int, tile_w: int, chunk: int, L: int,
                    T: int = 0, need_dd: bool = True,
                    need_distribution: bool = True):
    """AOT lower+compile the backward kernel. Returns (ok, vmem_mb, msg)
    — vmem_mb parsed from the compiler error when available."""
    from gftorf_tpu.render.pallas_composite import _backward_kernel

    pix = tile_h * tile_w
    T = T or realistic_grid(pix)
    config = RasterConfig(height=tile_h * 2, width=tile_w * 2,
                          tile_h=tile_h, tile_w=tile_w, max_per_tile=L,
                          need_dd=need_dd,
                          need_distribution=need_distribution)
    kernel = functools.partial(_backward_kernel, config=config, chunk=chunk,
                               has_flow=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, L, 24), lambda t, c, o: (t, 0, 0)),
            pl.BlockSpec((1, pix, 12), lambda t, c, o: (t, 0, 0)),
            pl.BlockSpec((1, pix, 32), lambda t, c, o: (t, 0, 0)),
            pl.BlockSpec((1, pix, 32), lambda t, c, o: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, L, 24), lambda t, c, o: (t, 0, 0))],
    )

    def fn(counts, origins, feat, bg, out, g):
        (dfeat,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((T, L, 24), jnp.float32)],
        )(counts, origins, feat, bg, out, g)
        return dfeat

    args = (
        jax.ShapeDtypeStruct((T,), jnp.int32),
        jax.ShapeDtypeStruct((T, 2), jnp.int32),
        jax.ShapeDtypeStruct((T, L, 24), jnp.float32),
        jax.ShapeDtypeStruct((T, pix, 12), jnp.float32),
        jax.ShapeDtypeStruct((T, pix, 32), jnp.float32),
        jax.ShapeDtypeStruct((T, pix, 32), jnp.float32),
    )
    try:
        jax.jit(fn).lower(*args).compile()
        return True, None, "ok"
    except Exception as e:  # noqa: BLE001 - compiler errors vary
        msg = str(e)
        m = re.search(r"size ([0-9.]+)M and limit ([0-9.]+)M", msg)
        mb = float(m.group(1)) if m else None
        return False, mb, msg.splitlines()[0][:300]


def check_bwd_cap(tile_h: int, tile_w: int, cap: int,
                  need_dd: bool = True, need_distribution: bool = True,
                  chunk: int = 128) -> None:
    """Raise if the backward kernel no longer compiles at `cap` — the
    calibrated table is stale for this toolchain. TPU backend only (the
    scoped-VMEM limit is a Mosaic/TPU property)."""
    if jax.default_backend() != "tpu":
        return
    ok, mb, msg = try_compile_bwd(tile_h, tile_w, chunk, cap,
                                  need_dd=need_dd,
                                  need_distribution=need_distribution)
    if not ok:
        size = f" (compiler measured {mb}MB)" if mb is not None else ""
        raise RuntimeError(
            f"STALE VMEM CALIBRATION: the dense backward kernel no longer "
            f"compiles at max_per_tile={cap} for {tile_h}x{tile_w} tiles "
            f"(need_dd={need_dd}, need_distribution={need_distribution})"
            f"{size}. The compiler toolchain has changed since "
            f"_BWD_CAP_CALIBRATED was measured — re-run "
            f"`python tools/vmem_probe.py --tile {tile_h}x{tile_w} "
            f"--sweep` and update the table in "
            f"gftorf_tpu/render/pallas_composite.py.\nCompiler: {msg}"
        )
