#!/usr/bin/env python
"""Calibrate the Pallas backward kernel's scoped-VMEM footprint against
the REAL TPU compiler (AOT; no chip execution), because the analytic
budget model in pallas_composite._bwd_pref mispredicted: at
(pix=256, CL=128, L=6016) the compiler measured 16.62MB where the model
said ~9.5MB (campaign crash 2026-08-20, aroom iter 3859).

For each (tile_h, tile_w, chunk) this lowers+compiles the backward
pallas_call at increasing L and reports the measured scoped-VMEM size
parsed from the compiler (success prints the boundary; failures carry
the size in the error text). Results feed the _bwd_pref budget table.

Usage: python tools/vmem_probe.py [--tile 16x16] [--chunk 128] \
           [--Ls 4096,4608,5120,5632,6016]
"""

from __future__ import annotations

import argparse
import functools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gftorf_tpu.render.pallas_composite import _backward_kernel
from gftorf_tpu.render.settings import RasterConfig


def try_compile(tile_h: int, tile_w: int, chunk: int, L: int, T: int = 4):
    """Returns (ok, vmem_mb or None, message)."""
    pix = tile_h * tile_w
    config = RasterConfig(height=tile_h * 2, width=tile_w * 2,
                          tile_h=tile_h, tile_w=tile_w, max_per_tile=L)
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
        return False, mb, msg.splitlines()[0][:200]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", default="16x16")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--Ls", default="4096,4608,5120,5632,6016")
    args = ap.parse_args()
    th, tw = (int(v) for v in args.tile.split("x"))
    for L in (int(v) for v in args.Ls.split(",")):
        ok, mb, msg = try_compile(th, tw, args.chunk, L)
        size = f" vmem={mb}MB" if mb is not None else ""
        print(f"tile={th}x{tw} chunk={args.chunk} L={L}: "
              f"{'OK' if ok else 'OVERFLOW'}{size}  {'' if ok else msg[:120]}",
              flush=True)


if __name__ == "__main__":
    main()
