"""Device mesh construction for multi-chip training.

Axes:
 - ``data``:  camera/view parallelism — each slice renders different
   training cameras per step, gradients all-reduced (the reference
   processes exactly one camera per iteration, train.py:159; batching
   across ``data`` is the DP analog).
 - ``shard``: primitive/tile parallelism inside one render — Gaussians
   are sharded for preprocessing (TP analog) and the tile grid is
   row-sharded for compositing (the SP analog for a rasterizer; see
   SURVEY §2.3/§5).

On a real slice, XLA maps collectives over ICI automatically given the
mesh; multi-host runs call jax.distributed.initialize before this.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
from jax.sharding import Mesh


@functools.lru_cache(maxsize=8)
def cached_mesh(data: int, shard: int) -> Mesh:
    """Process-wide mesh cache so jitted steps can build a mesh during
    trace without re-enumerating devices each call."""
    return make_mesh(data=data, shard=shard)


def make_mesh(data: int = 1, shard: int = -1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shard == -1:
        shard = n // data
    if data * shard > n:
        raise ValueError(f"mesh {data}x{shard} needs {data*shard} devices, have {n}")
    dev = np.array(devices[: data * shard]).reshape(data, shard)
    return Mesh(dev, axis_names=("data", "shard"))
