#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Default = the END-TO-END training step at the reference's workload
(320x240, 50k pts, quads+deform+flow; baseline 180 ms/iter = 20k iters
in <=3600 s on an RTX 3090, BASELINE.md) — delegates to bench_train.py.
`--rasterizer` runs the raw rasterizer fwd+bwd throughput bench instead
(baseline ~0.9 Mpix/s on the 3090 envelope).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MPIX_S = 0.9


def main():
    if "--rasterizer" not in sys.argv:
        from bench_train import main as train_main

        # forward remaining CLI flags to bench_train's parser
        sys.argv = [sys.argv[0]] + [a for a in sys.argv[1:]
                                    if a != "--rasterizer"]
        return train_main()
    from gftorf_tpu.data.synthetic import make_scene
    from gftorf_tpu.render.rasterize import rasterize

    width, height = 640, 480
    num_points = 100_000
    # Realistic 3DGS footprint: a few pixels radius -> ~1-6 tiles touched
    # per Gaussian (the default synthetic scales are film-the-wall huge).
    sc = make_scene(
        jax.random.PRNGKey(0), num_points=num_points, width=width,
        height=height, max_per_tile=1024, scale_range=(0.004, 0.02),
        dup_factor=8,
    )
    n = sc.means3d.shape[0]
    bg = jnp.zeros((7, height, width))
    zeros2d = jnp.zeros((n, 2))

    def loss_fn(means3d, scales, rotations, opacities, shs, shs_p):
        out = rasterize(
            means3d, scales, rotations, opacities, shs, shs_p,
            0.0, 0.0, zeros2d, bg, camera=sc.camera, config=sc.config,
        )
        return (
            jnp.sum(out.color**2)
            + jnp.sum(out.phasor**2)
            + jnp.sum(out.depth**2)
        )

    # Dependency-chain the iterations (feed the gradient back into the
    # means) so the tunnel runtime cannot overlap or elide dispatches;
    # fetch a scalar at the end to force completion.
    @jax.jit
    def step(means3d):
        g = jax.grad(loss_fn, argnums=0)(
            means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p
        )
        return means3d - 0.0 * g

    import numpy as np

    m = step(sc.means3d)
    np.asarray(m[0])  # force

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        m = step(m)
    np.asarray(m[0])
    dt = (time.perf_counter() - t0) / iters

    mpix_s = (width * height) / dt / 1e6
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_640x480_100k",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
    }))


if __name__ == "__main__":
    main()
