#!/usr/bin/env python
"""Real-TPU selftest: run the Pallas compositing kernels COMPILED (not
interpret-mode) and compare forward + gradients against the XLA
prefix-op path on identical inputs.

The pytest suite exercises Pallas only under interpret=True on CPU;
Mosaic-specific behavior (OOB dynamic slices, lowering gaps, MXU
precision defaults) only shows up compiled. Two cases:
  - standard: L=512 tiles (the FWD_CHUNK=512 / BWD_CHUNK=256 path)
  - deep: max_per_tile=4096 with large overlapping splats (the
    shrunk-chunk VMEM path taken after tile-cap escalation)

Run on the TPU host:

    python tools/tpu_selftest.py

Exit code 0 = parity; prints one JSON summary line.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(label: str, **scene_kwargs):
    from gftorf_tpu.data.synthetic import make_scene
    from gftorf_tpu.render.rasterize import rasterize

    flat = scene_kwargs.pop("_flat", False)
    sc = make_scene(jax.random.PRNGKey(0), **scene_kwargs)
    n = sc.means3d.shape[0]
    bg = jax.random.uniform(jax.random.PRNGKey(1),
                            (7, sc.config.height, sc.config.width))
    zeros2d = jnp.zeros((n, 2))
    flow3d = jax.random.normal(jax.random.PRNGKey(2), (n, 6))

    def run(use_pallas, flat=False):
        config = dataclasses.replace(sc.config, use_pallas=use_pallas,
                                     flat_stream=flat)

        def loss(means3d, scales, opac, flow):
            out = rasterize(
                means3d, scales, sc.rotations, opac, sc.shs, sc.shs_p,
                0.1, 0.02, zeros2d, bg, camera=sc.camera, config=config,
                flow_precomp=flow,
            )
            return (
                jnp.sum(out.color**2) + jnp.sum(out.phasor**2)
                + 0.3 * jnp.sum(out.depth) + jnp.sum(out.flow**2), out
            )

        (val, out), grads = jax.jit(
            jax.value_and_grad(loss, argnums=(0, 1, 2, 3), has_aux=True)
        )(sc.means3d, sc.scales, sc.opacities, flow3d)
        return (np.asarray(val), jax.tree.map(np.asarray, out),
                jax.tree.map(np.asarray, grads))

    v_x, out_x, g_x = run(False)
    v_p, out_p, g_p = run(True, flat=flat)

    errs = {}
    errs["loss_rel"] = float(abs(v_p - v_x) / (abs(v_x) + 1e-8))
    for name in ("color", "phasor", "depth", "acc", "flow"):
        a, b = getattr(out_x, name), getattr(out_p, name)
        errs[f"{name}_max"] = float(np.max(np.abs(a - b)))
    for g1, g2, name in zip(g_x, g_p, ("means3d", "scales", "opac", "flow")):
        # norm-relative + globally-scaled max-abs: the per-row relative
        # error is meaningless on near-zero gradient rows, and the /q
        # suffix subtractions legitimately reorder f32 accumulation
        errs[f"g_{name}_norm_rel"] = float(
            np.linalg.norm(g1 - g2) / (np.linalg.norm(g1) + 1e-12)
        )
        errs[f"g_{name}_max_scaled"] = float(
            np.max(np.abs(g1 - g2)) / (np.max(np.abs(g1)) + 1e-12)
        )

    ok = (
        errs["loss_rel"] < 1e-5
        and all(errs[f"{c}_max"] < 1e-4 for c in ("color", "phasor",
                                                  "depth", "acc", "flow"))
        and all(errs[f"g_{p}_norm_rel"] < 1e-3 for p in ("means3d",
                                                         "scales", "opac",
                                                         "flow"))
        and all(errs[f"g_{p}_max_scaled"] < 1e-2 for p in ("means3d",
                                                           "scales", "opac",
                                                           "flow"))
    )
    return ok, {f"{label}_{k}": round(v, 8) for k, v in errs.items()}


def main():
    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "reason":
                          f"backend={jax.default_backend()} (need tpu)"}))
        return 1

    ok1, e1 = check("std", num_points=4096, width=128, height=96,
                    max_per_tile=512, scale_range=(0.01, 0.05))
    ok2, e2 = check("deep", num_points=4096, width=64, height=48,
                    max_per_tile=4096, scale_range=(0.05, 0.3))
    # Flat sorted-stream kernels (render/flat_stream.py), incl. a deep
    # scene whose crowding the dense layout could only truncate.
    ok3, e3 = check("flat", num_points=4096, width=128, height=96,
                    max_per_tile=512, scale_range=(0.01, 0.05), _flat=True)
    ok4, e4 = check("flatdeep", num_points=4096, width=64, height=48,
                    max_per_tile=4096, scale_range=(0.05, 0.3), _flat=True)
    ok = bool(ok1 and ok2 and ok3 and ok4)
    print(json.dumps({"ok": ok, "backend": "tpu", **e1, **e2, **e3, **e4}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
