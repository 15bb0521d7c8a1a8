#!/usr/bin/env python
"""Convert LPIPS (alex, v0.1) weights to the npz schema consumed by
gftorf_tpu.utils.metrics.lpips.

Run this on a machine WITH network access / the `lpips` + `torchvision`
packages installed (this build image has neither, so the converted file
must be copied in and pointed to via GFTORF_LPIPS_WEIGHTS):

    pip install lpips torchvision
    python tools/convert_lpips_weights.py --out lpips_alex.npz

Schema: conv{0..4}_w (OIHW f32), conv{0..4}_b, lin{0..4}_w
((1, C, 1, 1) non-negative linear heads). Mirrors the feature taps the
reference uses (lpipsPyTorch/modules/networks.py AlexNet slices at the
five relu outputs).
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_alex.npz")
    args = ap.parse_args()

    import lpips as lpips_pkg  # type: ignore
    import torch

    model = lpips_pkg.LPIPS(net="alex", version="0.1")
    model.eval()

    out = {}
    # AlexNet trunk: features module indices of the 5 conv layers.
    convs = [m for m in model.net.slice1.modules()] \
        + [m for m in model.net.slice2.modules()] \
        + [m for m in model.net.slice3.modules()] \
        + [m for m in model.net.slice4.modules()] \
        + [m for m in model.net.slice5.modules()]
    convs = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, f"expected 5 convs, got {len(convs)}"
    for i, c in enumerate(convs):
        out[f"conv{i}_w"] = c.weight.detach().numpy().astype(np.float32)
        out[f"conv{i}_b"] = c.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate([model.lin0, model.lin1, model.lin2,
                             model.lin3, model.lin4]):
        w = lin.model[-1].weight.detach().numpy().astype(np.float32)
        out[f"lin{i}_w"] = w.reshape(1, -1, 1, 1)

    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(
        f"{k}{v.shape}" for k, v in sorted(out.items())
    ))


if __name__ == "__main__":
    main()
