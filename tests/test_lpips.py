"""End-to-end LPIPS validation (VERDICT r3 item 7).

Two claims are proven here without network egress:

1. `tools/convert_lpips_weights.py` actually works: it is run against a
   synthetically-constructed torch checkpoint shaped exactly like the
   `lpips` pip package it expects (model.net.slice1..5 AlexNet trunk +
   lin0..4 heads with .model[-1] 1x1 convs), and the emitted npz has the
   schema `gftorf_tpu.utils.metrics.lpips` consumes.

2. The jnp LPIPS matches the reference's torch implementation
   (/root/reference/lpipsPyTorch/modules/{lpips,networks,utils}.py) on
   the same weights: torchvision-AlexNet feature trunk tapped at the 5
   relu outputs (networks.py AlexNet.target_layers [2,5,8,10,12]),
   z-score with the richzhang shift/scale buffers (networks.py BaseNet),
   unit channel-norm of activations (utils.py normalize_activation),
   1x1 bias-free linear heads then spatial mean (lpips.py LPIPS.forward).

Input convention: our lpips() takes [0,1] images and applies the
[0,1]->[-1,1] map internally; the reference module (as written) is fed
[-1,1] richzhang-convention inputs, so the torch side here gets x*2-1.
"""

import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

from gftorf_tpu.utils import metrics

# torchvision models.alexnet(...).features architecture (the trunk the
# reference's networks.py AlexNet wraps): convs (out, in, k, stride,
# pad) with relu after each and maxpool(3,2) after relus 1, 2 and 5.
_ALEX_CONVS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_LIN_CHANNELS = [64, 192, 384, 256, 256]


def _make_alex_features(rng: torch.Generator) -> nn.Sequential:
    layers = []
    for i, (co, ci, k, s, p) in enumerate(_ALEX_CONVS):
        conv = nn.Conv2d(ci, co, k, stride=s, padding=p)
        with torch.no_grad():
            conv.weight.copy_(
                torch.randn(conv.weight.shape, generator=rng) * 0.1
            )
            conv.bias.copy_(torch.randn(conv.bias.shape, generator=rng) * 0.1)
        layers.append(conv)
        layers.append(nn.ReLU(inplace=False))
        if i in (0, 1, 4):
            layers.append(nn.MaxPool2d(3, 2))
    return nn.Sequential(*layers)


class _RefLPIPS(nn.Module):
    """The reference lpipsPyTorch module rebuilt from its spec
    (modules/lpips.py LPIPS + modules/networks.py AlexNet/BaseNet +
    modules/utils.py normalize_activation), weights injected."""

    # networks.py BaseNet mean/std buffers
    SHIFT = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    SCALE = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
    TARGET_LAYERS = [2, 5, 8, 10, 12]  # networks.py AlexNet

    def __init__(self, features: nn.Sequential, lins):
        super().__init__()
        self.features = features
        self.lins = nn.ModuleList(lins)

    def forward(self, x, y):
        def feats(z):
            z = (z - self.SHIFT) / self.SCALE  # BaseNet.z_score
            out = []
            for i, layer in enumerate(self.features, 1):
                z = layer(z)
                if i in self.TARGET_LAYERS:
                    n = torch.sqrt(torch.sum(z**2, dim=1, keepdim=True))
                    out.append(z / (n + 1e-10))  # normalize_activation
            return out

        fx, fy = feats(x), feats(y)
        diff = [(a - b) ** 2 for a, b in zip(fx, fy)]
        res = [l(d).mean((2, 3), True) for d, l in zip(diff, self.lins)]
        return torch.sum(torch.cat(res, 0), 0, True)


def _fake_lpips_package(features: nn.Sequential, lins):
    """A module shaped like the `lpips` pip package for the converter:
    LPIPS().net.slice1..5 hold the conv trunk, .lin0..4 hold heads with
    .model[-1] the 1x1 conv (richzhang NetLinLayer layout)."""
    # torchvision feature indices per slice in the richzhang package:
    # slice1 = [0:2), slice2 = [2:5), slice3 = [5:8), slice4 = [8:10),
    # slice5 = [10:12) — one conv per slice.
    bounds = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)]
    net = types.SimpleNamespace()
    for i, (a, b) in enumerate(bounds):
        setattr(net, f"slice{i + 1}", nn.Sequential(*list(features[a:b])))

    model = types.SimpleNamespace(net=net)
    for i, lin in enumerate(lins):
        head = types.SimpleNamespace(model=nn.Sequential(nn.Identity(), lin))
        setattr(model, f"lin{i}", head)
    model.eval = lambda: None

    pkg = types.ModuleType("lpips")
    pkg.LPIPS = lambda net="alex", version="0.1": model
    return pkg


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    rng = torch.Generator().manual_seed(7)
    features = _make_alex_features(rng)
    lins = []
    for c in _LIN_CHANNELS:
        lin = nn.Conv2d(c, 1, 1, bias=False)
        with torch.no_grad():  # LPIPS linear heads are non-negative
            lin.weight.copy_(
                torch.rand(lin.weight.shape, generator=rng) * 0.2
            )
        lins.append(lin)

    out = tmp_path_factory.mktemp("lpips") / "lpips_alex.npz"
    sys.modules["lpips"] = _fake_lpips_package(features, lins)
    old_argv = sys.argv
    sys.argv = ["convert_lpips_weights.py", "--out", str(out)]
    try:
        import tools.convert_lpips_weights as conv

        conv.main()
    finally:
        sys.argv = old_argv
        del sys.modules["lpips"]
    return features, lins, out


def test_converter_schema(converted):
    features, lins, out = converted
    npz = np.load(out)
    for i, (co, ci, k, _, _) in enumerate(_ALEX_CONVS):
        assert npz[f"conv{i}_w"].shape == (co, ci, k, k)
        assert npz[f"conv{i}_b"].shape == (co,)
        assert npz[f"lin{i}_w"].shape == (1, _LIN_CHANNELS[i], 1, 1)
    # weights round-trip exactly
    conv0 = [m for m in features if isinstance(m, nn.Conv2d)][0]
    np.testing.assert_array_equal(
        npz["conv0_w"], conv0.weight.detach().numpy()
    )


def test_lpips_matches_reference_torch(converted):
    features, lins, out = converted
    ref = _RefLPIPS(features, lins).eval()

    rng = np.random.default_rng(3)
    img1 = rng.uniform(size=(3, 64, 64)).astype(np.float32)
    img2 = np.clip(
        img1 + rng.normal(scale=0.1, size=img1.shape).astype(np.float32),
        0.0, 1.0,
    )

    with torch.no_grad():
        tx = torch.from_numpy(img1)[None] * 2.0 - 1.0
        ty = torch.from_numpy(img2)[None] * 2.0 - 1.0
        want = float(ref(tx, ty).squeeze())

    got = float(metrics.lpips(img1, img2, weights_path=str(out)))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-6)
    assert metrics.lpips_available(str(out))

    # identical images -> exactly zero distance
    same = float(metrics.lpips(img1, img1, weights_path=str(out)))
    assert same == pytest.approx(0.0, abs=1e-8)
