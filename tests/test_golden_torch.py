"""Golden tests against independent torch implementations of the
reference's building blocks: DeformNetwork (utils/time_utils.py:56-127),
SSIM (utils/loss_utils.py:74-114) and the lr schedule
(utils/general_utils.py:41-75). The torch models here are built from the
reference's *spec* and the jax weights are copied in, so any numerical
drift in the jax ports fails these tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gftorf_tpu.models.deform import DeformConfig, apply_deform, init_deform
from gftorf_tpu.train import losses as L
from gftorf_tpu.train.schedule import expon_lr


class TorchDeform(torch.nn.Module):
    """Reference DeformNetwork: positional-encoded (xyz, t) through a
    ReLU MLP with a post-activation skip concat at layer D//2, linear
    heads for d_xyz and per-channel SH deltas."""

    def __init__(self, cfg: DeformConfig):
        super().__init__()
        self.cfg = cfg
        in_dim = cfg.xyz_in + cfg.t_in
        dims = []
        prev = in_dim
        for i in range(cfg.depth):
            if i == cfg.skip + 1:
                prev = cfg.width + in_dim
            dims.append((prev, cfg.width))
            prev = cfg.width
        self.linear = torch.nn.ModuleList(
            [torch.nn.Linear(a, b) for a, b in dims]
        )
        self.heads = torch.nn.ModuleDict({
            name: torch.nn.Linear(cfg.width, cfg.num_shs if name in "rgb"
                                  else 3)
            for name in ("xyz", "r", "g", "b")
        })

    @staticmethod
    def embed(x, multires):
        outs = [x]
        for k in range(multires):
            outs += [torch.sin(x * 2.0**k), torch.cos(x * 2.0**k)]
        return torch.cat(outs, dim=-1)

    def forward(self, xyz, t):
        x_emb = self.embed(xyz, self.cfg.xyz_multires)
        t_emb = self.embed(t, self.cfg.t_multires)
        h = torch.cat([x_emb, t_emb], dim=-1)
        for i, lin in enumerate(self.linear):
            h = F.relu(lin(h))
            if i == self.cfg.skip and i + 1 < self.cfg.depth:
                h = torch.cat([x_emb, t_emb, h], dim=-1)
        d_xyz = self.heads["xyz"](h)
        d_sh = torch.stack(
            [self.heads[n](h) for n in ("r", "g", "b")], dim=-1
        )
        return d_xyz, d_sh


def test_deform_mlp_matches_torch():
    cfg = DeformConfig(depth=4, width=64, xyz_multires=4, t_multires=3,
                       sh_degree=2)
    params = init_deform(jax.random.PRNGKey(0), cfg)
    # scale the near-zero heads up so the comparison carries signal
    params = params._replace(
        head_w={k: w * 1e4 for k, w in params.head_w.items()}
    )

    tm = TorchDeform(cfg)
    with torch.no_grad():
        for i, lin in enumerate(tm.linear):
            lin.weight.copy_(torch.tensor(np.asarray(params.hidden_w[i]).T))
            lin.bias.copy_(torch.tensor(np.asarray(params.hidden_b[i])))
        for name in ("xyz", "r", "g", "b"):
            tm.heads[name].weight.copy_(
                torch.tensor(np.asarray(params.head_w[name]).T)
            )
            tm.heads[name].bias.copy_(
                torch.tensor(np.asarray(params.head_b[name]))
            )

    key = jax.random.PRNGKey(3)
    xyz = jax.random.normal(key, (57, 3))
    t = jax.random.uniform(jax.random.fold_in(key, 1), (57, 1))
    d_xyz_j, _, d_sh_j, _ = apply_deform(params, cfg, xyz, t)
    with torch.no_grad():
        d_xyz_t, d_sh_t = tm(
            torch.tensor(np.asarray(xyz)), torch.tensor(np.asarray(t))
        )
    np.testing.assert_allclose(
        np.asarray(d_xyz_j), d_xyz_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_sh_j), d_sh_t.numpy(), rtol=1e-4, atol=1e-5
    )


def _torch_ssim(img1, img2, window_size=11, sigma=1.5):
    """Reference SSIM (loss_utils.py:74-114): 2-D gaussian depthwise
    window, constant C1/C2, mean over the map."""
    c = img1.shape[-3]
    xs = torch.arange(window_size, dtype=torch.float32)
    g = torch.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g = (g / g.sum()).unsqueeze(1)
    win = (g @ g.t()).expand(c, 1, window_size, window_size).contiguous()

    def conv(x):
        return F.conv2d(x, win, padding=window_size // 2, groups=c)

    mu1, mu2 = conv(img1), conv(img2)
    s1 = conv(img1 * img1) - mu1**2
    s2 = conv(img2 * img2) - mu2**2
    s12 = conv(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    return m.mean()


def test_ssim_matches_torch():
    key = jax.random.PRNGKey(5)
    a = jax.random.uniform(key, (3, 24, 32))
    b = jnp.clip(a + 0.1 * jax.random.normal(jax.random.fold_in(key, 1),
                                             (3, 24, 32)), 0, 1)
    got = float(L.ssim(a, b))
    want = float(_torch_ssim(
        torch.tensor(np.asarray(a))[None], torch.tensor(np.asarray(b))[None]
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # identical images -> SSIM 1
    np.testing.assert_allclose(float(L.ssim(a, a)), 1.0, atol=1e-6)


def test_ssim_conv_and_banded_impls_agree():
    """The GFTORF_SSIM_IMPL A/B escape hatch (losses._SSIM_IMPL) must be
    a pure lowering choice: both window-sum lowerings of the same
    zero-padded separable Gaussian, agreeing to f32 rounding. Gradients
    too — the knob exists to attribute training-curve differences, so
    any real gradient gap would defeat its purpose."""
    key = jax.random.PRNGKey(7)
    a = jax.random.uniform(key, (4, 30, 40))
    b = jnp.clip(a + 0.1 * jax.random.normal(jax.random.fold_in(key, 2),
                                             (4, 30, 40)), 0, 1)
    orig = L._SSIM_IMPL
    try:
        L._SSIM_IMPL = "banded"
        v1, g1 = jax.value_and_grad(lambda x: L.ssim(x, b))(a)
        L._SSIM_IMPL = "conv"
        v2, g2 = jax.value_and_grad(lambda x: L.ssim(x, b))(a)
    finally:
        L._SSIM_IMPL = orig
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-7)


def test_expon_lr_matches_reference_formula():
    """get_expon_lr_func (general_utils.py:41-75) evaluated inline."""
    cases = [
        dict(lr_init=1.6e-4, lr_final=1.6e-6, lr_delay_steps=0,
             lr_delay_mult=1.0, max_steps=30000),
        dict(lr_init=1e-3, lr_final=1e-5, lr_delay_steps=500,
             lr_delay_mult=0.1, max_steps=10000),
        dict(lr_init=0.0, lr_final=0.0, lr_delay_steps=0,
             lr_delay_mult=1.0, max_steps=100),
    ]
    for kw in cases:
        for step in (-5, 0, 1, 250, 500, 5000, 10000, 30000, 50000):
            got = expon_lr(step, **kw)
            # reference formula
            if step < 0 or (kw["lr_init"] == 0.0 and kw["lr_final"] == 0.0):
                want = 0.0
            else:
                if kw["lr_delay_steps"] > 0:
                    delay = kw["lr_delay_mult"] + (
                        1 - kw["lr_delay_mult"]
                    ) * math.sin(
                        0.5 * math.pi
                        * min(max(step / kw["lr_delay_steps"], 0.0), 1.0)
                    )
                else:
                    delay = 1.0
                tt = min(max(step / kw["max_steps"], 0.0), 1.0)
                want = delay * math.exp(
                    math.log(kw["lr_init"]) * (1 - tt)
                    + math.log(kw["lr_final"]) * tt
                )
            np.testing.assert_allclose(got, want, rtol=1e-12,
                                       err_msg=f"{kw} step={step}")
