"""Per-frame deformation MLP for dynamic (F-ToRF) scenes.

Functional reimplementation of DeformNetwork
(/root/reference/utils/time_utils.py:56-127 and scene/deform_model.py):
positional-encoded (xyz, t) -> 8x256 ReLU MLP with a skip connection at
depth D/2 -> heads for d_xyz, d_rot and per-channel SH deltas. The
reference zeroes d_rot and the (phase, amp) SH deltas at the output
(time_utils.py:121-127), so only d_xyz and the RGB SH deltas carry
gradients; we keep all head parameters (for checkpoint parity) but only
evaluate the live ones.

Near-zero head init (std=1e-5) makes the network start as the identity
deformation.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class DeformConfig(NamedTuple):
    depth: int = 8
    width: int = 256
    xyz_multires: int = 10
    t_multires: int = 10
    sh_degree: int = 3
    isotropic: bool = False
    xavier_init_dxyz: bool = False
    # MXU precision of the MLP matmuls. "highest" = 6-pass bf16 (f32
    # equivalent, matches the reference's fp32 torch MLP); "high" /
    # "default" trade passes for speed (TpuParams.deform_precision).
    precision: str = "highest"

    @property
    def skip(self):
        return self.depth // 2

    @property
    def xyz_in(self):
        return 3 + 3 * 2 * self.xyz_multires

    @property
    def t_in(self):
        return 1 + 2 * self.t_multires

    @property
    def num_shs(self):
        return (1 + self.sh_degree) ** 2


class DeformParams(NamedTuple):
    hidden_w: tuple  # depth x (in, W)
    hidden_b: tuple  # depth x (W,)
    head_w: dict  # name -> (W, out)
    head_b: dict  # name -> (out,)


def _embed(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """NeRF positional encoding: [x, sin(2^k x), cos(2^k x)] for k<multires
    (time_utils.py:8-53, include_input=True, log sampling)."""
    outs = [x]
    for k in range(multires):
        f = 2.0**k
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def _xavier_normal(key, shape):
    # torch.nn.init.xavier_normal_: std = sqrt(2 / (fan_in + fan_out))
    std = math.sqrt(2.0 / (shape[0] + shape[1]))
    return std * jax.random.normal(key, shape)


def init_deform(key, config: DeformConfig = DeformConfig()) -> DeformParams:
    in_dim = config.xyz_in + config.t_in
    ks = jax.random.split(key, config.depth + 6)
    hw, hb = [], []
    prev = in_dim
    for i in range(config.depth):
        if i == config.skip + 1:
            prev = config.width + in_dim
        hw.append(_xavier_normal(ks[i], (prev, config.width)))
        hb.append(jnp.zeros((config.width,)))
        prev = config.width

    def head(key, out, xavier=False):
        if xavier:
            w = _xavier_normal(key, (config.width, out))
        else:
            w = 1e-5 * jax.random.normal(key, (config.width, out))
        return w, jnp.zeros((out,))

    names_outs = [
        ("xyz", 3), ("rot", 4),
        ("r", config.num_shs), ("g", config.num_shs),
        ("b", config.num_shs), ("a", config.num_shs),
    ]
    head_w, head_b = {}, {}
    for j, (name, out) in enumerate(names_outs):
        xav = config.xavier_init_dxyz and name == "xyz"
        w, b = head(ks[config.depth + j], out, xavier=xav)
        head_w[name] = w
        head_b[name] = b
    return DeformParams(tuple(hw), tuple(hb), head_w, head_b)


def embed_xyz(config: DeformConfig, xyz: jnp.ndarray) -> jnp.ndarray:
    """Positional embedding of xyz, exposed so callers evaluating the
    MLP at several times for the SAME points (the F-ToRF stacked
    two-sample call, train/step.py) compute the 63-wide sin/cos block
    once instead of per time sample — the transcendentals and their
    backward recomputation were ~5% of the whole training step."""
    return _embed(xyz, config.xyz_multires)


def apply_deform(params: DeformParams, config: DeformConfig,
                 xyz: jnp.ndarray, t: jnp.ndarray, x_emb=None):
    """Evaluate the deformation at normalized positions and time.

    Args:
        xyz: (N, 3) scene-extent-normalized positions.
        t: (N, 1) normalized frame time in [0, 1].
        x_emb: optional precomputed embed_xyz(config, xyz).

    Returns:
        d_xyz (N, 3), d_rot (N, 4) zeros, d_sh (N, M, 3),
        d_sh_p (N, M, 2) zeros — matching time_utils.py:116-127.
    """
    if x_emb is None:
        x_emb = embed_xyz(config, xyz)
    t_emb = _embed(t, config.t_multires)
    inp = jnp.concatenate([x_emb, t_emb], axis=-1)
    h = inp
    for i in range(config.depth):
        h = jax.nn.relu(
            jnp.matmul(h, params.hidden_w[i], precision=config.precision)
            + params.hidden_b[i]
        )
        # the concat feeds layer skip+1 (init sizes it width+in_dim);
        # when skip is the last layer (tiny test depths) there is no
        # consumer and the heads take plain width
        if i == config.skip and i + 1 < config.depth:
            h = jnp.concatenate([x_emb, t_emb, h], axis=-1)

    def run_head(name):
        return (
            jnp.matmul(h, params.head_w[name], precision=config.precision)
            + params.head_b[name]
        )

    d_xyz = run_head("xyz")
    d_sh = jnp.stack([run_head("r"), run_head("g"), run_head("b")], axis=-1)
    n = xyz.shape[0]
    d_rot = jnp.zeros((n, 4), d_xyz.dtype)
    d_sh_p = jnp.zeros((n, config.num_shs, 2), d_xyz.dtype)
    return d_xyz, d_rot, d_sh, d_sh_p


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(l**2) for l in leaves))


def clip_by_global_norm(tree, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics (train.py:468)."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda l: l * scale, tree)
