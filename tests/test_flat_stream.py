"""Flat sorted-stream compositor (render/flat_stream.py) vs the XLA
prefix-op compositor, end-to-end through rasterize semantics
(interpret mode on CPU). Also proves the headline structural property:
tile depth is unbounded — a scene whose deepest tile exceeds
max_per_tile matches an untruncated reference exactly."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.render.binning import bin_gaussians_flat
from gftorf_tpu.render.flat_stream import FLAT_ALIGN, flat_stream_capacity
from gftorf_tpu.render.preprocess import preprocess
from gftorf_tpu.render.rasterize import _rasterize_flat, rasterize


def _scene(seed=0, num_points=200, width=64, height=48, max_per_tile=512):
    sc = make_scene(jax.random.PRNGKey(seed), num_points=num_points,
                    width=width, height=height, max_per_tile=max_per_tile)
    bg = jax.random.uniform(jax.random.PRNGKey(seed + 100),
                            (7, height, width), minval=-1.0, maxval=1.0)
    return sc, bg


def _run_flat(sc, bg, config, flow=None):
    n = sc.means3d.shape[0]
    pre = preprocess(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        sc.phase_offset, sc.dc_offset, jnp.zeros((n, 2)), sc.camera,
        config, 3,
    )
    return _rasterize_flat(pre, bg, config, config.capacity_for(n), n,
                           flow, interpret=True)


def _run_xla(sc, bg, config, flow=None):
    n = sc.means3d.shape[0]
    cfg = dataclasses.replace(config, use_pallas=False, flat_stream=False)
    return rasterize(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        sc.phase_offset, sc.dc_offset, jnp.zeros((n, 2)), bg,
        camera=sc.camera, config=cfg, flow_precomp=flow,
    )


def _assert_outputs_close(out, ref, check_flow=False):
    np.testing.assert_allclose(out.color, ref.color, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.phasor, ref.phasor, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.depth, ref.depth, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(out.acc, ref.acc, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.depth_distortion, ref.depth_distortion,
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(out.distribution, ref.distribution,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(out.pixels, ref.pixels)
    if check_flow:
        np.testing.assert_allclose(out.flow, ref.flow, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 3])
def test_flat_forward_matches_xla(seed):
    sc, bg = _scene(seed=seed)
    out = _run_flat(sc, bg, sc.config)
    ref = _run_xla(sc, bg, sc.config)
    _assert_outputs_close(out, ref)
    assert int(out.num_rendered) == int(ref.num_rendered)
    assert int(out.tile_overflow) == 0


def test_flat_forward_with_flow():
    sc, bg = _scene(seed=5, num_points=120)
    flow = jax.random.normal(jax.random.PRNGKey(9), (120, 6)) * 0.1
    out = _run_flat(sc, bg, sc.config, flow=flow)
    ref = _run_xla(sc, bg, sc.config, flow=flow)
    _assert_outputs_close(out, ref, check_flow=True)


def test_flat_unbounded_tile_depth():
    """Crowd one tile far past max_per_tile: the dense layout would
    truncate (tile_overflow > 0); the flat stream must match an
    untruncated (huge-L) XLA reference bit-for-bit in semantics."""
    sc, bg = _scene(seed=7, num_points=400, max_per_tile=128)
    # Pile every Gaussian onto roughly one spot -> one very deep tile.
    xyz = sc.means3d * jnp.array([0.02, 0.02, 1.0])
    sc = sc._replace(means3d=xyz)
    big = dataclasses.replace(sc.config, max_per_tile=2048)

    ref = _run_xla(sc, bg, big)
    out = _run_flat(sc, bg, sc.config)  # small max_per_tile: ignored
    _assert_outputs_close(out, ref)
    # the dense path at max_per_tile=128 WOULD have truncated:
    dense = _run_xla(sc, bg, sc.config)
    assert int(dense.tile_overflow) > 0
    assert int(out.tile_overflow) == 0


def test_flat_backward_matches_xla():
    sc, bg = _scene(seed=2, num_points=150)
    flow = jax.random.normal(jax.random.PRNGKey(4), (150, 6)) * 0.1

    def loss(runner):
        def f(means3d, scales, opacities, shs, shs_p, fl, bgm):
            s = sc._replace(
                means3d=means3d, scales=scales, opacities=opacities,
                shs=shs, shs_p=shs_p,
            )
            out = runner(s, bgm, sc.config, flow=fl)
            return (
                jnp.sum(out.color * 1.0)
                + jnp.sum(out.phasor * 0.5)
                + jnp.sum(out.depth * 0.25)
                + jnp.sum(out.acc * 0.125)
                + jnp.sum(out.depth_distortion * 2.0)
                + jnp.sum(out.flow * 0.75)
            )
        return f

    args = (sc.means3d, sc.scales, sc.opacities, sc.shs, sc.shs_p, flow, bg)
    g_ref = jax.grad(loss(_run_xla), argnums=tuple(range(7)))(*args)
    g_flat = jax.grad(loss(_run_flat), argnums=tuple(range(7)))(*args)
    names = ["means3d", "scales", "opacities", "shs", "shs_p", "flow", "bg"]
    for a, b, n in zip(g_ref, g_flat, names):
        np.testing.assert_allclose(b, a, atol=3e-4, rtol=2e-3, err_msg=n)


def test_flat_binning_layout():
    """Structural invariants of the aligned stream: segments start at
    FLAT_ALIGN multiples, ids within a tile segment are depth-ordered,
    every non-padding id appears exactly once, chunk_tile is monotone."""
    sc, _ = _scene(seed=1, num_points=100)
    n = 100
    pre = preprocess(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        sc.phase_offset, sc.dc_offset, jnp.zeros((n, 2)), sc.camera,
        sc.config, 3,
    )
    cap = sc.config.capacity_for(n)
    fb = bin_gaussians_flat(pre.rect, pre.depth_view, pre.valid, sc.config,
                            cap)
    K_pad = flat_stream_capacity(cap, sc.config.num_tiles)
    assert fb.gauss_flat.shape == (K_pad,)
    assert fb.chunk_tile.shape == (K_pad // FLAT_ALIGN,)

    gf = np.asarray(fb.gauss_flat)
    ct = np.asarray(fb.chunk_tile)
    assert (np.diff(ct) >= 0).all()
    # non-padding count equals num_rendered
    assert (gf >= 0).sum() == int(fb.num_rendered)

    # per-block: all non-padding ids in block b belong to tile ct[b],
    # and are depth-sorted within each tile segment
    depth = np.asarray(pre.depth_view)
    rect = np.asarray(pre.rect)
    for b in range(len(ct)):
        rows = gf[b * FLAT_ALIGN:(b + 1) * FLAT_ALIGN]
        ids = rows[rows >= 0]
        if ids.size == 0:
            continue
        t = ct[b]
        tx, ty = t % sc.config.grid_w, t // sc.config.grid_w
        for i in ids:
            x0, y0, x1, y1 = rect[i]
            assert x0 <= tx < x1 and y0 <= ty < y1, (b, t, i)
    # depth order within tiles (across that tile's blocks)
    for t in np.unique(ct):
        blocks = np.where(ct == t)[0]
        ids = np.concatenate(
            [gf[b * FLAT_ALIGN:(b + 1) * FLAT_ALIGN] for b in blocks]
        )
        ids = ids[ids >= 0]
        d = depth[ids]
        assert (np.diff(d) >= -1e-6).all(), t
