"""Pallas compositing kernel vs the XLA prefix-op compositor
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.render.binning import bin_gaussians
from gftorf_tpu.render.composite import TileFeatures, composite_tiles
from gftorf_tpu.render.pallas_composite import composite_tiles_pallas
from gftorf_tpu.render.preprocess import preprocess


def build_tile_data(seed=0, num_points=200, width=64, height=48,
                    max_per_tile=512):
    sc = make_scene(jax.random.PRNGKey(seed), num_points=num_points,
                    width=width, height=height, max_per_tile=max_per_tile)
    n = num_points
    pre = preprocess(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        sc.phase_offset, sc.dc_offset, jnp.zeros((n, 2)), sc.camera,
        sc.config, 3,
    )
    b = bin_gaussians(pre.rect, pre.depth_view, pre.valid, sc.config,
                      sc.config.capacity_for(n))
    idc = jnp.maximum(b.gauss_id, 0)
    feats = TileFeatures(
        gauss_id=b.gauss_id,
        mean2d=jnp.take(pre.mean2d, idc, axis=0),
        conic=jnp.take(pre.conic, idc, axis=0),
        opacity=jnp.take(pre.opacity, idc, axis=0),
        rgb=jnp.take(pre.rgb, idc, axis=0),
        phasor=jnp.take(pre.phasor, idc, axis=0),
        dist=jnp.take(pre.dist, idc, axis=0),
        dist_ndc=jnp.take(pre.dist_ndc, idc, axis=0),
    )
    bg = jax.random.uniform(jax.random.PRNGKey(seed + 100),
                            (7, height, width), minval=-1.0, maxval=1.0)
    return sc, feats, bg


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_forward_matches_xla(seed):
    sc, feats, bg = build_tile_data(seed=seed)
    ref = composite_tiles(feats, bg, sc.config)
    out = composite_tiles_pallas(feats, bg, sc.config, interpret=True)
    np.testing.assert_allclose(out.color, ref.color, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.phasor, ref.phasor, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.depth, ref.depth, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(out.acc, ref.acc, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.dd, ref.dd, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(out.distribution, ref.distribution,
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(out.contrib_pixels, ref.contrib_pixels)


def test_pallas_backward_matches_xla():
    sc, feats, bg = build_tile_data(seed=2, num_points=150)

    def loss(compositor):
        def f(mean2d, conic, opacity, rgb, phasor, dist, dist_ndc, bgm):
            ft = feats._replace(
                mean2d=mean2d, conic=conic, opacity=opacity, rgb=rgb,
                phasor=phasor, dist=dist, dist_ndc=dist_ndc,
            )
            out = compositor(ft, bgm, sc.config)
            return (
                jnp.sum(out.color * 1.0)
                + jnp.sum(out.phasor * 0.5)
                + jnp.sum(out.depth * 0.25)
                + jnp.sum(out.acc * 0.125)
                + jnp.sum(out.dd * 2.0)
            )
        return f

    from gftorf_tpu.render.composite import composite_tiles
    import functools

    args = (feats.mean2d, feats.conic, feats.opacity, feats.rgb,
            feats.phasor, feats.dist, feats.dist_ndc, bg)
    g_ref = jax.grad(loss(composite_tiles), argnums=tuple(range(8)))(*args)
    pallas_c = functools.partial(composite_tiles_pallas, interpret=True)
    g_pal = jax.grad(loss(pallas_c), argnums=tuple(range(8)))(*args)
    names = ["mean2d", "conic", "opacity", "rgb", "phasor", "dist",
             "dist_ndc", "bg"]
    for a, b, n in zip(g_ref, g_pal, names):
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-3, err_msg=n)


def test_chunk_divisibility():
    # Regression: L=768 isn't divisible by the 512 preferred chunk; the
    # last dynamic slice must not read past the block (OOB VMEM -> NaNs
    # on real TPUs). Also RasterConfig rounds L to a 128-multiple.
    from gftorf_tpu.render.pallas_composite import _pick_chunk
    from gftorf_tpu.render.settings import RasterConfig

    assert _pick_chunk(768, 512) == 384
    assert _pick_chunk(1024, 512) == 512
    assert _pick_chunk(256, 512) == 256
    assert RasterConfig(height=32, width=32, max_per_tile=700).max_per_tile == 768

    sc, feats, bg = build_tile_data(seed=5, num_points=250, max_per_tile=768)
    assert feats.gauss_id.shape[1] == 768
    ref = composite_tiles(feats, bg, sc.config)
    out = composite_tiles_pallas(feats, bg, sc.config, interpret=True)
    np.testing.assert_allclose(out.color, ref.color, atol=5e-5, rtol=1e-3)
    assert np.isfinite(np.asarray(out.color)).all()


def test_fused_flow_matches_xla_and_detaches():
    """Fused flow channels: Pallas == XLA, and gradients of a flow-only
    loss reach ONLY the flow features (detached alpha*T weights — the
    reference's geometry-detached render_flow)."""
    import functools

    sc, feats, bg = build_tile_data(seed=4, num_points=180)
    T, L = feats.gauss_id.shape
    flow = jax.random.normal(jax.random.PRNGKey(9), (T, L, 6))
    feats = feats._replace(flow=flow)

    ref = composite_tiles(feats, bg, sc.config)
    out = composite_tiles_pallas(feats, bg, sc.config, interpret=True)
    np.testing.assert_allclose(out.flow, ref.flow, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.color, ref.color, atol=2e-5, rtol=1e-4)
    assert float(jnp.max(jnp.abs(ref.flow))) > 0  # scene actually splats

    def flow_loss(compositor):
        def f(mean2d, conic, opacity, flw):
            ft = feats._replace(mean2d=mean2d, conic=conic,
                                opacity=opacity, flow=flw)
            return jnp.sum(compositor(ft, bg, sc.config).flow ** 2)
        return f

    args = (feats.mean2d, feats.conic, feats.opacity, flow)
    pallas_c = functools.partial(composite_tiles_pallas, interpret=True)
    for comp in (composite_tiles, pallas_c):
        g = jax.grad(flow_loss(comp), argnums=(0, 1, 2, 3))(*args)
        # weights are detached: geometry gets exactly zero
        for gi, name in zip(g[:3], ["mean2d", "conic", "opacity"]):
            np.testing.assert_array_equal(
                np.asarray(gi), 0.0, err_msg=f"{name} leaked grads"
            )
        assert float(jnp.max(jnp.abs(g[3]))) > 0
    g_ref = jax.grad(flow_loss(composite_tiles), argnums=3)(*args)
    g_pal = jax.grad(flow_loss(pallas_c), argnums=3)(*args)
    np.testing.assert_allclose(g_pal, g_ref, atol=2e-4, rtol=1e-3)


def test_fused_flow_equals_separate_colors_pass():
    """The fused flow output must equal a separate rasterization that
    splats the same vectors through colors_precomp with detached
    geometry (what the reference's render_flow does and what this repo
    did before fusion) — same weights, same order, zero background."""
    from gftorf_tpu.render.rasterize import rasterize

    sc = make_scene(jax.random.PRNGKey(11), num_points=160, width=64,
                    height=48, max_per_tile=512)
    n = sc.means3d.shape[0]
    flow3d = jax.random.normal(jax.random.PRNGKey(12), (n, 6))
    bg0 = jnp.zeros((7, 48, 64))
    zeros2d = jnp.zeros((n, 2))

    fused = rasterize(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        sc.phase_offset, sc.dc_offset, zeros2d, bg0,
        camera=sc.camera, config=sc.config, flow_precomp=flow3d,
    )
    for half in range(2):
        sep = rasterize(
            jax.lax.stop_gradient(sc.means3d),
            jax.lax.stop_gradient(sc.scales),
            jax.lax.stop_gradient(sc.rotations),
            jax.lax.stop_gradient(sc.opacities),
            None, None, 0.0, 0.0, zeros2d, bg0,
            camera=sc.camera, config=sc.config,
            colors_precomp=flow3d[:, 3 * half: 3 * half + 3],
        )
        np.testing.assert_allclose(
            fused.flow[3 * half: 3 * half + 3], sep.color,
            atol=1e-5, rtol=1e-4,
        )


def test_channel_gates_match_full_config():
    """need_dd/need_distribution=False: the gated kernels must produce
    identical live channels (and exact-zero gated ones), and identical
    gradients for any loss that never reads the gated channels — the
    contract the training step relies on (train/loop.py channel gates)."""
    import dataclasses
    import functools

    sc, feats, bg = build_tile_data(seed=6, num_points=220)
    full_cfg = sc.config
    gated_cfg = dataclasses.replace(full_cfg, need_dd=False,
                                    need_distribution=False)

    for compositor in (
        functools.partial(composite_tiles_pallas, interpret=True),
        composite_tiles,
    ):
        ref = compositor(feats, bg, full_cfg)
        out = compositor(feats, bg, gated_cfg)
        np.testing.assert_allclose(out.color, ref.color, atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(out.phasor, ref.phasor, atol=1e-6,
                                   rtol=1e-6)
        np.testing.assert_allclose(out.depth, ref.depth, atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(out.acc, ref.acc, atol=1e-6, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.dd), 0.0)
        np.testing.assert_array_equal(np.asarray(out.distribution), 0.0)
        np.testing.assert_array_equal(out.contrib_pixels, ref.contrib_pixels)

        def loss(mean2d, conic, opacity, dist_ndc, cfg):
            ft = feats._replace(mean2d=mean2d, conic=conic, opacity=opacity,
                                dist_ndc=dist_ndc)
            o = compositor(ft, bg, cfg)
            return (jnp.sum(o.color) + 0.5 * jnp.sum(o.phasor)
                    + 0.25 * jnp.sum(o.depth) + 0.125 * jnp.sum(o.acc))

        args = (feats.mean2d, feats.conic, feats.opacity, feats.dist_ndc)
        g_full = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, full_cfg)
        g_gated = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, gated_cfg)
        for a, b, n in zip(g_full, g_gated,
                           ["mean2d", "conic", "opacity", "dist_ndc"]):
            np.testing.assert_allclose(b, a, atol=1e-6, rtol=1e-5, err_msg=n)


def test_no_flow_backward_gate():
    """has_flow=False drops the flow-grad matmul; a color loss must give
    the same geometry gradients as the flow-carrying program."""
    import functools

    sc, feats, bg = build_tile_data(seed=7, num_points=180)
    T, L = feats.gauss_id.shape
    flow = jax.random.normal(jax.random.PRNGKey(21), (T, L, 6))
    pallas_c = functools.partial(composite_tiles_pallas, interpret=True)

    def color_loss(mean2d, opacity, flw):
        ft = feats._replace(mean2d=mean2d, opacity=opacity, flow=flw)
        return jnp.sum(pallas_c(ft, bg, sc.config).color ** 2)

    g_with = jax.grad(color_loss, argnums=(0, 1))(
        feats.mean2d, feats.opacity, flow)
    g_without = jax.grad(
        lambda m, o: color_loss(m, o, None), argnums=(0, 1)
    )(feats.mean2d, feats.opacity)
    for a, b in zip(g_with, g_without):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-6)


def test_pallas_dense_overlap():
    sc, feats, bg = build_tile_data(seed=1, num_points=400,
                                    max_per_tile=1024)
    ref = composite_tiles(feats, bg, sc.config)
    out = composite_tiles_pallas(feats, bg, sc.config, interpret=True)
    np.testing.assert_allclose(out.color, ref.color, atol=5e-5, rtol=1e-3)
    np.testing.assert_array_equal(out.contrib_pixels, ref.contrib_pixels)
