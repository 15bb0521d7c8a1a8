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


def test_pallas_dense_overlap():
    sc, feats, bg = build_tile_data(seed=1, num_points=400,
                                    max_per_tile=1024)
    ref = composite_tiles(feats, bg, sc.config)
    out = composite_tiles_pallas(feats, bg, sc.config, interpret=True)
    np.testing.assert_allclose(out.color, ref.color, atol=5e-5, rtol=1e-3)
    np.testing.assert_array_equal(out.contrib_pixels, ref.contrib_pixels)
