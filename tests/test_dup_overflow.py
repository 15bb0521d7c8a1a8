"""Duplicate-list overflow reaction: the (gaussian, tile) instance list
has static capacity dup_factor * P; the reference sizes this buffer
exactly every step and is never lossy (rasterizer_impl.cu:311, resize
lambda rasterize_points.cu:27-33), so on overflow the Trainer must grow
dup_factor and deterministically replay — never silently truncate."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.render.rasterize import rasterize


def test_overflow_render_matches_uncapped():
    """A scene whose instances exceed dup_factor*P reports dup_overflow;
    growing the factor renders exactly like a huge capacity."""
    # large gaussians spread over the image -> several tiles per gaussian
    sc = make_scene(jax.random.PRNGKey(0), num_points=2000, width=64,
                    height=48, max_per_tile=1024,
                    scale_range=(0.05, 0.15))
    n = sc.means3d.shape[0]
    bg = jnp.zeros((7, sc.config.height, sc.config.width))
    z2 = jnp.zeros((n, 2))

    def render(factor):
        config = dataclasses.replace(sc.config, dup_factor=factor)
        return rasterize(
            sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs,
            sc.shs_p, 0.0, 0.0, z2, bg, camera=sc.camera, config=config,
        )

    out_small = render(1)  # capacity = max(1024, P) = 2000
    assert bool(out_small.dup_overflow)

    out_grown = render(4)
    out_big = render(16)
    assert not bool(out_grown.dup_overflow)
    assert int(out_grown.num_rendered) == int(out_big.num_rendered)
    np.testing.assert_allclose(out_grown.color, out_big.color, atol=1e-6)
    np.testing.assert_allclose(out_grown.phasor, out_big.phasor, atol=1e-6)
    # and the truncated render is actually wrong (the flag matters)
    assert float(jnp.max(jnp.abs(out_small.color - out_big.color))) > 1e-4


@pytest.mark.slow
def test_trainer_grows_and_replays(tmp_path):
    """Trainer-level: a training step that overflows the duplicate list
    rolls back, doubles dup_factor, and replays the same (it, idx, key);
    the grown factor sticks and survives a checkpoint roundtrip."""
    from gftorf_tpu.config import Config
    from gftorf_tpu.data.generate import write_dataset
    from gftorf_tpu.train.loop import Trainer

    src = str(tmp_path / "scene")
    np.random.seed(3)
    write_dataset(src, num_frames=4, width=64, height=48)
    cfg = Config.from_dict(dict(
        source_path=src, model_path=str(tmp_path / "m"),
        total_num_views=4, tof_image_width=64, tof_image_height=48,
        color_image_width=64, color_image_height=48, depth_range=15.0,
        num_points=3000, iterations=6, warm_up=100, use_quad=True,
        dataset_type="quad", dup_factor=1, dup_factor_limit=96,
    ))
    tr = Trainer(cfg)
    assert tr.dup_factor == 1
    outs = []
    for _ in range(6):
        outs += tr.step()
    outs += tr.drain()
    assert [o["iteration"] for o in outs] == list(range(1, 7))
    assert all(np.isfinite(o["loss"]) for o in outs)
    # 3000 init points at >= 1 tile each exceed capacity 3000 -> grown
    assert tr.dup_factor > 1
    assert all(not o["dup_overflow"] for o in outs)

    # replayed steps must match a run that started with the final factor
    cfg2 = dataclasses.replace(
        cfg, tpu=dataclasses.replace(cfg.tpu, dup_factor=tr.dup_factor))
    cfg2.model.model_path = str(tmp_path / "m2")
    tr2 = Trainer(cfg2)
    outs2 = []
    for _ in range(6):
        outs2 += tr2.step()
    outs2 += tr2.drain()
    for a, b in zip(outs, outs2):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)

    # the grown factor survives checkpoint resume
    ckpt = str(tmp_path / "ck.npz")
    tr.save_checkpoint(ckpt)
    tr3 = Trainer(cfg)
    tr3.load_checkpoint(ckpt)
    assert tr3.dup_factor == tr.dup_factor
