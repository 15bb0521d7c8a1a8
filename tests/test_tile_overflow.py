"""Tile-depth overflow reaction: the compositor's (T, L) layout caps
instances per tile at max_per_tile; the reference is exact at any depth
(forward.cu:424-676), so on overflow the Trainer must grow the cap and
deterministically replay — never silently truncate."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.render.rasterize import rasterize


def test_overflow_render_matches_uncapped():
    """A scene with more instances in one tile than max_per_tile reports
    overflow; doubling the cap renders exactly like a huge cap."""
    # all gaussians piled into the image center -> one hot tile
    sc = make_scene(jax.random.PRNGKey(0), num_points=300, width=64,
                    height=48, max_per_tile=128, scale_range=(0.02, 0.05))
    means = sc.means3d * jnp.array([0.05, 0.05, 1.0])
    n = means.shape[0]
    bg = jnp.zeros((7, sc.config.height, sc.config.width))
    z2 = jnp.zeros((n, 2))

    def render(cap):
        config = dataclasses.replace(sc.config, max_per_tile=cap)
        return rasterize(
            means, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
            0.0, 0.0, z2, bg, camera=sc.camera, config=config,
        )

    out_small = render(128)
    assert int(out_small.tile_overflow) > 0  # truncated -> flagged

    out_grown = render(512)
    out_big = render(2048)
    assert int(out_grown.tile_overflow) == 0
    np.testing.assert_allclose(out_grown.color, out_big.color, atol=1e-6)
    np.testing.assert_allclose(out_grown.phasor, out_big.phasor, atol=1e-6)
    # and the truncated render is actually wrong (the flag matters)
    assert float(jnp.max(jnp.abs(out_small.color - out_big.color))) > 1e-4


@pytest.mark.slow
def test_trainer_grows_and_replays(tmp_path):
    """Trainer-level: a training step that overflows rolls back, grows
    max_per_tile, and replays the same (it, idx, key) — metrics resolve
    once per iteration and the cap sticks for later steps."""
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
        dataset_type="quad", max_per_tile=128, max_per_tile_limit=4096,
    ))
    tr = Trainer(cfg)
    assert tr.tile_cap == 128
    outs = []
    for _ in range(6):
        outs += tr.step()
    outs += tr.drain()
    assert [o["iteration"] for o in outs] == list(range(1, 7))
    assert all(np.isfinite(o["loss"]) for o in outs)
    # the synthetic GT scene has ~40 gaussians/tile but 3000 init points
    # concentrated by the random init -> cap must have grown
    assert tr.tile_cap > 128
    assert all(o["tile_overflow"] == 0 for o in outs)
