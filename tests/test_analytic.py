"""Tests for the analytic (rasterizer-independent) GT generator.

The generator exists to break the parity-evidence circularity: GT must
come from closed-form ray-surface intersections + the exact phasor
model, never from the repo's own rasterizer. Internal-consistency
invariants checked here:
  * depth_from_tof inverts the synthesized phasor back to the traced
    distance (away from silhouette pixels, where pixel-footprint
    averaging legitimately mixes surfaces — as on a real sensor),
  * the raw quads are the linear quadrature combinations of the phasor
    (forward.cu:361-407 channel definitions survive the pixel pooling
    because all of them are linear in the per-ray sample),
  * flow is zero for static scenes / nonzero exactly on the moving
    object, and the reader consumes the directory unmodified.
"""

import ast
import os

import numpy as np
import pytest

from gftorf_tpu.data.analytic import (
    render_frame_analytic,
    write_dataset,
)
from gftorf_tpu.ops.tof import depth_from_tof

W, H = 80, 60
FX = 0.9 * W
ARGS = dict(width=W, height=H, fx=FX, fy=FX, cx=W / 2, cy=H / 2,
            depth_range=15.0, phase_offset=0.0, dc_offset=0.1)


def test_no_rasterizer_import():
    """The module must stay rasterizer-independent, by construction."""
    src = os.path.join(os.path.dirname(__file__), "..", "gftorf_tpu",
                       "data", "analytic.py")
    tree = ast.parse(open(src).read())
    mods = [n.module for n in ast.walk(tree)
            if isinstance(n, ast.ImportFrom)]
    mods += [a.name for n in ast.walk(tree) if isinstance(n, ast.Import)
             for a in n.names]
    assert not any("render" in (m or "") for m in mods), mods


@pytest.mark.parametrize("layout", ["room", "slide"])
def test_depth_from_phasor_inverts(layout):
    fr = render_frame_analytic(layout, 0.3, **ARGS)
    d = np.asarray(depth_from_tof(fr["phasor"], 15.0))
    err = np.abs(d - fr["dist"])
    # interior pixels: local depth variation small -> the pixel saw one
    # surface and the phasor inverts exactly
    gy, gx = np.gradient(fr["dist"])
    interior = np.hypot(gy, gx) < 0.08  # corrugation slope ~0.05/px
    assert interior.mean() > 0.5
    assert err[interior].max() < 5e-2
    assert np.median(err) < 2e-2


def test_quads_are_quadratures_of_phasor():
    fr = render_frame_analytic("room", 0.55, **ARGS)
    q = fr["quads"]
    ph = fr["phasor"]
    dc = ARGS["dc_offset"]
    np.testing.assert_allclose((q[..., 0] - q[..., 1]) / 2, ph[..., 0],
                               atol=1e-12)
    np.testing.assert_allclose((q[..., 2] - q[..., 3]) / 2, ph[..., 1],
                               atol=1e-12)
    np.testing.assert_allclose((q[..., 0] + q[..., 1]) / 2,
                               dc * ph[..., 2], atol=1e-12)


def test_dynamic_object_moves():
    a = render_frame_analytic("slide", 0.0, **ARGS)
    b = render_frame_analytic("slide", 1.0, **ARGS)
    assert a["dynamic"].any() and b["dynamic"].any()
    # linear slide: box spans different columns at t=0 vs t=1
    cols_a = np.where(a["dynamic"].any(0))[0]
    cols_b = np.where(b["dynamic"].any(0))[0]
    assert cols_a.mean() + 5 < cols_b.mean()
    # depth ordering: box sits in front of the wall
    assert a["dist"][a["dynamic"]].max() < a["dist"][~a["dynamic"]].min() + 1


def test_corrugated_wall_depth_is_curved():
    fr = render_frame_analytic("room", 0.0, **ARGS)
    wall = fr["dist"][~fr["dynamic"]]
    assert wall.std() > 0.05  # not a constant plane


class TestWrittenScene:
    @pytest.fixture(scope="class")
    def scene_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("analytic_scene")
        write_dataset(str(d), layout="room", num_frames=8, width=64,
                      height=48, supersample=2)
        return str(d)

    def test_reader_roundtrip(self, scene_dir):
        from gftorf_tpu.config import Config
        from gftorf_tpu.data.readers import detect_scene_type, read_scene

        assert detect_scene_type(scene_dir) == "ftorf"
        cfg = Config.from_dict(dict(
            source_path=scene_dir, model_path="/tmp/out_an",
            total_num_views=8, tof_image_width=64, tof_image_height=48,
            color_image_width=64, color_image_height=48,
            depth_range=15.0, num_points=500, dataset_type="quad",
        ))
        data = read_scene(scene_dir, cfg.model, eval_split=False)
        assert data.scene_type == "ftorf"
        assert len(data.train_cameras) == 8
        c = data.train_cameras[0]
        assert c.tof_image.shape == (48, 64, 3)
        assert np.isfinite(c.tof_image).all()

    def test_meta_declares_generator(self, scene_dir):
        import json
        meta = json.load(open(os.path.join(scene_dir, "meta.json")))
        assert meta["generator"] == "analytic"

    def test_flow_zero_off_object_nonzero_on(self, scene_dir):
        fwd = np.load(os.path.join(scene_dir, "forward_flow_2",
                                   "flow_0000.npy"))
        assert fwd.shape[0] == 2
        mag = np.hypot(fwd[0], fwd[1])
        assert (mag > 1e-6).any()          # the ball moved
        assert (mag < 1e-6).mean() > 0.6   # most of the frame is static

    def test_static_scene_flowless_quads(self, tmp_path):
        d = tmp_path / "an_static"
        write_dataset(str(d), layout="room", num_frames=8, width=32,
                      height=24, static=True, supersample=1)
        fwd = np.load(os.path.join(str(d), "forward_flow_2",
                                   "flow_0000.npy"))
        assert np.abs(fwd).max() < 1e-5
