"""Drive the render.py pipeline on a freshly-trained tiny model."""

import os

import numpy as np
import pytest

from gftorf_tpu.config import Config
from gftorf_tpu.data.generate import write_dataset
from gftorf_tpu.train.export import save_scene_artifacts
from gftorf_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    scene_dir = tmp_path_factory.mktemp("scene")
    model_dir = tmp_path_factory.mktemp("model")
    write_dataset(str(scene_dir), num_frames=4, width=48, height=32)
    cfg = Config.from_dict(dict(
        source_path=str(scene_dir), model_path=str(model_dir),
        total_num_views=4, tof_image_width=48, tof_image_height=32,
        color_image_width=48, color_image_height=32,
        depth_range=15.0, num_points=500, iterations=10,
        warm_up=1000, densify_from_iter=1000, densify_until_iter=5,
        lambda_color=0.5, use_quad=True, dataset_type="quad",
    ))
    cfg.save(cfg.model.model_path)
    trainer = Trainer(cfg)
    for _ in range(10):
        trainer.step()
    trainer.drain()
    save_scene_artifacts(trainer, 10)
    return str(model_dir)


@pytest.fixture(scope="module")
def trained_torf_model(tmp_path_factory):
    scene_dir = tmp_path_factory.mktemp("scene_torf")
    model_dir = tmp_path_factory.mktemp("model_torf")
    write_dataset(str(scene_dir), num_frames=4, width=48, height=32,
                  torf_layout=True)
    cfg = Config.from_dict(dict(
        source_path=str(scene_dir), model_path=str(model_dir),
        total_num_views=4, tof_image_width=48, tof_image_height=32,
        color_image_width=48, color_image_height=32,
        depth_range=15.0, num_points=500, iterations=10,
        warm_up=1000, densify_from_iter=1000, densify_until_iter=5,
        lambda_color=0.5, use_quad=False, dynamic=True,
        dataset_type="synthetic", total_num_spiral_views=6,
    ))
    cfg.save(cfg.model.model_path)
    trainer = Trainer(cfg)
    for _ in range(10):
        trainer.step()
    trainer.drain()
    save_scene_artifacts(trainer, 10)
    return str(model_dir)


def test_render_sets(trained_model):
    from gftorf_tpu.render_sets import render_sets

    base = render_sets(trained_model, iteration=10, skip_train=True,
                       skip_video=False, max_frames=2)
    test_dir = os.path.join(base, "test")
    for ch in ["color", "real", "imag", "amp", "depth", "depth_tof", "dd",
               "quad"]:
        p = os.path.join(test_dir, ch, "0000.png")
        assert os.path.exists(p), f"missing {p}"
    assert os.path.exists(os.path.join(test_dir, "depth", "0000.npy"))
    assert os.path.exists(os.path.join(test_dir, "color.gif"))
    import imageio

    img = imageio.imread(os.path.join(test_dir, "color", "0000.png"))
    assert img.shape[:2] == (32, 48)
    assert img.max() > 0  # rendered something

    # input split + combined comparison panel (GIF fallback: no ffmpeg
    # backend in this image)
    assert os.path.exists(
        os.path.join(trained_model, "input", "amp", "0000.png")
    )
    panel = [f for f in os.listdir(trained_model)
             if f.startswith("iteration_10_video_panel")]
    assert panel, "video panel missing"


def test_proxy_pcd_export(trained_model):
    """GT-vs-rendered depth proxy point clouds
    (dataset_readers.py:1005-1120 counterpart)."""
    from gftorf_tpu.render_sets import load_trained
    from gftorf_tpu.train.export import write_proxy_pcds
    from gftorf_tpu.utils.ply import read_ply

    trainer, _, it = load_trained(trained_model, 10)
    root = write_proxy_pcds(trainer, it, max_frames=2)
    props = read_ply(os.path.join(root, "frame_0", "input.ply"))
    n = len(props["x"])
    assert n == 2 * 48 * 32  # input + rendered back-projections
    assert np.isfinite(props["x"]).all()
    # first half red (GT), second half blue (rendered)
    assert props["red"][0] == 255 and props["blue"][0] == 0
    assert props["blue"][-1] == 255 and props["red"][-1] == 0
    assert os.path.exists(os.path.join(root, "frame_1", "cameras.json"))
    assert os.path.exists(os.path.join(
        root, "frame_0", "point_cloud", f"iteration_{it}", "point_cloud.ply"
    ))


def test_render_sets_spiral(trained_torf_model):
    """ToRF models also render the spiral + freeze-frame-spiral paths
    (reference render.py:352-357)."""
    from gftorf_tpu.render_sets import render_sets

    base = render_sets(trained_torf_model, iteration=10, skip_train=True,
                       skip_video=True, max_frames=2)
    for split in ("renders_spiral", "freezeframe_spiral"):
        for ch in ("real", "depth"):
            p = os.path.join(base, split, ch, "0001.png")
            assert os.path.exists(p), f"missing {p}"
    import imageio

    a = imageio.imread(
        os.path.join(base, "renders_spiral", "depth", "0000.png")
    )
    b = imageio.imread(
        os.path.join(base, "renders_spiral", "depth", "0001.png")
    )
    assert a.shape[:2] == (32, 48)
    # distinct spiral viewpoints must render distinct images
    assert np.any(a != b)


def test_write_video_prefers_mp4_with_backend(tmp_path, monkeypatch):
    """_write_video must use the mp4 writer when an ffmpeg backend
    exists (the reference writes x265 mp4s, render.py:226-315) and fall
    back to GIF when it does not. No ffmpeg ships in this image, so the
    mp4 side runs against a stub writer."""
    import imageio.v2 as imageio

    from gftorf_tpu import video_panel as vp

    frames = [np.full((8, 8, 3), i * 40, np.uint8) for i in range(3)]

    written = {}

    class StubWriter:
        def __init__(self):
            written["frames"] = []

        def append_data(self, f):
            written["frames"].append(f)

        def close(self):
            written["closed"] = True
            # materialize the file like a real writer would
            open(written["path"], "wb").write(b"mp4")

    def fake_get_writer(path, fps):
        written["path"] = path
        written["fps"] = fps
        return StubWriter()

    monkeypatch.setattr(imageio, "get_writer", fake_get_writer)
    out = vp._write_video(str(tmp_path / "clip"), frames, fps=12.0)
    assert out.endswith(".mp4") and os.path.exists(out)
    assert written["fps"] == 12.0 and len(written["frames"]) == 3
    assert written["closed"]

    # backend missing -> GIF fallback
    def raising_get_writer(path, fps):
        raise RuntimeError("no ffmpeg backend")

    monkeypatch.setattr(imageio, "get_writer", raising_get_writer)
    out2 = vp._write_video(str(tmp_path / "clip2"), frames, fps=12.0)
    assert out2.endswith(".gif") and os.path.exists(out2)


def test_quad_cadence_panel_geometry_and_labels(tmp_path):
    """The staircase quad panel (render_ftorf_viz_traj.py:592-680
    analog): 4 rows with GT quads on the diagonal, bordered 'Unknown'
    placeholders off-diagonal, a black vertical separator between the
    GT and Ours groups, a time-axis strip on the left, and caption text
    present in the header row."""
    import imageio.v2 as imageio

    from gftorf_tpu import video_panel as vp

    model = str(tmp_path / "model")
    traj = os.path.join(model, "traj_10")
    h, w = 24, 32
    rng = np.random.default_rng(0)
    for k in range(4):
        for folder, n in [
            (os.path.join(model, "input", f"quad_q{k}"), 2),
            (os.path.join(traj, f"quad_q{k}"), 2),
            (os.path.join(traj, f"depth_q{k}"), 2),
        ]:
            os.makedirs(folder)
            for i in range(n):
                img = rng.integers(40, 200, (h, w), np.uint8)
                imageio.imwrite(os.path.join(folder, f"{i:04d}.png"), img)

    out = vp.create_quad_cadence_panel(model, 10, traj_dir=traj)
    assert out is not None and os.path.exists(out)
    frame = imageio.imread(out if out.endswith(".png") else out)
    if frame.ndim == 4:  # gif stack
        frame = frame[0]
    fh, fw = frame.shape[:2]

    # Geometry: header row is taller (label strip); 7 content cells +
    # vline + time axis wide. Each unlabeled cell is h+2m tall, w+2m
    # wide; header adds the label strip.
    m, lab = vp._MARGIN, vp._LABEL_H
    cell_w = w + 2 * m
    # axis + 7 content cells (4 GT + status + rendered quad + depth)
    # + the vline column
    expected_w = 72 + 7 * cell_w + 10
    expected_h = (h + lab + 2 * m) + 3 * (h + 2 * m)
    assert (fh, fw) == (expected_h, expected_w), (fh, fw)

    # The vertical separator: a column of black pixels after the 5th
    # content cell, spanning the full panel height.
    x0 = 72 + 5 * cell_w
    sep = frame[:, x0:x0 + 10]
    assert (sep.min(axis=-1) < 30).any(axis=1).all(), "vline not full-height"

    # Labels present: dark (text) pixels inside the header label strip
    # of the first content cell, and none in row 2's margin-only strip.
    header_strip = frame[:lab, 72 + m:72 + cell_w - m]
    assert (header_strip.min(axis=-1) < 100).any(), "caption text missing"

    # Placeholders: gray 2px border in an off-diagonal GT cell (row 0,
    # col 1) at the placeholder's top edge.
    y_img = lab + m  # image origin in header row
    x_img = 72 + cell_w + m  # col 1 image origin
    border = frame[y_img:y_img + 2, x_img:x_img + w]
    assert np.all(np.abs(border.astype(int) - 128) < 40), "border missing"

    # Time axis: "Time" text -> dark pixels in the top-left strip.
    axis_top = frame[:16, :70]
    assert (axis_top.min(axis=-1) < 100).any(), "time-axis caption missing"


def test_website_panel_has_separator(tmp_path):
    """create_website_panel inserts the group separator vline between
    the baselines and the Ours columns (render_ftorf_viz_traj.py:563)."""
    import imageio.v2 as imageio

    from gftorf_tpu import video_panel as vp

    model = str(tmp_path / "model")
    traj = os.path.join(model, "traj_5")
    for folder in [os.path.join(model, "input", "depth"),
                   os.path.join(traj, "depth_quad"),
                   os.path.join(traj, "traj")]:
        os.makedirs(folder)
        imageio.imwrite(os.path.join(folder, "0000.png"),
                        np.full((16, 20), 90, np.uint8))

    out = vp.create_website_panel(model, 5, traj_dir=traj)
    assert out is not None
    frame = imageio.imread(out)
    if frame.ndim == 4:
        frame = frame[0]
    # some column must be black top-to-bottom (the separator)
    dark_cols = (frame.min(axis=-1) < 30).all(axis=0)
    assert dark_cols.any(), "no full-height separator column"
