"""Real-layout dataset fixtures for the reader branches that only real
captures exercise (VERDICT r3 item 9): `.mat` intrinsics
(dataset_readers.py get_camera_params via torf_utils.py:314-325),
`relative_pose.npy` color-extrinsics override (dataset_readers.py:447-450),
`tof_permutation.npy` + CLI precedence (dataset_readers.py:869-874),
`quad_values_scale_factor.npy` + CLI precedence (:856-862), and
missing-frame zero-fill in the F-ToRF reader (:779-785 region).

Fixtures start from the synthetic generator's layout and are mutated
into the real-capture variants, so a format slip surfaces here instead
of on first contact with the actual datasets.
"""

import dataclasses
import os

import numpy as np
import pytest
import scipy.io

from gftorf_tpu.config import ModelParams
from gftorf_tpu.data.generate import write_dataset
from gftorf_tpu.data.readers import (
    detect_scene_type,
    read_ftorf_scene,
    read_torf_scene,
)

W, H, FRAMES = 40, 32, 8


def _args(**kw) -> ModelParams:
    base = dict(
        total_num_views=FRAMES,
        tof_image_width=W, tof_image_height=H,
        color_image_width=W, color_image_height=H,
        init_method="random", num_points=256,
        total_num_spiral_views=4,
    )
    base.update(kw)
    return ModelParams(**base)


@pytest.fixture(scope="module")
def torf_real_dir(tmp_path_factory):
    """A 'real'-capture ToRF layout: .mat intrinsics, non-identity ToF
    extrinsics, and a relative_pose.npy that must override the (garbage)
    color_extrinsics file."""
    d = str(tmp_path_factory.mktemp("torf_real"))
    write_dataset(d, num_frames=FRAMES, width=W, height=H, torf_layout=True,
                  static=True, seed=1)
    cams = os.path.join(d, "cams")

    # .mat intrinsics replace the .npy ones (real captures ship MATLAB
    # calibration; loadmat key 'K' per torf_utils.py:314-317).
    for name in ("tof_intrinsics", "color_intrinsics"):
        K = np.load(os.path.join(cams, f"{name}.npy"))
        scipy.io.savemat(os.path.join(cams, f"{name}.mat"), {"K": K})
        os.remove(os.path.join(cams, f"{name}.npy"))

    # Non-identity per-frame ToF extrinsics: small rotation about z plus
    # a translation, so the relative-pose math has something to bite on.
    exts = []
    for i in range(FRAMES):
        a = 0.02 * i
        e = np.eye(4, dtype=np.float32)
        e[:3, :3] = np.array([
            [np.cos(a), -np.sin(a), 0.0],
            [np.sin(a), np.cos(a), 0.0],
            [0.0, 0.0, 1.0],
        ], np.float32)
        e[:3, 3] = [0.05 * i, -0.02 * i, 0.01 * i]
        exts.append(e)
    tof_E = np.stack(exts)
    np.save(os.path.join(cams, "tof_extrinsics.npy"), tof_E)

    # relative_pose: color cam rigidly offset from the ToF cam. The
    # stored color_extrinsics become garbage to prove they are ignored.
    rel = np.eye(4, dtype=np.float32)
    rel[:3, 3] = [0.1, 0.0, 0.0]
    np.save(os.path.join(cams, "relative_pose.npy"), rel)
    np.save(os.path.join(cams, "color_extrinsics.npy"),
            np.full((FRAMES, 4, 4), np.nan, np.float32))
    return d, tof_E, rel


def test_torf_real_mat_intrinsics_and_relative_pose(torf_real_dir):
    d, tof_E, rel = torf_real_dir
    assert detect_scene_type(d) == "torf"
    args = _args(dataset_type="real")
    scene = read_torf_scene(d, args, eval_split=False)

    # Intrinsics came through the .mat branch.
    K = scipy.io.loadmat(os.path.join(d, "cams", "color_intrinsics.mat"))["K"]
    cam = scene.train_cameras[3]
    assert cam.fx == pytest.approx(float(K[0, 0]))
    assert cam.cy == pytest.approx(float(K[1, 2]))

    # color extrinsics = inv(relative_pose) @ tof_extrinsics
    # (dataset_readers.py:447-450) — NOT the stored (NaN) file.
    want = np.linalg.inv(rel) @ tof_E
    for i in (0, FRAMES - 1):
        c = scene.train_cameras[i]
        np.testing.assert_allclose(c.R, want[i, :3, :3].T, atol=1e-6)
        np.testing.assert_allclose(c.T, want[i, :3, 3], atol=1e-6)
        np.testing.assert_allclose(c.R_tof, tof_E[i, :3, :3].T, atol=1e-6)
        assert np.isfinite(c.T).all()


def test_torf_real_missing_mat_errors(torf_real_dir, tmp_path):
    """dataset_type='synthetic' keeps looking for .npy intrinsics, which
    this layout deleted — the failure mode is loud, not silent."""
    d, _, _ = torf_real_dir
    with pytest.raises(FileNotFoundError):
        read_torf_scene(d, _args(dataset_type="synthetic"), eval_split=False)


@pytest.fixture(scope="module")
def ftorf_real_dir(tmp_path_factory):
    """F-ToRF layout with the real-capture aux files and gaps: a
    tof_permutation.npy, a quad scale factor, missing color +
    synthetic_tof frames."""
    d = str(tmp_path_factory.mktemp("ftorf_real"))
    write_dataset(d, num_frames=FRAMES, width=W, height=H, seed=2)
    np.save(os.path.join(d, "tof_permutation.npy"),
            np.array([1, 0, 3, 2]))
    np.save(os.path.join(d, "cams", "quad_values_scale_factor.npy"),
            np.array(2.5, np.float32))
    # Real captures have no color/synthetic_tof for most frames.
    os.remove(os.path.join(d, "color", "0005.npy"))
    os.remove(os.path.join(d, "synthetic_tof", "0005.npy"))
    return d


def test_ftorf_permutation_and_quad_scale_from_files(ftorf_real_dir):
    d = ftorf_real_dir
    assert detect_scene_type(d) == "ftorf"
    scene = read_ftorf_scene(d, _args())

    np.testing.assert_array_equal(scene.tof_permutation, [1, 0, 3, 2])
    np.testing.assert_array_equal(scene.tof_inverse_permutation,
                                  np.argsort([1, 0, 3, 2]))

    # quads are the raw files x 2.5 (dataset_readers.py quad loading with
    # quad_values_scale_factor; :856-862).
    raw = np.load(os.path.join(d, "tofType2", "0002.npy"))
    np.testing.assert_allclose(scene.train_cameras[2].quads[2], raw * 2.5,
                               rtol=1e-6)


def test_ftorf_cli_overrides_beat_files(ftorf_real_dir):
    d = ftorf_real_dir
    scene = read_ftorf_scene(d, _args(tof_permutation="3,2,1,0",
                                      quad_scale=1.0))
    np.testing.assert_array_equal(scene.tof_permutation, [3, 2, 1, 0])
    raw = np.load(os.path.join(d, "tofType2", "0002.npy"))
    np.testing.assert_allclose(scene.train_cameras[2].quads[2], raw,
                               rtol=1e-6)


def test_ftorf_missing_frames_zero_filled(ftorf_real_dir):
    d = ftorf_real_dir
    scene = read_ftorf_scene(d, _args())
    gone = scene.train_cameras[5]
    kept = scene.train_cameras[4]
    # Missing color / synthetic_tof load as zeros of the probed shape
    # (dataset_readers.py readFToRFCameras missing-file zero-fill).
    assert gone.image.shape == kept.image.shape
    assert np.all(gone.image == 0.0)
    assert np.all(gone.tof_image == 0.0)
    assert np.any(kept.image != 0.0)
    # Quads always exist (captured every frame) and stay nonzero.
    assert np.any(gone.quads != 0.0)
    # Flow only exists at integration frames (generator writes
    # flow_{fid:04d}.npy for fid % 4 == 0); others are None.
    assert scene.train_cameras[0].forward_flow is not None
    assert kept.backward_flow is not None  # fid=4 -> 0 exists
    assert scene.train_cameras[1].forward_flow is None
    assert scene.train_cameras[0].backward_flow is None  # fid-4 < 0
