"""Metrics tests: the LPIPS pipeline with synthetic weights (the real
pretrained weights are unobtainable in this image — the conv/linear
arithmetic is what these pin down) and the availability plumbing."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gftorf_tpu.utils import metrics as M


def _synthetic_weights(path, key=0):
    rng = np.random.RandomState(key)
    shapes = [  # AlexNet trunk OIHW
        (64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
        (256, 384, 3, 3), (256, 256, 3, 3),
    ]
    out = {}
    for i, s in enumerate(shapes):
        fan_in = s[1] * s[2] * s[3]
        out[f"conv{i}_w"] = (rng.randn(*s) / np.sqrt(fan_in)).astype(
            np.float32
        )
        out[f"conv{i}_b"] = np.zeros((s[0],), np.float32)
        out[f"lin{i}_w"] = np.abs(
            rng.randn(1, s[0], 1, 1).astype(np.float32)
        )
    np.savez(path, **out)
    return path


def test_lpips_with_synthetic_weights(tmp_path):
    w = _synthetic_weights(str(tmp_path / "w.npz"))
    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (3, 64, 64))
    b = jnp.clip(a + 0.2 * jax.random.normal(
        jax.random.fold_in(key, 1), (3, 64, 64)), 0, 1)

    d_same = float(M.lpips(a, a, weights_path=w))
    d_diff = float(M.lpips(a, b, weights_path=w))
    assert d_same == 0.0
    assert np.isfinite(d_diff) and d_diff > 0.0


def test_lpips_matches_torch_oracle(tmp_path):
    """The jnp LPIPS trunk must reproduce a transliterated torch LPIPS
    (the reference's lpipsPyTorch: torchvision AlexNet features + unit
    normalize + 1x1 non-negative linear heads + spatial mean,
    lpipsPyTorch/modules/lpips.py) with the SAME random weights —
    pretrained files aren't needed to verify the conv arithmetic
    (padding, strides, maxpool geometry, normalization, heads)."""
    import torch
    import torch.nn.functional as F

    w = _synthetic_weights(str(tmp_path / "w.npz"), key=7)
    params = dict(np.load(w))
    rng = np.random.RandomState(5)
    img1 = rng.rand(3, 64, 80).astype(np.float32)
    img2 = np.clip(
        img1 + 0.15 * rng.randn(3, 64, 80).astype(np.float32), 0, 1)

    def torch_lpips(a_np, b_np):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def feats(x_np):
            x = (torch.tensor(x_np)[None] * 2.0 - 1.0 - shift) / scale
            outs = []
            pads, strides = [2, 2, 1, 1, 1], [4, 1, 1, 1, 1]
            pools = [True, True, False, False, False]
            for i in range(5):
                x = F.conv2d(
                    x, torch.tensor(params[f"conv{i}_w"]),
                    torch.tensor(params[f"conv{i}_b"]),
                    stride=strides[i], padding=pads[i])
                x = F.relu(x)
                outs.append(x)
                if pools[i]:
                    x = F.max_pool2d(x, kernel_size=3, stride=2)
            return outs

        total = 0.0
        for i, (fa, fb) in enumerate(zip(feats(a_np), feats(b_np))):
            fa = fa / fa.norm(dim=1, keepdim=True).clamp_min(1e-10)
            fb = fb / fb.norm(dim=1, keepdim=True).clamp_min(1e-10)
            lin = torch.tensor(params[f"lin{i}_w"])
            total = total + ((fa - fb) ** 2 * lin).sum(dim=1).mean()
        return float(total)

    ours = float(M.lpips(jnp.asarray(img1), jnp.asarray(img2),
                         weights_path=w))
    oracle = torch_lpips(img1, img2)
    assert oracle > 1e-4  # non-degenerate comparison
    np.testing.assert_allclose(ours, oracle, rtol=2e-4)


def test_lpips_availability(tmp_path, monkeypatch):
    monkeypatch.delenv("GFTORF_LPIPS_WEIGHTS", raising=False)
    assert not M.lpips_available()
    with pytest.raises(FileNotFoundError):
        M.lpips(jnp.zeros((3, 8, 8)), jnp.zeros((3, 8, 8)))
    w = _synthetic_weights(str(tmp_path / "w.npz"))
    monkeypatch.setenv("GFTORF_LPIPS_WEIGHTS", w)
    assert M.lpips_available()


def test_eval_report_marks_lpips_na(tmp_path, monkeypatch):
    """Without weights the eval tables carry lpips=None instead of
    raising (the reference's lpipsPyTorch would download them)."""
    monkeypatch.delenv("GFTORF_LPIPS_WEIGHTS", raising=False)
    from gftorf_tpu.config import Config
    from gftorf_tpu.data.generate import write_dataset
    from gftorf_tpu.train.evaluate import evaluate_and_report
    from gftorf_tpu.train.loop import Trainer

    src = str(tmp_path / "scene")
    write_dataset(src, num_frames=4, width=48, height=32)
    cfg = Config.from_dict(dict(
        source_path=src, model_path=str(tmp_path / "m"),
        total_num_views=4, tof_image_width=48, tof_image_height=32,
        color_image_width=48, color_image_height=32, depth_range=15.0,
        num_points=300, iterations=5, warm_up=100, use_quad=True,
        dataset_type="quad",
    ))
    tr = Trainer(cfg)
    tr.step()
    tr.drain()
    report = evaluate_and_report(tr, max_frames=1)
    assert report["test"]["lpips"] is None


def test_debug_dumps_and_histograms(tmp_path):
    """--debug channel dumps (tmp_debug_* per train.py:57-98) and the
    eval-time parameter histograms (train.py:595-601 TB equivalent)."""
    from gftorf_tpu.config import Config
    from gftorf_tpu.data.generate import write_dataset
    from gftorf_tpu.train.debug import dump_debug_images, param_histograms
    from gftorf_tpu.train.loop import Trainer

    src = str(tmp_path / "scene")
    write_dataset(src, num_frames=4, width=48, height=32)
    model_path = str(tmp_path / "m")
    cfg = Config.from_dict(dict(
        source_path=src, model_path=model_path,
        total_num_views=4, tof_image_width=48, tof_image_height=32,
        color_image_width=48, color_image_height=32, depth_range=15.0,
        num_points=300, iterations=5, warm_up=100, use_quad=True,
        dataset_type="quad",
    ))
    tr = Trainer(cfg)
    outs = tr.step() + tr.drain()
    assert "idx" in outs[0]
    dump_debug_images(tr, outs[0]["idx"], 1)
    for ch in ("real", "amp", "color", "quad", "depth", "phase_depth",
               "scattering_phase", "scattering_phase_tof_depth"):
        d = os.path.join(model_path, f"tmp_debug_{ch}")
        assert os.path.isdir(d) and os.listdir(d), f"missing {ch}"
    assert os.listdir(os.path.join(model_path, "tmp_debug_amp_gt"))
    assert os.listdir(os.path.join(model_path, "tmp_debug_amp_error"))
    assert os.listdir(os.path.join(model_path, "tmp_debug_scattering_phase_gt"))
    assert os.listdir(
        os.path.join(model_path, "tmp_debug_scattering_phase_tof_depth_error"))

    h = param_histograms(tr.model)
    for name in ("opacity", "dist", "amplitude", "scale"):
        assert sum(h[name]["counts"]) == int(tr.model.aux.alive.sum())
