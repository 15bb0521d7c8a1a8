"""Exact flat-stream fallback when the dense tile cap is exhausted.

The reference rasterizer is never lossy (rasterizer_impl.cu:311 sizes
its buffers to the step's exact need); the dense Pallas backward's
VMEM-calibrated ceiling (pallas_composite.max_feasible_tile_cap) must
therefore never translate into silent truncation. These tests drive the
Trainer's overflow state machine with synthetic metrics (the real
kernels only diverge on TPU hardware, where tools/tpu_selftest.py
covers the compiled paths):

  dense overflow below the ceiling  -> grow max_per_tile + replay
  dense overflow AT the ceiling     -> flat_stream engages + replay
  scene thins while flat engaged    -> switch back to dense
  tile_overflow_fallback="truncate" -> round-4 behavior (warn + drop)
"""

import numpy as np
import pytest

from gftorf_tpu.config import Config
from gftorf_tpu.data.generate import write_dataset
from gftorf_tpu.train.loop import Trainer
from gftorf_tpu.train.step import METRIC_NAMES


@pytest.fixture(scope="module")
def trainer_factory(tmp_path_factory):
    src = str(tmp_path_factory.mktemp("scene") / "s")
    np.random.seed(3)
    write_dataset(src, num_frames=4, width=64, height=48)

    def make(**over):
        d = dict(
            source_path=src, model_path="",
            total_num_views=4, tof_image_width=64, tof_image_height=48,
            color_image_width=64, color_image_height=48, depth_range=15.0,
            num_points=500, iterations=8, warm_up=100, use_quad=True,
            dataset_type="quad", max_per_tile=128, max_per_tile_limit=256,
            shrink_window=2,
        )
        d.update(over)
        return Trainer(Config.from_dict(d), startup_artifacts=False)

    return make


def _metrics(**over):
    m = {k: 0.0 for k in METRIC_NAMES}
    m.update(loss=0.1, l1_p=0.1, num_points=500.0, visible=400.0,
             num_rendered=1000.0, rendered_max=1000.0)
    m.update(over)
    return m


def _stub_pipeline(tr, tile_need):
    """Replace _dispatch with a stub whose metrics report a tile
    overflow exactly when the dispatched static config is a dense
    layout with max_per_tile < tile_need."""

    def dispatch(it, idx, static):
        cfg = static.config_tof
        if cfg.flat_stream or cfg.max_per_tile >= tile_need:
            m = _metrics(tile_max=float(tile_need))
        else:
            m = _metrics(tile_overflow=float(tile_need - cfg.max_per_tile),
                         tile_max=float(tile_need))
        packed = np.array([m[k] for k in METRIC_NAMES], np.float32)
        rec = {"it": it, "idx": idx, "static": static, "packed": packed,
               "prev": (tr.model, tr.deform, tr.deform_adam)}
        tr._pending.append(rec)
        return rec

    tr._dispatch = dispatch
    return dispatch


def test_flat_engages_at_dense_ceiling(trainer_factory):
    tr = trainer_factory()
    tr._flat_fallback_ok = True  # CPU: force the TPU-only availability
    tr.tile_cap = tr.tile_cap_limit = 256
    _stub_pipeline(tr, tile_need=4000)

    tr.iteration = 1
    tr._dispatch(1, 0, tr._static_for(1))
    out = tr._resolve_one()
    assert tr.flat_stream and tr._flat_auto
    assert out["tile_overflow"] == 0
    # the replayed static actually carries the flat layout
    st = tr._static_for(2)
    assert st.config_tof.flat_stream and st.config_color.flat_stream


def test_flat_disengages_when_scene_thins(trainer_factory):
    tr = trainer_factory()
    tr._flat_fallback_ok = True
    tr.tile_cap = tr.tile_cap_limit = 1280  # the calibrated 16x32 bound
    tr.flat_stream = True
    tr._flat_auto = True
    tr.shrink_window = 2
    _stub_pipeline(tr, tile_need=100)  # fits dense ceiling comfortably

    for it in (1, 2):
        tr.iteration = it
        tr._dispatch(it, 0, tr._static_for(it))
        tr._resolve_one()
    assert not tr.flat_stream and not tr._flat_auto
    assert tr.tile_cap == tr._tile_cap_need(100)
    assert not tr._static_for(3).config_tof.flat_stream


def test_flat_stays_engaged_inside_hysteresis(trainer_factory):
    """Need just under the ceiling (no 1.5x headroom) must not flap."""
    tr = trainer_factory()
    tr._flat_fallback_ok = True
    tr.tile_cap = tr.tile_cap_limit = 1280
    tr.flat_stream = True
    tr._flat_auto = True
    tr.shrink_window = 2
    _stub_pipeline(tr, tile_need=700)  # need 1024: no 1.5x headroom

    for it in (1, 2):
        tr.iteration = it
        tr._dispatch(it, 0, tr._static_for(it))
        tr._resolve_one()
    assert tr.flat_stream


def test_truncate_optin_keeps_round4_behavior(trainer_factory, capsys):
    tr = trainer_factory(tile_overflow_fallback="truncate")
    assert not tr._flat_fallback_ok
    tr.tile_cap = tr.tile_cap_limit = 256
    _stub_pipeline(tr, tile_need=4000)

    tr.iteration = 1
    tr._dispatch(1, 0, tr._static_for(1))
    out = tr._resolve_one()
    assert not tr.flat_stream
    assert out["tile_overflow"] > 0
    assert "WARNING: tile overflow" in capsys.readouterr().out


def test_grow_below_ceiling_unchanged(trainer_factory):
    """Below the ceiling the round-3 grow-and-replay path still runs
    (no premature flat switch)."""
    tr = trainer_factory()
    tr._flat_fallback_ok = True
    tr.tile_cap, tr.tile_cap_limit = 128, 1024
    _stub_pipeline(tr, tile_need=300)

    tr.iteration = 1
    tr._dispatch(1, 0, tr._static_for(1))
    out = tr._resolve_one()
    assert not tr.flat_stream
    assert tr.tile_cap == tr._tile_cap_need(300)
    assert out["tile_overflow"] == 0


def test_checkpoint_roundtrips_flat_state(trainer_factory, tmp_path):
    tr = trainer_factory()
    tr._flat_fallback_ok = True
    tr.flat_stream = True
    tr._flat_auto = True
    tr.iteration = 7
    path = str(tmp_path / "ck.npz")
    tr.save_checkpoint(path)

    tr2 = trainer_factory()
    tr2._flat_fallback_ok = True
    tr2.load_checkpoint(path)
    assert tr2.flat_stream and tr2._flat_auto

    # without fallback availability (e.g. CPU resume) the flag is
    # dropped — rasterize() would ignore it there anyway
    tr3 = trainer_factory(tile_overflow_fallback="truncate")
    tr3.load_checkpoint(path)
    assert not tr3.flat_stream
