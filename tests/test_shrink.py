"""Adaptive capacity shrinking (Trainer._note_occupancy): the windowed
high-water marks must shrink max_per_tile / dup_factor only past the 2x
hysteresis gap, respect the floors, and reset their window. (Growth on
overflow is covered by test_tile_overflow.py / test_dup_overflow.py.)
"""

import types

import numpy as np

from gftorf_tpu.train.loop import Trainer


def make_trainer(tile_cap=2048, dup_factor=24, render_bucket=0,
                 capacity=4096, window=4, flat_stream=False):
    t = Trainer.__new__(Trainer)
    t.cfg = types.SimpleNamespace(
        tpu=types.SimpleNamespace(flat_stream=flat_stream)
    )
    t.flat_stream = flat_stream
    t._flat_auto = False
    t._flat_fallback_ok = False
    t.tile_cap_limit = max(tile_cap, 16384)
    t.shrink_window = window
    t.tile_cap_floor = 256
    t.dup_factor_floor = 2
    t._occ_steps = 0
    t._occ_tile_max = 0
    t._occ_rendered_max = 0
    t.tile_cap = tile_cap
    t.dup_factor = dup_factor
    t.render_bucket = render_bucket
    t.iteration = 1
    t.model = types.SimpleNamespace(
        aux=types.SimpleNamespace(alive=np.zeros((capacity,), bool))
    )
    return t


def feed(t, tile_max, rendered_max, n):
    for _ in range(n):
        t._note_occupancy(
            {"tile_max": float(tile_max), "rendered_max": float(rendered_max)}
        )


def test_shrinks_past_gap():
    t = make_trainer(tile_cap=2048, dup_factor=24, capacity=4096)
    feed(t, tile_max=300, rendered_max=8000, n=4)
    # 300 * 1.35 = 405 -> 512-lane bucket; 8000*1.35/4096 -> factor 3
    assert t.tile_cap == 512
    assert t.dup_factor == 3
    assert t._occ_steps == 0  # window reset


def test_holds_within_gap():
    t = make_trainer(tile_cap=1024, dup_factor=12, capacity=4096)
    # 700*1.35 = 945 -> target 1024; 1024*1.5 > 1024: hold.
    # 26000*1.35/4096 -> factor 9; 9*1.5 > 12: hold.
    feed(t, tile_max=700, rendered_max=26000, n=4)
    assert t.tile_cap == 1024
    assert t.dup_factor == 12


def test_growth_sizes_to_need():
    # Exact-need growth (not doubling): the overflow metrics carry the
    # true pre-clip occupancy.
    t = make_trainer(tile_cap=1024, dup_factor=4, capacity=4096)
    assert t._tile_cap_need(1243) == 1792  # 1243*1.35 -> 1679 -> 1792
    assert t._dup_factor_need(324046 // 8) == 14  # ceil(1.35*40505/4096)


def test_floors_respected():
    t = make_trainer(tile_cap=1024, dup_factor=12, capacity=65536)
    feed(t, tile_max=1, rendered_max=1, n=4)
    assert t.tile_cap == 256
    assert t.dup_factor == 2


def test_window_takes_max_not_last():
    t = make_trainer(tile_cap=2048, dup_factor=12, capacity=4096)
    feed(t, tile_max=1900, rendered_max=100, n=1)  # one deep step
    feed(t, tile_max=10, rendered_max=100, n=3)
    assert t.tile_cap == 2048  # the deep step pins the window


def test_uses_render_bucket_rows():
    t = make_trainer(dup_factor=24, render_bucket=1024, capacity=65536)
    feed(t, tile_max=2000, rendered_max=4000, n=4)
    # 4000*1.35/1024 -> factor 6 (bucket rows, not capacity rows)
    assert t.dup_factor == 6


def test_disabled_window():
    t = make_trainer(window=0)
    feed(t, tile_max=1, rendered_max=1, n=10)
    assert t.tile_cap == 2048 and t.dup_factor == 24


def test_flat_stream_skips_tile_cap_shrink():
    # Flat-stream mode has no per-tile depth capacity; shrinking
    # max_per_tile there would only recompile the step for nothing.
    # dup_factor (stream length) must still shrink.
    t = make_trainer(tile_cap=2048, dup_factor=24, capacity=4096,
                     flat_stream=True)
    feed(t, tile_max=300, rendered_max=8000, n=4)
    assert t.tile_cap == 2048
    assert t.dup_factor == 3
