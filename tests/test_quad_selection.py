"""Unit tests for the quad-channel ToF loss selection (train.py:208-228):
permutations, sync phase, and frame-slot indexing."""

import jax.numpy as jnp
import numpy as np

from gftorf_tpu.train.step import StepStatic, _select_tof
from gftorf_tpu.models.deform import DeformConfig
from gftorf_tpu.render.settings import RasterConfig


def make_static(**kw):
    cfg = RasterConfig(height=8, width=8)
    base = dict(
        scene_type="ftorf", config_color=cfg, config_tof=cfg,
        deform=DeformConfig(), active_sh_degree=0, total_num_views=8,
        render_regions=("static", "dynamic"), dynamic_on=False,
        sync_phase=False, use_quad=True, use_wl1c=False, use_wl1p=False,
        wl1p_e=0.1, num_phasor_channels=2, color_on=False, depth_on=False,
        dd_on=False, oe_on=False, scale_on=False, mlp_reg_on=False,
        flow_on=False, optimize_phase_offset=False, optimize_dc_offset=False,
        random_bg=False,
    )
    base.update(kw)
    return StepStatic(**base)


class FakeFrame:
    def __init__(self, fid, quads):
        self.frame_id = jnp.int32(fid)
        self.gt_quad = quads
        self.gt_phasor = jnp.arange(3 * 8 * 8, dtype=jnp.float32).reshape(3, 8, 8)


def test_quad_identity_permutation():
    # rendered phasor channels 3..6 are cos,-cos,sin,-sin; frame slot k
    # compares rendered quad k vs gt quad k under identity permutation
    phasor = jnp.stack([jnp.full((8, 8), float(i)) for i in range(7)])
    quads = jnp.stack([jnp.full((8, 8), 10.0 + i) for i in range(4)])
    st = make_static()
    for fid in range(8):
        r, g = _select_tof(st, phasor, FakeFrame(fid, quads))
        assert float(r[0, 0, 0]) == 3.0 + fid % 4
        assert float(g[0, 0, 0]) == 10.0 + fid % 4


def test_quad_nontrivial_permutation():
    # tof_permutation p maps rendered-quad order to capture order;
    # inverse permutation selects the rendered channel for slot k
    # (train.py:219-220: phasor[3:][inv_perm][fid%4]).
    perm = (2, 0, 3, 1)
    inv = tuple(int(i) for i in np.argsort(perm))
    phasor = jnp.stack([jnp.full((8, 8), float(i)) for i in range(7)])
    quads = jnp.stack([jnp.full((8, 8), 10.0 + i) for i in range(4)])
    st = make_static(tof_permutation=perm, tof_inverse_permutation=inv)
    for fid in range(4):
        r, g = _select_tof(st, phasor, FakeFrame(fid, quads))
        assert float(r[0, 0, 0]) == 3.0 + inv[fid]
        assert float(g[0, 0, 0]) == 10.0 + fid


def test_sync_phase_uses_sin_channel():
    # During sync optimization the loss uses quad channel 2 (the "sin"
    # slot) against gt_quad[perm][2] (train.py:210-212).
    perm = (1, 0, 3, 2)
    phasor = jnp.stack([jnp.full((8, 8), float(i)) for i in range(7)])
    quads = jnp.stack([jnp.full((8, 8), 10.0 + i) for i in range(4)])
    st = make_static(sync_phase=True, tof_permutation=perm,
                     tof_inverse_permutation=tuple(np.argsort(perm)))
    r, g = _select_tof(st, phasor, FakeFrame(1, quads))
    assert float(r[0, 0, 0]) == 3.0 + 2  # rendered quad channel 2
    assert float(g[0, 0, 0]) == 10.0 + perm[2]


def test_no_quad_uses_phasor_channels():
    phasor = jnp.arange(7 * 8 * 8, dtype=jnp.float32).reshape(7, 8, 8)
    st = make_static(use_quad=False, num_phasor_channels=2)
    frame = FakeFrame(0, jnp.zeros((4, 8, 8)))
    r, g = _select_tof(st, phasor, frame)
    assert r.shape == (2, 8, 8)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(phasor[:2]))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(frame.gt_phasor[:2]))
