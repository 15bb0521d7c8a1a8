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


def test_exhaustive_permutations_vs_torch_oracle():
    """All 24 permutations x {sync, async} x frame_id 0..7 against a
    torch transliteration of the reference selection
    (/root/reference/train.py:208-228):

        sync:  gt = gt_quad[perm][2];      rendered = phasor[3:][2]
        async: gt = gt_quad[fid % 4];      rendered = phasor[3:][inv][fid % 4]

    with inv = argsort(perm) (dataset_readers.py:887). Random images so
    any perm-vs-inv transposition or slot off-by-one is caught."""
    import itertools

    import torch

    rng = np.random.RandomState(0)
    phasor_np = rng.randn(7, 8, 8).astype(np.float32)
    quads_np = rng.randn(4, 8, 8).astype(np.float32)
    phasor = jnp.asarray(phasor_np)
    frame_quads = jnp.asarray(quads_np)

    phasor_t = torch.tensor(phasor_np)
    quads_t = torch.tensor(quads_np)

    for perm in itertools.permutations(range(4)):
        inv = tuple(int(i) for i in np.argsort(perm))
        for sync in (False, True):
            st = make_static(sync_phase=sync, tof_permutation=perm,
                             tof_inverse_permutation=inv)
            for fid in range(8):
                r, g = _select_tof(st, phasor, FakeFrame(fid, frame_quads))
                if sync:
                    gt_o = quads_t[list(perm)][2].unsqueeze(0)
                    rd_o = phasor_t[3:][2].unsqueeze(0)
                else:
                    gt_o = quads_t[fid % 4].unsqueeze(0)
                    rd_o = phasor_t[3:][list(inv)][fid % 4].unsqueeze(0)
                np.testing.assert_array_equal(
                    np.asarray(r), rd_o.numpy(),
                    err_msg=f"rendered perm={perm} sync={sync} fid={fid}")
                np.testing.assert_array_equal(
                    np.asarray(g), gt_o.numpy(),
                    err_msg=f"gt perm={perm} sync={sync} fid={fid}")


def test_no_quad_uses_phasor_channels():
    phasor = jnp.arange(7 * 8 * 8, dtype=jnp.float32).reshape(7, 8, 8)
    st = make_static(use_quad=False, num_phasor_channels=2)
    frame = FakeFrame(0, jnp.zeros((4, 8, 8)))
    r, g = _select_tof(st, phasor, frame)
    assert r.shape == (2, 8, 8)
    np.testing.assert_array_equal(np.asarray(r), np.asarray(phasor[:2]))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(frame.gt_phasor[:2]))
