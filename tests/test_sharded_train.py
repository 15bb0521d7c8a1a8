"""Multi-device training-step tests: the shard_mapped train_step must
match the single-device step, and the (data, shard) mesh must train."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gftorf_tpu.config import OptimizationParams
from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.models.deform import DeformConfig, init_deform
from gftorf_tpu.models.gaussians import (
    AdamState,
    GaussianAux,
    GaussianModelState,
)
from gftorf_tpu.render import rasterize
from gftorf_tpu.train.step import METRIC_NAMES, SchedStatic, StepStatic, train_step

from test_train_step import build_frame, params_from_scene, stack1, unpack

requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def make_model(sc, key, n):
    params = params_from_scene(sc, jitter=0.05, key=key)
    # half the points dynamic so the deform MLP carries gradient
    params = params._replace(seg_color=params.seg_color.at[: n // 2, 0].set(1.0))
    zeros = jax.tree.map(jnp.zeros_like, params)
    return GaussianModelState(
        params=params,
        aux=GaussianAux(
            alive=jnp.ones((n,), bool),
            max_radii2d=jnp.zeros((n,)),
            xyz_grad_accum=jnp.zeros((n,)),
            denom=jnp.zeros((n,)),
        ),
        adam=AdamState(mu=zeros, nu=zeros, step=jnp.int32(0)),
    )


def make_setup(num_points=128, width=64, height=48, dynamic=False):
    key = jax.random.PRNGKey(0)
    sc = make_scene(key, num_points=num_points, width=width, height=height)
    n = num_points
    bg0 = jnp.zeros((7, sc.config.height, sc.config.width))
    target = rasterize(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        0.0, 0.0, jnp.zeros((n, 2)), bg0, camera=sc.camera, config=sc.config,
    )
    frame = build_frame(sc, target.color, target.phasor[:3])
    frames = stack1(frame)
    model = make_model(sc, jax.random.fold_in(key, 5), n)
    deform_cfg = DeformConfig(depth=4, width=32, sh_degree=3)
    deform = init_deform(jax.random.fold_in(key, 7), deform_cfg)
    deform_adam = AdamState(
        mu=jax.tree.map(jnp.zeros_like, deform),
        nu=jax.tree.map(jnp.zeros_like, deform),
        step=jnp.int32(0),
    )
    opt = OptimizationParams()
    static = StepStatic(
        scene_type="torf", config_color=sc.config, config_tof=sc.config,
        deform=deform_cfg, active_sh_degree=3, total_num_views=2,
        render_regions=("static", "dynamic"), dynamic_on=dynamic,
        sync_phase=False, use_quad=False, use_wl1c=False, use_wl1p=False,
        wl1p_e=0.1, num_phasor_channels=2, color_on=True, depth_on=False,
        dd_on=False, oe_on=False, scale_on=False, mlp_reg_on=dynamic,
        flow_on=False, optimize_phase_offset=False, optimize_dc_offset=False,
        random_bg=False, scene_extent=5.0,
        sched=SchedStatic.from_opt(opt, 1.0, opt.opacity_reset_interval),
    )
    return static, model, deform, deform_adam, frames


@requires_8dev
class TestShardedTrainStep:
    def test_shard8_matches_single(self):
        """(data=1, shard=8) must reproduce the single-device step:
        same loss, same updated parameters (up to reduction order)."""
        static, model, deform, deform_adam, frames = make_setup(dynamic=True)
        key = jax.random.PRNGKey(11)

        # it=300: outside the post-opacity-reset deform pause, so the
        # deform Adam actually steps and the MLP updates are compared too.
        m1, d1, da1, p1 = train_step(
            static, model, deform, deform_adam, frames,
            jnp.int32(0), jnp.int32(300), key,
        )
        st8 = dataclasses.replace(static, mesh_shape=(1, 8))
        m8, d8, da8, p8 = train_step(
            st8, model, deform, deform_adam, frames,
            jnp.array([0], jnp.int32), jnp.int32(300), key,
        )
        assert int(da1.step) == int(da8.step) == 1
        mm1, mm8 = unpack(p1), unpack(p8)
        assert np.isclose(mm1["loss"], mm8["loss"], rtol=1e-4), (mm1, mm8)
        assert mm1["visible"] == mm8["visible"]
        for a, b, name in zip(
            jax.tree.leaves(m1.params), jax.tree.leaves(m8.params),
            type(m1.params)._fields,
        ):
            np.testing.assert_allclose(
                a, b, atol=2e-5, rtol=1e-3, err_msg=f"params.{name}"
            )
        for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d8)):
            np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-3)
        np.testing.assert_allclose(
            m1.aux.xyz_grad_accum, m8.aux.xyz_grad_accum, atol=1e-5, rtol=1e-3
        )
        np.testing.assert_array_equal(m1.aux.denom, m8.aux.denom)

    def test_data2_shard4_trains(self):
        """A (2, 4) mesh consumes two cameras per step and reduces the
        loss; a few steps must run finite and move the parameters."""
        static, model, deform, deform_adam, frames0 = make_setup(dynamic=True)
        # second camera: same view, mildly scaled targets
        frames = jax.tree.map(
            lambda a: jnp.concatenate([a, a], axis=0), frames0
        )
        st = dataclasses.replace(static, mesh_shape=(2, 4))
        key = jax.random.PRNGKey(3)
        m, d, da = model, deform, deform_adam
        for it in range(300, 303):
            m, d, da, packed = train_step(
                st, m, d, da, frames, jnp.array([0, 1], jnp.int32),
                jnp.int32(it), key,
            )
            metrics = unpack(packed)
            assert np.isfinite(metrics["loss"]), metrics
        assert int(da.step) == 3
        assert float(jnp.max(jnp.abs(m.params.xyz - model.params.xyz))) > 0.0


@requires_8dev
def test_trainer_sharded_matches_single(tmp_path):
    """100-iter Trainer runs: the (1, 8)-mesh run must track the
    single-device run (same seeds, same camera order -> same metrics up
    to collective reduction order)."""
    from gftorf_tpu.config import Config
    from gftorf_tpu.data.generate import write_dataset
    from gftorf_tpu.train.loop import Trainer

    src = str(tmp_path / "scene")
    write_dataset(src, num_frames=8, width=64, height=48)

    def run(mesh_shards):
        # Scene init consumes global np.random *before* Trainer reseeds;
        # pin it so both runs build the identical initial point cloud.
        import random as pyrandom

        np.random.seed(1234)
        pyrandom.seed(1234)
        cfg = Config.from_dict(dict(
            source_path=src, model_path=str(tmp_path / f"m{mesh_shards}"),
            total_num_views=8, tof_image_width=64, tof_image_height=48,
            color_image_width=64, color_image_height=48,
            depth_range=15.0, num_points=2000, iterations=100,
            warm_up=10, densify_from_iter=20, densification_interval=25,
            densify_until_iter=90, opacity_reset_interval=1000,
            lambda_color=0.0, lambda_tof=1.0, random_bg_color=True,
            position_lr_max_steps=100, dataset_type="quad",
            use_quad=True, dynamic=True, optimize_sync_iters=-1,
            mesh_shards=mesh_shards,
        ))
        trainer = Trainer(cfg)
        outs = []
        for _ in range(100):
            outs += trainer.step()
        outs += trainer.drain()
        return outs, trainer

    outs1, tr1 = run(1)
    outs8, tr8 = run(8)
    assert len(outs1) == len(outs8) == 100
    l1 = np.array([o["l1_p"] for o in outs1])
    l8 = np.array([o["l1_p"] for o in outs8])
    assert np.isfinite(l1).all() and np.isfinite(l8).all()
    # identical camera order + rngs; numerics drift only via collective
    # reduction order, so early iterations match tightly and the
    # trajectories stay close in aggregate
    np.testing.assert_allclose(l1[:5], l8[:5], rtol=1e-4)
    assert abs(np.mean(l8[-20:]) - np.mean(l1[-20:])) < 0.25 * abs(
        np.mean(l1[-20:])
    )
    assert int(tr8.model.aux.alive.sum()) > 0
