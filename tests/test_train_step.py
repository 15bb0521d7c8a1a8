"""End-to-end training-step smoke test: optimize perturbed Gaussians back
toward a rendered target; loss must drop substantially."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gftorf_tpu.config import OptimizationParams
from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.models.deform import DeformConfig, init_deform
from gftorf_tpu.models.gaussians import (
    AdamState,
    GaussianAux,
    GaussianModelState,
    GaussianParams,
    inverse_sigmoid,
)
from gftorf_tpu.render import rasterize
from gftorf_tpu.train.schedule import build_gaussian_lrs, deform_lr_at
from gftorf_tpu.train.step import FrameData, LossWeights, StepStatic, train_step


def build_frame(sc, gt_image, gt_phasor):
    h, w = sc.config.height, sc.config.width
    k = jnp.eye(3)
    return FrameData(
        frame_id=jnp.int32(0),
        cam_color=sc.camera,
        cam_tof=sc.camera,
        gt_image=gt_image,
        gt_phasor=gt_phasor,
        gt_quad=jnp.zeros((4, h, w)),
        gt_distance=jnp.zeros((1, h, w)),
        forward_flow=jnp.zeros((2, h, w)),
        backward_flow=jnp.zeros((2, h, w)),
        has_forward_flow=jnp.asarray(False),
        has_backward_flow=jnp.asarray(False),
        phase_offset=jnp.float32(0.0),
        dc_offset=jnp.float32(0.0),
        intrinsics_tof=k,
        intrinsics_color=k,
    )


def params_from_scene(sc, jitter=0.0, key=None):
    n = sc.means3d.shape[0]
    xyz = sc.means3d
    if jitter:
        xyz = xyz + jitter * jax.random.normal(key, xyz.shape)
    return GaussianParams(
        xyz=xyz,
        sh_color=sc.shs,
        sh_phase=sc.shs_p[..., 0],
        sh_amp=sc.shs_p[..., 1],
        scaling=jnp.log(sc.scales),
        rotation=sc.rotations,
        opacity=inverse_sigmoid(sc.opacities)[:, None],
        seg_color=jnp.zeros((n, 3)),
        phase_offset=jnp.zeros((1,)),
        dc_offset=jnp.zeros((1,)),
    )


def test_train_step_converges():
    key = jax.random.PRNGKey(0)
    sc = make_scene(key, num_points=128, width=48, height=32)
    n = 128

    # Ground-truth render from the unperturbed scene.
    bg0 = jnp.zeros((7, sc.config.height, sc.config.width))
    target = rasterize(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        0.0, 0.0, jnp.zeros((n, 2)), bg0, camera=sc.camera, config=sc.config,
    )
    frame = build_frame(sc, target.color, target.phasor[:3])

    # Perturbed initial state.
    params = params_from_scene(sc, jitter=0.05, key=jax.random.fold_in(key, 5))
    zeros = jax.tree.map(jnp.zeros_like, params)
    model = GaussianModelState(
        params=params,
        aux=GaussianAux(
            alive=jnp.ones((n,), bool),
            max_radii2d=jnp.zeros((n,)),
            xyz_grad_accum=jnp.zeros((n,)),
            denom=jnp.zeros((n,)),
        ),
        adam=AdamState(mu=zeros, nu=zeros, step=jnp.int32(0)),
    )
    deform_cfg = DeformConfig(depth=2, width=32, sh_degree=3)
    deform = init_deform(jax.random.fold_in(key, 7), deform_cfg)
    deform_adam = AdamState(
        mu=jax.tree.map(jnp.zeros_like, deform),
        nu=jax.tree.map(jnp.zeros_like, deform),
        step=jnp.int32(0),
    )

    static = StepStatic(
        scene_type="torf",
        config_color=sc.config,
        config_tof=sc.config,
        deform=deform_cfg,
        active_sh_degree=3,
        total_num_views=2,
        render_regions=("static", "dynamic"),
        dynamic_on=False,
        sync_phase=False,
        use_quad=False,
        use_wl1c=False,
        use_wl1p=False,
        wl1p_e=0.1,
        num_phasor_channels=2,
        color_on=True,
        depth_on=False,
        dd_on=False,
        oe_on=False,
        scale_on=False,
        mlp_reg_on=False,
        flow_on=False,
        optimize_phase_offset=False,
        optimize_dc_offset=False,
        random_bg=False,
        scene_extent=5.0,
    )
    weights = LossWeights(
        color=jnp.float32(1.0), tof=jnp.float32(1.0), dssim=jnp.float32(0.2),
        depth=jnp.float32(0.0), dd=jnp.float32(0.0), flow=jnp.float32(0.0),
        oe=jnp.float32(0.0), scale=jnp.float32(0.0), mlp_reg=jnp.float32(0.0),
    )
    opt = OptimizationParams()
    opt.position_lr_init = 0.002  # scaled up for the tiny test scene
    opt.position_lr_final = 0.002

    losses = []
    deform_lr = deform_lr_at(opt, 5000)
    for it in range(80):
        lrs = jax.tree.map(
            jnp.float32,
            build_gaussian_lrs(opt, it + 1, static.scene_extent, 3, False),
        )
        model, deform, deform_adam, metrics = train_step(
            static, model, deform, deform_adam, frame,
            jax.random.fold_in(key, 1000 + it), weights, lrs,
            jnp.float32(deform_lr), jnp.float32(1.0), jnp.float32(1.0),
        )
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    # stats accumulated
    assert float(jnp.sum(model.aux.denom)) > 0
