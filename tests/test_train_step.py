"""End-to-end training-step smoke test: optimize perturbed Gaussians back
toward a rendered target; loss must drop substantially."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from gftorf_tpu.train.step import (
    METRIC_NAMES,
    FrameData,
    SchedStatic,
    StepStatic,
    train_step,
    _deform_lr_at,
    _gaussian_lrs_at,
)


def stack1(frame):
    """Stack a single FrameData into an N=1 dataset (train_step takes the
    whole stacked dataset plus an index)."""
    return jax.tree.map(lambda a: jnp.asarray(a)[None], frame)


def unpack(packed):
    return dict(zip(METRIC_NAMES, [float(v) for v in np.asarray(packed)]))


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


@pytest.mark.slow
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
    opt = OptimizationParams()
    opt.position_lr_init = 0.002  # scaled up for the tiny test scene
    opt.position_lr_final = 0.002
    static = dataclasses.replace(
        static, sched=SchedStatic.from_opt(opt, 1.0, opt.opacity_reset_interval)
    )
    frames = stack1(frame)

    losses = []
    for it in range(80):
        model, deform, deform_adam, packed = train_step(
            static, model, deform, deform_adam, frames,
            jnp.int32(0), jnp.int32(it + 1), key,
        )
        losses.append(unpack(packed)["loss"])

    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    # stats accumulated
    assert float(jnp.sum(model.aux.denom)) > 0


@pytest.mark.slow
def test_frozen_gauss_keeps_params_but_trains_deform():
    """Post-densify_until_iter the gaussian optimizer must never step
    (reference train.py:469-470) while the deform MLP keeps training."""
    key = jax.random.PRNGKey(1)
    sc = make_scene(key, num_points=64, width=32, height=24)
    n = 64
    bg0 = jnp.zeros((7, sc.config.height, sc.config.width))
    target = rasterize(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        0.0, 0.0, jnp.zeros((n, 2)), bg0, camera=sc.camera, config=sc.config,
    )
    frame = build_frame(sc, target.color, target.phasor[:3])
    params = params_from_scene(sc, jitter=0.05, key=jax.random.fold_in(key, 5))
    # mark half the points dynamic so the deform path carries gradient
    params = params._replace(
        seg_color=params.seg_color.at[: n // 2, 0].set(1.0)
    )
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
        scene_type="torf", config_color=sc.config, config_tof=sc.config,
        deform=deform_cfg, active_sh_degree=3, total_num_views=2,
        render_regions=("static", "dynamic"), dynamic_on=True,
        sync_phase=False, use_quad=False, use_wl1c=False, use_wl1p=False,
        wl1p_e=0.1, num_phasor_channels=2, color_on=True, depth_on=False,
        dd_on=False, oe_on=False, scale_on=False, mlp_reg_on=False,
        flow_on=False, optimize_phase_offset=False, optimize_dc_offset=False,
        random_bg=False, scene_extent=5.0, frozen_gauss=True,
    )
    opt = OptimizationParams()
    static = dataclasses.replace(
        static, sched=SchedStatic.from_opt(opt, 1.0, opt.opacity_reset_interval)
    )
    # it >= densify_until_iter: gaussians frozen, deform pause over.
    model2, deform2, deform_adam2, packed = train_step(
        static, model, deform, deform_adam, stack1(frame),
        jnp.int32(0), jnp.int32(opt.densify_until_iter + 1), key,
    )
    assert np.isfinite(unpack(packed)["loss"])
    # gaussian params and Adam untouched
    for new, old in zip(jax.tree.leaves(model2.params), jax.tree.leaves(model.params)):
        np.testing.assert_array_equal(new, old)
    assert int(model2.adam.step) == 0
    assert float(jnp.sum(model2.aux.denom)) == 0.0
    # deform stepped
    assert int(deform_adam2.step) == 1
    diffs = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(deform2), jax.tree.leaves(deform))
    ]
    assert max(diffs) > 0.0


def test_ftorf_deform_discards_sh_deltas():
    """The reference's ftorf path keeps only d_xyz from the deform MLP
    (train.py:171); the SH color-delta heads must stay zero."""
    from gftorf_tpu.train.step import _query_deform

    deform_cfg = DeformConfig(depth=2, width=32, sh_degree=1)
    dfp = init_deform(jax.random.PRNGKey(3), deform_cfg)
    # blow up every head so a leak would be visible
    dfp = dfp._replace(
        head_w={k: w * 1e6 for k, w in dfp.head_w.items()},
        head_b={k: b + 1.0 for k, b in dfp.head_b.items()},
    )
    params = params_from_scene(make_scene(jax.random.PRNGKey(4), 16, 16, 16))

    def mk(scene_type):
        return StepStatic(
            scene_type=scene_type, config_color=None, config_tof=None,
            deform=deform_cfg, active_sh_degree=1, total_num_views=9,
            render_regions=("static", "dynamic"), dynamic_on=True,
            sync_phase=False, use_quad=True, use_wl1c=False, use_wl1p=False,
            wl1p_e=0.1, num_phasor_channels=2, color_on=True, depth_on=False,
            dd_on=False, oe_on=False, scale_on=False, mlp_reg_on=False,
            flow_on=False, optimize_phase_offset=False,
            optimize_dc_offset=False, random_bg=False, scene_extent=5.0,
        )

    _, _, d_sh_f, d_sh_p_f, _, _ = _query_deform(
        mk("ftorf"), dfp, params, jnp.int32(2)
    )
    np.testing.assert_array_equal(np.asarray(d_sh_f), 0.0)
    np.testing.assert_array_equal(np.asarray(d_sh_p_f), 0.0)

    _, _, d_sh_t, _, _, _ = _query_deform(mk("torf"), dfp, params, jnp.int32(2))
    assert float(jnp.max(jnp.abs(d_sh_t))) > 0.0


def test_deform_bucket_compaction_matches_full():
    """Bucket-compacted deform evaluation (deform_bucket > 0) must equal
    full-capacity evaluation on the dynamic+alive rows, and produce
    exact zeros elsewhere (the reference only ever evaluates the dynamic
    subset, gaussian_model.py:170-174)."""
    from gftorf_tpu.train.step import _query_deform
    from gftorf_tpu.models.gaussians import get_motion_mask

    deform_cfg = DeformConfig(depth=4, width=32, sh_degree=1)
    dfp = init_deform(jax.random.PRNGKey(3), deform_cfg)
    dfp = dfp._replace(head_w={k: w * 1e4 for k, w in dfp.head_w.items()})
    params = params_from_scene(make_scene(jax.random.PRNGKey(4), 64, 16, 16))
    # 20 dynamic points, a few dead slots
    params = params._replace(
        seg_color=params.seg_color.at[:20, 0].set(1.0)
    )
    alive = jnp.ones((64,), bool).at[5].set(False).at[63].set(False)

    def mk(bucket):
        return StepStatic(
            scene_type="torf", config_color=None, config_tof=None,
            deform=deform_cfg, active_sh_degree=1, total_num_views=9,
            render_regions=("static", "dynamic"), dynamic_on=True,
            sync_phase=False, use_quad=False, use_wl1c=False,
            use_wl1p=False, wl1p_e=0.1, num_phasor_channels=2,
            color_on=True, depth_on=False, dd_on=False, oe_on=False,
            scale_on=False, mlp_reg_on=False, flow_on=False,
            optimize_phase_offset=False, optimize_dc_offset=False,
            random_bg=False, scene_extent=5.0, deform_bucket=bucket,
        )

    full = _query_deform(mk(0), dfp, params, jnp.int32(3), alive=alive)
    comp = _query_deform(mk(32), dfp, params, jnp.int32(3), alive=alive)
    mask = np.asarray(get_motion_mask(params) & alive)
    for f, c, name in zip(full, comp,
                          ["d_xyz", "d_rot", "d_sh", "d_sh_p", "dc", "dn"]):
        f, c = np.asarray(f), np.asarray(c)
        sel = mask.reshape((-1,) + (1,) * (f.ndim - 1))
        np.testing.assert_allclose(
            np.where(sel, f, 0.0), c, atol=1e-5, err_msg=name
        )
        # compacted output is exactly zero outside the bucket
        assert np.all(c[~mask] == 0.0), name


def test_deform_clip_trust_region():
    """StepStatic.deform_clip norm-clamps d_xyz to k*scene_extent: an
    exploded MLP is bounded; a healthy MLP is untouched; the ftorf lerp
    (a convex combination) stays inside the ball (stability guard — no
    reference counterpart, see BENCHLOG bistability note)."""
    from gftorf_tpu.train.step import _query_deform

    deform_cfg = DeformConfig(depth=2, width=32, sh_degree=1)
    dfp = init_deform(jax.random.PRNGKey(3), deform_cfg)
    params = params_from_scene(make_scene(jax.random.PRNGKey(4), 16, 16, 16))

    def mk(scene_type, clip):
        return StepStatic(
            scene_type=scene_type, config_color=None, config_tof=None,
            deform=deform_cfg, active_sh_degree=1, total_num_views=9,
            render_regions=("static", "dynamic"), dynamic_on=True,
            sync_phase=False, use_quad=True, use_wl1c=False, use_wl1p=False,
            wl1p_e=0.1, num_phasor_channels=2, color_on=True, depth_on=False,
            dd_on=False, oe_on=False, scale_on=False, mlp_reg_on=False,
            flow_on=False, optimize_phase_offset=False,
            optimize_dc_offset=False, random_bg=False, scene_extent=5.0,
            deform_clip=clip,
        )

    # healthy (near-zero-init) MLP: clip is a no-op
    for st in ("torf", "ftorf"):
        a = _query_deform(mk(st, 0.0), dfp, params, jnp.int32(2))
        b = _query_deform(mk(st, 0.5), dfp, params, jnp.int32(2))
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    # exploded MLP: every returned d_xyz sample is inside the ball
    blown = dfp._replace(
        head_w={k: w * 1e9 for k, w in dfp.head_w.items()},
        head_b={k: b + 100.0 for k, b in dfp.head_b.items()},
    )
    max_norm = 0.5 * 5.0
    for st, fid in (("torf", 2), ("ftorf", 2), ("ftorf", 4)):
        out = _query_deform(mk(st, 0.5), blown, params, jnp.int32(fid))
        for d in (out[0], out[4], out[5]):  # d_xyz, d_curr, d_next
            norms = np.linalg.norm(np.asarray(d), axis=-1)
            assert norms.max() <= max_norm * (1 + 1e-5), (st, fid)
        # unclipped really is outside the ball (the guard matters)
        out0 = _query_deform(mk(st, 0.0), blown, params, jnp.int32(fid))
        assert np.linalg.norm(np.asarray(out0[0]), axis=-1).max() > max_norm

    # grad flows through the clamp (scaled projection, not a dead zone)
    def loss(p):
        d = _query_deform(mk("torf", 0.5), p, params, jnp.int32(2))[0]
        return jnp.sum(d**2)

    g = jax.grad(loss)(blown)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in jax.tree.leaves(g))


def test_injit_schedule_matches_host_schedule():
    """The in-jit lr schedules (step._gaussian_lrs_at/_deform_lr_at) must
    agree with the host-side reference implementation (train/schedule.py,
    itself validated against general_utils.py:41-75)."""
    sc = make_scene(jax.random.PRNGKey(0), num_points=8, width=16, height=16)
    opt = OptimizationParams()
    opt.phase_offset_lr = 1e-3
    opt.dc_offset_lr = 2e-3
    opt.optimize_offset_start = 500
    deform_cfg = DeformConfig(depth=2, width=32, sh_degree=3)
    static = StepStatic(
        scene_type="torf", config_color=sc.config, config_tof=sc.config,
        deform=deform_cfg, active_sh_degree=3, total_num_views=2,
        render_regions=("static", "dynamic"), dynamic_on=True,
        sync_phase=False, use_quad=False, use_wl1c=False, use_wl1p=False,
        wl1p_e=0.1, num_phasor_channels=2, color_on=True, depth_on=False,
        dd_on=False, oe_on=False, scale_on=False, mlp_reg_on=False,
        flow_on=False, optimize_phase_offset=True, optimize_dc_offset=True,
        random_bg=False, scene_extent=4.7,
        sched=SchedStatic.from_opt(opt, 1.0, opt.opacity_reset_interval),
    )
    sh_deg = sc.config.sh_degree
    for it in (1, 100, 499, 500, 501, 3000, 15000, 29999, 30000, 40000):
        got = jax.tree.map(np.asarray, _gaussian_lrs_at(static, jnp.int32(it)))
        want = build_gaussian_lrs(opt, it, static.scene_extent, sh_deg, False)
        for g, w, name in zip(
            jax.tree.leaves(got), jax.tree.leaves(want),
            type(got)._fields,
        ):
            np.testing.assert_allclose(
                g, np.float32(w), rtol=2e-6, err_msg=f"{name} @ it={it}"
            )
        np.testing.assert_allclose(
            np.asarray(_deform_lr_at(static, jnp.int32(it))),
            np.float32(deform_lr_at(opt, it)), rtol=2e-6,
            err_msg=f"deform @ it={it}",
        )



@pytest.mark.slow
@pytest.mark.parametrize("scene_type", ["torf", "ftorf"])
def test_render_compaction_matches_uncompacted(scene_type):
    """render_bucket gathers alive rows into a smaller bucket before
    rasterization; outputs, gradients, Adam updates and densification
    stats must match the uncompacted program exactly — including dead
    slots with stale in-frustum xyz (pruned points), which the
    zero-opacity cull must keep out of the tile lanes. The ftorf case
    adds quad selection + the fused-flow channels (flow_precomp is
    gathered too, and the flow loss fires: frame_id % 4 == 0)."""
    key = jax.random.PRNGKey(2)
    sc = make_scene(key, num_points=128, width=48, height=32)
    n = 128
    bg0 = jnp.zeros((7, sc.config.height, sc.config.width))
    target = rasterize(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        0.0, 0.0, jnp.zeros((n, 2)), bg0, camera=sc.camera, config=sc.config,
    )
    frame = build_frame(sc, target.color, target.phasor[:3])
    if scene_type == "ftorf":
        h, w = sc.config.height, sc.config.width
        fk = jax.random.fold_in(key, 99)
        frame = frame._replace(
            frame_id=jnp.int32(4),  # integration frame: flow loss fires
            gt_quad=jax.random.uniform(fk, (4, h, w)),
            forward_flow=jax.random.normal(jax.random.fold_in(fk, 1),
                                           (2, h, w)),
            backward_flow=jax.random.normal(jax.random.fold_in(fk, 2),
                                            (2, h, w)),
            has_forward_flow=jnp.asarray(True),
            has_backward_flow=jnp.asarray(True),
        )
    params = params_from_scene(sc, jitter=0.05, key=jax.random.fold_in(key, 5))
    # half dynamic, and 30 dead slots that keep stale (visible) geometry
    params = params._replace(
        seg_color=params.seg_color.at[: n // 2, 0].set(1.0)
    )
    alive = jnp.ones((n,), bool).at[50:80].set(False)
    zeros = jax.tree.map(jnp.zeros_like, params)
    model = GaussianModelState(
        params=params,
        aux=GaussianAux(
            alive=alive,
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
    ftorf = scene_type == "ftorf"
    base = StepStatic(
        scene_type=scene_type, config_color=sc.config, config_tof=sc.config,
        deform=deform_cfg, active_sh_degree=3,
        total_num_views=12 if ftorf else 2,
        render_regions=("static", "dynamic"), dynamic_on=True,
        sync_phase=False, use_quad=ftorf, use_wl1c=False, use_wl1p=False,
        wl1p_e=0.1, num_phasor_channels=2, color_on=True, depth_on=False,
        dd_on=True, oe_on=True, scale_on=True, mlp_reg_on=True,
        flow_on=ftorf, optimize_phase_offset=False, optimize_dc_offset=False,
        random_bg=True, scene_extent=5.0, single_camera=ftorf,
    )
    opt = OptimizationParams()
    opt.lambda_dd = 0.01
    opt.dd_loss_iter_end = 10_000  # windows are traced weight gates
    opt.use_opacity_entropy_loss = True
    opt.use_scale_loss = True
    opt.lambda_mlp_reg = 0.01
    base = dataclasses.replace(
        base, sched=SchedStatic.from_opt(opt, 1.0, opt.opacity_reset_interval)
    )
    frames = stack1(frame)

    results = {}
    for bucket in (0, 112):
        static = dataclasses.replace(base, render_bucket=bucket)
        results[bucket] = train_step(
            static, model, deform, deform_adam, frames,
            jnp.int32(0), jnp.int32(3001), key,
        )
    for a, b, name in zip(jax.tree.leaves(results[0]),
                          jax.tree.leaves(results[112]),
                          range(10**6)):
        # rtol 1e-4: the gather-transpose scatter-add reorders the f32
        # accumulation of per-Gaussian gradient reductions (observed
        # max rel diff 3e-5 on the ftorf+flow path, structure identical)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4,
            err_msg=f"leaf {name} diverged between compacted/uncompacted",
        )


@pytest.mark.slow
@pytest.mark.parametrize("scene_type", ["torf", "ftorf"])
def test_compact_layout_slices_match_uncompacted(scene_type):
    """Sorted-layout slice compaction (StepStatic.compact_layout): on a
    state obeying the [dynamic+alive | static+alive | dead] row order
    the slice/pad paths (render bucket AND deform bucket) must
    reproduce the uncompacted program exactly — outputs, gradients,
    Adam updates and densification stats."""
    key = jax.random.PRNGKey(2)
    sc = make_scene(key, num_points=128, width=48, height=32)
    n = 128
    bg0 = jnp.zeros((7, sc.config.height, sc.config.width))
    target = rasterize(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        0.0, 0.0, jnp.zeros((n, 2)), bg0, camera=sc.camera, config=sc.config,
    )
    frame = build_frame(sc, target.color, target.phasor[:3])
    if scene_type == "ftorf":
        h, w = sc.config.height, sc.config.width
        fk = jax.random.fold_in(key, 99)
        frame = frame._replace(
            frame_id=jnp.int32(4),
            gt_quad=jax.random.uniform(fk, (4, h, w)),
            forward_flow=jax.random.normal(jax.random.fold_in(fk, 1),
                                           (2, h, w)),
            backward_flow=jax.random.normal(jax.random.fold_in(fk, 2),
                                            (2, h, w)),
            has_forward_flow=jnp.asarray(True),
            has_backward_flow=jnp.asarray(True),
        )
    params = params_from_scene(sc, jitter=0.05, key=jax.random.fold_in(key, 5))
    # SORTED layout: rows [0, 60) dynamic+alive, [60, 98) static+alive,
    # [98, 128) dead (with stale in-frustum geometry the zero-opacity
    # cull must keep out of the tile lanes).
    seg = jnp.zeros_like(params.seg_color).at[:60, 0].set(1.0)
    params = params._replace(seg_color=seg)
    alive = jnp.arange(n) < 98
    zeros = jax.tree.map(jnp.zeros_like, params)
    model = GaussianModelState(
        params=params,
        aux=GaussianAux(
            alive=alive,
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
    ftorf = scene_type == "ftorf"
    base = StepStatic(
        scene_type=scene_type, config_color=sc.config, config_tof=sc.config,
        deform=deform_cfg, active_sh_degree=3,
        total_num_views=12 if ftorf else 2,
        render_regions=("static", "dynamic"), dynamic_on=True,
        sync_phase=False, use_quad=ftorf, use_wl1c=False, use_wl1p=False,
        wl1p_e=0.1, num_phasor_channels=2, color_on=True, depth_on=False,
        dd_on=True, oe_on=True, scale_on=True, mlp_reg_on=True,
        flow_on=ftorf, optimize_phase_offset=False, optimize_dc_offset=False,
        random_bg=True, scene_extent=5.0, single_camera=ftorf,
    )
    opt = OptimizationParams()
    opt.lambda_dd = 0.01
    opt.dd_loss_iter_end = 10_000
    opt.use_opacity_entropy_loss = True
    opt.use_scale_loss = True
    opt.lambda_mlp_reg = 0.01
    base = dataclasses.replace(
        base, sched=SchedStatic.from_opt(opt, 1.0, opt.opacity_reset_interval)
    )
    frames = stack1(frame)

    ref = train_step(base, model, deform, deform_adam, frames,
                     jnp.int32(0), jnp.int32(3001), key)
    sliced = train_step(
        dataclasses.replace(base, compact_layout=True, render_bucket=112,
                            deform_bucket=64),
        model, deform, deform_adam, frames,
        jnp.int32(0), jnp.int32(3001), key,
    )
    for a, b, name in zip(jax.tree.leaves(ref), jax.tree.leaves(sliced),
                          range(10**6)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-4,
            err_msg=f"leaf {name} diverged between slice/uncompacted",
        )
    # the slice path reports zero compaction overflow on a valid layout
    m = dict(zip(METRIC_NAMES, np.asarray(sliced[3])))
    assert m["compact_overflow"] == 0

    # An alive row beyond the bucket (layout violation) must be counted.
    bad_alive = alive.at[120].set(True)
    bad_model = model._replace(aux=model.aux._replace(alive=bad_alive))
    out_bad = train_step(
        dataclasses.replace(base, compact_layout=True, render_bucket=112,
                            deform_bucket=64),
        bad_model, deform, deform_adam, frames,
        jnp.int32(0), jnp.int32(3001), key,
    )
    mb = dict(zip(METRIC_NAMES, np.asarray(out_bad[3])))
    assert mb["compact_overflow"] > 0
