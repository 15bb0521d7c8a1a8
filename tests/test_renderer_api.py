"""Public renderer-bridge API tests (render / render_flow / render_eval)."""

import jax
import jax.numpy as jnp
import numpy as np

from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.models.gaussians import GaussianParams, inverse_sigmoid
from gftorf_tpu.renderer import render, render_eval, render_flow


def setup(seed=0, n=96):
    sc = make_scene(jax.random.PRNGKey(seed), num_points=n, width=48,
                    height=32)
    params = GaussianParams(
        xyz=sc.means3d,
        sh_color=sc.shs,
        sh_phase=sc.shs_p[..., 0],
        sh_amp=sc.shs_p[..., 1],
        scaling=jnp.log(sc.scales),
        rotation=sc.rotations,
        opacity=inverse_sigmoid(sc.opacities)[:, None],
        seg_color=jnp.zeros((n, 3)).at[: n // 2, 0].set(1.0),  # half dynamic
        phase_offset=jnp.zeros((1,)),
        dc_offset=jnp.zeros((1,)),
    )
    m = 16
    zeros = (jnp.zeros((n, 3)), jnp.zeros((n, 4)), jnp.zeros((n, m, 3)),
             jnp.zeros((n, m, 2)))
    return sc, params, zeros


def test_render_dict_contract():
    sc, params, (dx, dr, ds, dsp) = setup()
    bg = jnp.zeros((7, sc.config.height, sc.config.width))
    out = render(params, dx, dr, ds, dsp, sc.camera, sc.camera, sc.config,
                 sc.config, bg)
    for k in ["render", "render_phasor", "render_depth", "render_depth_color",
              "render_acc", "render_acc_color", "depth_distortion",
              "depth_distortion_color", "visibility_filter", "radii",
              "distribution_tof", "pixels"]:
        assert k in out, k
    assert out["render"].shape == (3, 32, 48)
    assert out["render_phasor"].shape == (7, 32, 48)
    assert np.isfinite(np.asarray(out["render"])).all()
    assert int(np.sum(np.asarray(out["visibility_filter"]))) > 0


def test_render_regions_partition():
    # static + dynamic renders composite to (approximately) the full render
    # only when regions don't overlap in depth; here just check exclusion:
    # a static-only render must not show dynamic gaussians' pixels.
    sc, params, (dx, dr, ds, dsp) = setup()
    bg = jnp.zeros((7, sc.config.height, sc.config.width))
    full = render(params, dx, dr, ds, dsp, sc.camera, sc.camera, sc.config,
                  sc.config, bg)
    stat = render(params, dx, dr, ds, dsp, sc.camera, sc.camera, sc.config,
                  sc.config, bg, render_regions=("static",))
    dyn = render(params, dx, dr, ds, dsp, sc.camera, sc.camera, sc.config,
                 sc.config, bg, render_regions=("dynamic",))
    a_full = float(jnp.sum(full["render_acc"]))
    a_s = float(jnp.sum(stat["render_acc"]))
    a_d = float(jnp.sum(dyn["render_acc"]))
    assert a_s < a_full and a_d < a_full
    assert a_s + a_d >= a_full * 0.95  # occlusion overlap only


def test_render_flow_splats_flow():
    sc, params, (dx, dr, ds, dsp) = setup()
    n = params.xyz.shape[0]
    flow3d = jnp.ones((n, 3)) * jnp.array([0.5, -0.25, 0.1])
    out = render_flow(params, dx, dr, flow3d, sc.camera, sc.config)
    img = np.asarray(out["render_flow"])
    assert img.shape == (3, 32, 48)
    # dynamic gaussians carry the flow color; signs should appear
    assert img.max() > 0.0 and img.min() < 0.0

    # geometry is detached: no gradient to xyz through the flow render
    def loss(xyz):
        o = render_flow(params._replace(xyz=xyz), dx, dr, flow3d,
                        sc.camera, sc.config)
        return jnp.sum(o["render_flow"] ** 2)

    g = jax.grad(loss)(params.xyz)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_render_eval_single_camera():
    sc, params, (dx, dr, ds, dsp) = setup()
    bg = jnp.zeros((7, sc.config.height, sc.config.width))
    out = render_eval(params, dx, dr, ds, dsp, sc.camera, sc.config, bg)
    assert out["render"].shape == (3, 32, 48)
    assert out["render_phasor"].shape == (7, 32, 48)
    assert "render_dd" in out and "distribution" in out
