"""Rasterizer validation: tiled prefix-op compositor vs sequential oracle,
plus finite-difference gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.render import rasterize
from gftorf_tpu.render.oracle import rasterize_oracle


def run_both(key, **scene_kw):
    sc = make_scene(key, **scene_kw)
    bg_key = jax.random.fold_in(key, 99)
    bg = jax.random.uniform(
        bg_key, (7, sc.config.height, sc.config.width), minval=-1.0, maxval=1.0
    )
    zeros2d = jnp.zeros((sc.means3d.shape[0], 2))
    out = jax.jit(
        lambda *a: rasterize(*a, camera=sc.camera, config=sc.config)
    )(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        sc.phase_offset, sc.dc_offset, zeros2d, bg,
    )
    ref = rasterize_oracle(
        sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs, sc.shs_p,
        sc.phase_offset, sc.dc_offset, bg, sc.camera, sc.config,
    )
    return sc, out, ref


class TestForwardVsOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_all_outputs(self, seed):
        sc, out, ref = run_both(jax.random.PRNGKey(seed), num_points=200)
        assert not bool(out.dup_overflow)
        assert int(out.tile_overflow) == 0
        np.testing.assert_allclose(out.color, ref["color"], atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(out.phasor, ref["phasor"], atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(out.depth, ref["depth"], atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(out.acc, ref["acc"], atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(
            out.depth_distortion, ref["depth_distortion"], atol=1e-4, rtol=1e-3
        )
        np.testing.assert_array_equal(out.pixels[:, 0], ref["pixels"])

    def test_dense_overlap(self):
        # Many big overlapping Gaussians exercise the early-termination path.
        sc, out, ref = run_both(
            jax.random.PRNGKey(3), num_points=300, scale_range=(0.3, 1.0)
        )
        np.testing.assert_allclose(out.color, ref["color"], atol=5e-5, rtol=1e-3)
        np.testing.assert_allclose(out.phasor, ref["phasor"], atol=5e-5, rtol=1e-3)
        np.testing.assert_array_equal(out.pixels[:, 0], ref["pixels"])

    def test_view_dependent_phase(self):
        sc, out, ref = run_both(
            jax.random.PRNGKey(4), num_points=150, use_view_dependent_phase=True
        )
        np.testing.assert_allclose(out.phasor, ref["phasor"], atol=2e-5, rtol=1e-4)

    def test_radii_and_visibility(self):
        sc, out, ref = run_both(jax.random.PRNGKey(5), num_points=100)
        assert out.radii.shape == (100,)
        vis = np.array(out.radii) > 0
        # every gaussian that touched pixels must be visible
        assert np.all(vis[np.array(ref["pixels"]) > 0])


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


class TestGradients:
    def _loss_fn(self, sc, bg):
        zeros2d = jnp.zeros((sc.means3d.shape[0], 2))

        def loss(means3d, scales, rotations, opacities, shs, shs_p, po, dco):
            out = rasterize(
                means3d, scales, rotations, opacities, shs, shs_p, po, dco,
                zeros2d, bg, camera=sc.camera, config=sc.config,
            )
            # Touch every differentiable output with distinct weights.
            return (
                jnp.sum(out.color * 1.0)
                + jnp.sum(out.phasor * 0.5)
                + jnp.sum(out.depth * 0.25)
                + jnp.sum(out.acc * 0.125)
                + jnp.sum(out.depth_distortion * 2.0)
            )

        return loss

    @pytest.mark.parametrize("argnum,name,eps,tol", [
        (0, "means3d", 1e-5, 5e-3),
        (1, "scales", 1e-5, 5e-3),
        (2, "rotations", 1e-5, 5e-3),
        (3, "opacities", 1e-5, 5e-3),
        (4, "shs", 1e-5, 5e-3),
        (5, "shs_p", 1e-5, 5e-3),
        (6, "phase_offset", 1e-5, 5e-3),
        (7, "dc_offset", 1e-5, 5e-3),
    ])
    def test_fd_gradcheck(self, argnum, name, eps, tol, x64):
        key = jax.random.PRNGKey(7)
        sc = make_scene(key, num_points=48, width=32, height=24,
                        use_view_dependent_phase=True)
        bg = jax.random.uniform(jax.random.fold_in(key, 1),
                                (7, sc.config.height, sc.config.width))
        bg = jnp.asarray(bg, jnp.float64)
        sc = sc._replace(
            camera=jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), sc.camera)
        )
        loss = self._loss_fn(sc, bg)
        args = [
            jnp.asarray(np.asarray(a), jnp.float64)
            for a in [sc.means3d, sc.scales, sc.rotations, sc.opacities,
                      sc.shs, sc.shs_p, sc.phase_offset, sc.dc_offset]
        ]
        g = jax.jit(jax.grad(loss, argnums=argnum))(*args)
        loss_j = jax.jit(loss)

        rng = np.random.RandomState(argnum)
        x = np.asarray(args[argnum], np.float64)
        flat = x.reshape(-1)
        picks = rng.choice(flat.size, size=min(10, flat.size), replace=False)
        g_flat = np.asarray(g).reshape(-1)
        checked = 0
        for i in picks:
            def fd_at(e):
                xp = flat.copy(); xp[i] += e
                xm = flat.copy(); xm[i] -= e
                ap = list(args); ap[argnum] = jnp.asarray(xp.reshape(x.shape))
                am = list(args); am[argnum] = jnp.asarray(xm.reshape(x.shape))
                return (float(loss_j(*ap)) - float(loss_j(*am))) / (2 * e)

            fd1, fd2 = fd_at(eps), fd_at(eps / 2)
            scale = max(abs(fd1), abs(fd2), 1.0)
            if abs(fd1 - fd2) / scale > 1e-3:
                continue  # discontinuity (threshold crossing) — FD invalid
            an = g_flat[i]
            denom = max(abs(fd2), abs(an), 1.0)
            if abs(fd2 - an) / denom > tol:
                raise AssertionError(
                    f"{name}[{i}]: analytic {an:.8g} vs fd {fd2:.8g}"
                )
            checked += 1
        assert checked >= max(1, len(picks) // 2)

    def test_means2d_grad_signal(self):
        # Gradient w.r.t. the zero NDC offset must be nonzero for visible
        # gaussians (this drives densification).
        key = jax.random.PRNGKey(8)
        sc = make_scene(key, num_points=64, width=32, height=24)
        bg = jnp.zeros((7, sc.config.height, sc.config.width))

        def loss(m2d):
            out = rasterize(
                sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs,
                sc.shs_p, sc.phase_offset, sc.dc_offset, m2d, bg,
                camera=sc.camera, config=sc.config,
            )
            return jnp.sum(out.color**2) + jnp.sum(out.phasor**2)

        g = jax.jit(jax.grad(loss))(jnp.zeros((64, 2)))
        out = rasterize(
            sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs,
            sc.shs_p, sc.phase_offset, sc.dc_offset, jnp.zeros((64, 2)), bg,
            camera=sc.camera, config=sc.config,
        )
        touched = np.array(out.pixels[:, 0]) > 0
        gn = np.linalg.norm(np.array(g), axis=-1)
        assert np.all(np.isfinite(gn))
        assert (gn[touched] > 0).mean() > 0.9
