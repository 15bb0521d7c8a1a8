"""Multi-device (8 virtual CPU devices) sharded rasterizer tests:
sharded forward/backward must match the single-device path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.parallel.mesh import make_mesh
from gftorf_tpu.parallel.sharded import rasterize_sharded
from gftorf_tpu.render.rasterize import rasterize


requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def make_fns(sc, n_shard):
    mesh = make_mesh(data=1, shard=n_shard)
    n = sc.means3d.shape[0]
    bg = jax.random.uniform(
        jax.random.PRNGKey(42), (7, sc.config.height, sc.config.width)
    )
    zeros2d = jnp.zeros((n, 2))

    def single(*args):
        return rasterize(
            *args, 0.0, 0.0, zeros2d, bg, camera=sc.camera, config=sc.config
        )

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(),) * 6, out_specs=P(), check_vma=False,
    )
    def sharded(*args):
        return rasterize_sharded(
            *args, 0.0, 0.0, zeros2d, bg, camera=sc.camera,
            config=sc.config, axis_name="shard",
        )

    args = (sc.means3d, sc.scales, sc.rotations, sc.opacities, sc.shs,
            sc.shs_p)
    return single, sharded, args


@requires_8dev
class TestShardedForward:
    def test_matches_single(self):
        sc = make_scene(jax.random.PRNGKey(0), num_points=300, width=64,
                        height=64, max_per_tile=1024)
        single, sharded, args = make_fns(sc, 4)
        o1 = jax.jit(single)(*args)
        o2 = jax.jit(sharded)(*args)
        np.testing.assert_allclose(o1.color, o2.color, atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(o1.phasor, o2.phasor, atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(o1.depth, o2.depth, atol=1e-4, rtol=1e-4)
        np.testing.assert_array_equal(o1.pixels, o2.pixels)
        np.testing.assert_array_equal(o1.radii, o2.radii)

    def test_grads_match_single(self):
        sc = make_scene(jax.random.PRNGKey(1), num_points=200, width=64,
                        height=64, max_per_tile=1024)
        single, sharded, args = make_fns(sc, 8)

        def loss(fn):
            def f(*a):
                out = fn(*a)
                return (jnp.sum(out.color**2) + jnp.sum(out.phasor**2)
                        + jnp.sum(out.depth * 0.3))
            return f

        g1 = jax.jit(jax.grad(loss(single), argnums=(0, 1, 2, 3, 4, 5)))(*args)
        g2 = jax.jit(jax.grad(loss(sharded), argnums=(0, 1, 2, 3, 4, 5)))(*args)
        for a, b, name in zip(
            g1, g2, ["means3d", "scales", "rot", "opac", "shs", "shs_p"]
        ):
            np.testing.assert_allclose(
                a, b, atol=1e-4, rtol=1e-3, err_msg=name
            )


@requires_8dev
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
