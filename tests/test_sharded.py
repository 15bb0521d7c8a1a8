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
def test_rendered_worst_tracks_skewed_shard():
    """Tile-row sharding with a skewed layout: the dup-capacity sizing
    basis (rendered_worst) must reflect the WORST shard's need scaled to
    global dup_factor units, not the psum'd total — sizing dup_factor
    from the total undershoots the loaded shard and degrades
    grow-and-replay to a +1 crawl (per-shard capacity is capacity/n,
    parallel/sharded.py)."""
    # Scene confined to a thin horizontal band -> one tile-row shard
    # holds nearly every instance.
    sc = make_scene(jax.random.PRNGKey(5), num_points=200, width=64,
                    height=64, max_per_tile=1024)
    means = np.array(sc.means3d)  # copy: device arrays are read-only
    means[:, 1] = means[:, 1] * 0.05  # squash vertically around center
    sc = sc._replace(means3d=jnp.asarray(means))
    single, sharded, args = make_fns(sc, 4)
    o1 = jax.jit(single)(*args)
    o2 = jax.jit(sharded)(*args)
    total = int(o2.num_rendered)
    worst = int(o2.rendered_worst)
    assert total == int(o1.num_rendered)
    assert int(o1.rendered_worst) == total  # single-device: == total
    # fully-skewed: worst-shard need approaches total x n_shards
    assert worst >= total  # always: pmax(local)*n >= psum(local)
    # The squashed band concentrates on the middle tile-row shards
    # (straddling two of the four): sizing from the total would
    # under-provision the loaded shard by this factor.
    assert worst >= int(1.5 * total)


@requires_8dev
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_distributed_initialize_mesh_psum():
    """The --distributed path (SURVEY §2.3 comm backend): a subprocess
    runs jax.distributed.initialize() as a single-process coordinator,
    builds the (data, shard) mesh over 8 virtual CPU devices, and
    psums over both axes through shard_map — exactly what a multi-host
    launch does per process, minus the extra hosts."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:%d" % (45000 + os.getpid() % 2000),
    num_processes=1, process_id=0)
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P
from gftorf_tpu.parallel.mesh import make_mesh

assert jax.process_count() == 1
mesh = make_mesh(data=2, shard=4)

def f(x):
    local = jnp.sum(x * x)
    return jax.lax.psum(jax.lax.psum(local, "shard"), "data")

g = shard_map(f, mesh=mesh, in_specs=P("data", "shard"), out_specs=P())
x = jnp.arange(16.0).reshape(4, 4)
print("TOTAL", float(g(x)))
"""
    env = dict(os.environ, PYTHONPATH=repo, JAX_PLATFORMS="")
    out = subprocess.run([sys.executable, "-c", script], env=env, cwd=repo,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    total = float(out.stdout.strip().split("TOTAL")[1])
    assert total == float(sum(i * i for i in range(16)))
