"""Multi-process (2-controller) run of the compiled training step.

SURVEY §2.3's communication-backend row: collectives must ride XLA's
ICI/DCN routing under jax.distributed. This test launches TWO OS
processes, each owning 4 virtual CPU devices, joined by a
jax.distributed coordinator into one 8-device runtime; both build the
global (data=2, shard=4) mesh and run the real train_step program
(primitive-sharded preprocess, tile-row compositing, psum'd gradients,
data-axis camera batch). The replicated outputs must agree bitwise
across processes and stay finite.

The host Trainer loop is single-controller (see train.py --distributed
help); this covers the part that must be multi-host-portable — the
compiled step.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import dataclasses
import jax.numpy as jnp
import numpy as np
from gftorf_tpu.config import OptimizationParams
from gftorf_tpu.data.synthetic import make_scene
from gftorf_tpu.models.deform import DeformConfig, init_deform
from gftorf_tpu.models.gaussians import (AdamState, GaussianAux,
                                         GaussianModelState, inverse_sigmoid)
from gftorf_tpu.render.rasterize import rasterize
from gftorf_tpu.train.step import (FrameData, SchedStatic, StepStatic,
                                   train_step)

# Identical inputs on every process (same seeds).
key = jax.random.PRNGKey(0)
sc = make_scene(key, num_points=128, width=48, height=32)
n = 128
bg0 = jnp.zeros((7, sc.config.height, sc.config.width))
target = rasterize(sc.means3d, sc.scales, sc.rotations, sc.opacities,
                   sc.shs, sc.shs_p, 0.0, 0.0, jnp.zeros((n, 2)), bg0,
                   camera=sc.camera, config=sc.config)
k3 = jnp.eye(3)
frame = FrameData(
    frame_id=jnp.int32(0), cam_color=sc.camera, cam_tof=sc.camera,
    gt_image=target.color, gt_phasor=target.phasor[:3],
    gt_quad=jnp.zeros((4, 32, 48)), gt_distance=jnp.zeros((1, 32, 48)),
    forward_flow=jnp.zeros((2, 32, 48)), backward_flow=jnp.zeros((2, 32, 48)),
    has_forward_flow=jnp.asarray(False), has_backward_flow=jnp.asarray(False),
    phase_offset=jnp.float32(0.0), dc_offset=jnp.float32(0.0),
    intrinsics_tof=k3, intrinsics_color=k3,
)
frames = jax.tree.map(lambda a: jnp.asarray(a)[None], frame)

from gftorf_tpu.models.gaussians import GaussianParams
xyz = sc.means3d + 0.05 * jax.random.normal(jax.random.fold_in(key, 5),
                                            sc.means3d.shape)
params = GaussianParams(
    xyz=xyz, sh_color=sc.shs, sh_phase=sc.shs_p[..., 0],
    sh_amp=sc.shs_p[..., 1], scaling=jnp.log(sc.scales),
    rotation=sc.rotations, opacity=inverse_sigmoid(sc.opacities)[:, None],
    seg_color=jnp.zeros((n, 3)), phase_offset=jnp.zeros((1,)),
    dc_offset=jnp.zeros((1,)),
)
zeros = jax.tree.map(jnp.zeros_like, params)
model = GaussianModelState(
    params=params,
    aux=GaussianAux(alive=jnp.ones((n,), bool), max_radii2d=jnp.zeros((n,)),
                    xyz_grad_accum=jnp.zeros((n,)), denom=jnp.zeros((n,))),
    adam=AdamState(mu=zeros, nu=zeros, step=jnp.int32(0)),
)
dc = DeformConfig(depth=2, width=32, sh_degree=3)
deform = init_deform(jax.random.fold_in(key, 7), dc)
dadam = AdamState(mu=jax.tree.map(jnp.zeros_like, deform),
                  nu=jax.tree.map(jnp.zeros_like, deform), step=jnp.int32(0))
opt = OptimizationParams()
static = StepStatic(
    scene_type="torf", config_color=sc.config, config_tof=sc.config,
    deform=dc, active_sh_degree=3, total_num_views=2,
    render_regions=("static", "dynamic"), dynamic_on=False,
    sync_phase=False, use_quad=False, use_wl1c=False, use_wl1p=False,
    wl1p_e=0.1, num_phasor_channels=2, color_on=True, depth_on=False,
    dd_on=False, oe_on=False, scale_on=False, mlp_reg_on=False,
    flow_on=False, optimize_phase_offset=False, optimize_dc_offset=False,
    random_bg=False, scene_extent=5.0,
    sched=SchedStatic.from_opt(opt, 1.0, opt.opacity_reset_interval),
    mesh_shape=(2, 4),
)

for it in (1, 2):
    model, deform, dadam, packed = train_step(
        static, model, deform, dadam, frames,
        jnp.zeros((2,), jnp.int32), jnp.int32(it), key,
    )
vals = np.asarray(packed)  # replicated -> addressable everywhere
xyz_sum = float(np.asarray(jnp.sum(model.params.xyz)))
assert np.isfinite(vals).all(), vals
print(f"RESULT {pid} loss={vals[0]!r} xyz_sum={xyz_sum!r}")
"""


def test_train_step_under_two_process_mesh():
    port = str(45000 + (os.getpid() % 2000) + 2000)
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="")
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(pid), port],
                         env=env, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"proc failed:\n{err[-3000:]}"
        outs.append([l for l in out.splitlines() if l.startswith("RESULT")][0])
    # replicated outputs must agree bitwise across the two controllers
    r0 = outs[0].split(" ", 2)[2]
    r1 = outs[1].split(" ", 2)[2]
    assert r0 == r1, (r0, r1)
