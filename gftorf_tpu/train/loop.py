"""Host-side training orchestration (the reference train.py:39-482 loop).

The inner step is one jitted program (train.step.train_step); this loop
handles everything with host-visible control flow: camera sampling,
iteration-windowed loss flags (recompiling the step at the handful of
phase boundaries), densification cadence, opacity resets, SH warm-up,
the tof_iters lambda flip, eval reports, and checkpoints.
"""

from __future__ import annotations

import functools
import json
import os
import random
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gftorf_tpu.config import Config
from gftorf_tpu.data.scene import Scene, take_frame
from gftorf_tpu.models.deform import DeformConfig, init_deform
from gftorf_tpu.models.gaussians import (
    AdamState,
    DensifyHyper,
    densify_and_prune,
    get_motion_mask,
    grow_capacity,
    reset_opacity,
    prune_only,
)
from gftorf_tpu.train import losses as L
from gftorf_tpu.train.schedule import build_gaussian_lrs, deform_lr_at
from gftorf_tpu.train.step import (
    FrameData,
    LossWeights,
    StepStatic,
    train_step,
)
from gftorf_tpu.utils.checkpoint import load_pytree, save_pytree


@functools.partial(jax.jit, static_argnums=(2, 3))
def _densify_step(state, key, hyper: DensifyHyper, max_screen_size: float,
                  scene_extent):
    return densify_and_prune(state, key, hyper, scene_extent, max_screen_size)


@functools.partial(jax.jit, static_argnums=(2,))
def _reset_opacity_step(params, mask, use_mask: bool):
    return reset_opacity(params, mask if use_mask else None)


class Trainer:
    def __init__(self, cfg: Config, scene: Optional[Scene] = None):
        self.cfg = cfg
        self.scene = scene or Scene(cfg)
        m, opt = cfg.model, cfg.opt

        self.opt = opt
        self.iteration = 0
        self.active_sh_degree = 0
        self.lambda_color = opt.lambda_color
        self.opacity_reset_interval = opt.opacity_reset_interval

        random.seed(m.seed)
        np.random.seed(m.seed)
        self.key = jax.random.PRNGKey(m.seed)

        if m.model_path:
            from gftorf_tpu.data.scene import write_scene_metadata

            try:
                write_scene_metadata(self.scene, m.model_path)
            except OSError:
                pass

        self.model = self.scene.model_state
        self.deform_cfg = DeformConfig(
            depth=m.D, width=m.W, xyz_multires=m.xyz_multires,
            t_multires=m.t_multires, sh_degree=m.sh_degree,
            isotropic=m.isotropic_gaussians,
            xavier_init_dxyz=m.xavier_init_dxyz,
        )
        self.deform = init_deform(jax.random.PRNGKey(m.seed + 1), self.deform_cfg)
        zeros = jax.tree.map(jnp.zeros_like, self.deform)
        self.deform_adam = AdamState(mu=zeros, nu=zeros, step=jnp.int32(0))

        self.viewpoint_stack: list = []
        self.ema_loss = 0.0
        self.history: list = []

        if self.scene.scene_type == "torf":
            self.render_regions = ("dynamic",)
        elif m.init_static_first:
            self.render_regions = ("static",)
        else:
            self.render_regions = ("static", "dynamic")

    # ------------------------------------------------------------------
    def _static_for(self, iteration: int) -> StepStatic:
        m, opt = self.cfg.model, self.opt
        dynamic_on = m.dynamic and iteration > opt.warm_up
        regions = self.render_regions
        if dynamic_on and self.scene.scene_type == "ftorf":
            regions = ("static", "dynamic")
        return StepStatic(
            scene_type=self.scene.scene_type,
            config_color=self.scene.raster_config(False, m.sh_degree),
            config_tof=self.scene.raster_config(True, m.sh_degree),
            deform=self.deform_cfg,
            active_sh_degree=self.active_sh_degree,
            total_num_views=m.total_num_views,
            render_regions=regions,
            dynamic_on=dynamic_on,
            sync_phase=(opt.use_quad and opt.warm_up < iteration
                        <= opt.optimize_sync_iters),
            use_quad=opt.use_quad,
            use_wl1c=opt.use_wl1c,
            use_wl1p=opt.use_wl1p,
            wl1p_e=opt.wl1p_e,
            num_phasor_channels=opt.num_phasor_channels,
            color_on=self.lambda_color != 0.0,
            depth_on=opt.lambda_depth != 0.0,
            dd_on=(opt.lambda_dd != 0.0 and opt.dd_loss_iter_start < iteration
                   < opt.dd_loss_iter_end),
            oe_on=(opt.use_opacity_entropy_loss
                   and opt.oe_loss_iter_start < iteration < opt.oe_loss_iter_end),
            scale_on=(opt.use_scale_loss and opt.scale_loss_iter_start
                      < iteration < opt.scale_loss_iter_end
                      and iteration > opt.warm_up),
            mlp_reg_on=opt.lambda_mlp_reg != 0.0,
            flow_on=(self.scene.scene_type == "ftorf"
                     and iteration > opt.flow_loss_iter_start and dynamic_on),
            optimize_phase_offset=opt.optimize_phase_offset,
            optimize_dc_offset=opt.optimize_dc_offset,
            random_bg=m.random_bg_color,
            bg_color=tuple(m.bg_color),
            tof_permutation=self.scene.tof_permutation,
            tof_inverse_permutation=self.scene.tof_inverse_permutation,
            scene_extent=self.scene.scene_extent,
            single_camera=self.scene.cameras_identical,
        )

    def _pick_camera(self) -> int:
        m = self.cfg.model
        while True:
            if not self.viewpoint_stack:
                self.viewpoint_stack = list(range(self.scene.num_train))
            idx = self.viewpoint_stack.pop(
                random.randint(0, len(self.viewpoint_stack) - 1)
            )
            fid = self.scene.data.train_cameras[idx].frame_id
            if fid >= m.start_id:
                return idx

    # ------------------------------------------------------------------
    def step(self) -> dict:
        self.iteration += 1
        it = self.iteration
        m, opt = self.cfg.model, self.opt

        if it % 1000 == 0 and self.active_sh_degree < m.sh_degree:
            self.active_sh_degree += 1

        static = self._static_for(it)
        idx = self._pick_camera()
        frame = take_frame(self.scene.train_frames, idx)

        weights = LossWeights(
            color=jnp.float32(self.lambda_color),
            tof=jnp.float32(opt.lambda_tof),
            dssim=jnp.float32(opt.lambda_dssim),
            depth=jnp.float32(opt.lambda_depth),
            dd=jnp.float32(opt.lambda_dd),
            flow=jnp.float32(opt.lambda_flow),
            oe=jnp.float32(opt.lambda_oe),
            scale=jnp.float32(opt.lambda_scale),
            mlp_reg=jnp.float32(opt.lambda_mlp_reg),
        )
        lrs = jax.tree.map(
            jnp.float32,
            build_gaussian_lrs(opt, it, self.scene.scene_extent, m.sh_degree,
                               m.isotropic_gaussians),
        )
        gauss_scale = 1.0 if it < opt.densify_until_iter else 0.0
        deform_scale = (
            1.0
            if (it % self.opacity_reset_interval > 200
                or it >= opt.densify_until_iter)
            else 0.0
        )

        t0 = time.perf_counter()
        self.model, self.deform, self.deform_adam, metrics = train_step(
            static, self.model, self.deform, self.deform_adam, frame,
            jax.random.fold_in(self.key, it), weights, lrs,
            jnp.float32(deform_lr_at(opt, it)),
            jnp.float32(gauss_scale), jnp.float32(deform_scale),
        )
        loss = float(metrics["loss"])
        iter_time = time.perf_counter() - t0
        self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss

        # --- Densification (train.py:441-464)
        if it < opt.densify_until_iter:
            if it > opt.densify_from_iter and it % opt.densification_interval == 0:
                size_thr = 10.0 if it > self.opacity_reset_interval else 0.0
                self._densify(size_thr)
            if it % self.opacity_reset_interval == 0:
                self._reset_opacity()
        elif (self.opt.use_opacity_entropy_loss
              and it % opt.densification_interval == 0):
            self.model = prune_only(self.model, opt.min_opacity)

        # tof_iters event (train.py:476-478)
        if it == opt.tof_iters:
            self.lambda_color = 1.0
            self.opacity_reset_interval = int(self.opacity_reset_interval / 2)

        out = {
            "iteration": it,
            "loss": loss,
            "l1_p": float(metrics["l1_p"]) if "l1_p" in metrics else None,
            "ema_loss": self.ema_loss,
            "iter_time": iter_time,
            "num_points": int(jnp.sum(self.model.aux.alive)),
            "visible": int(metrics["visible"]),
            "dup_overflow": bool(metrics["dup_overflow"]),
            "tile_overflow": int(metrics["tile_overflow"]),
        }
        self.history.append(out)
        return out

    def _densify(self, size_thr: float):
        opt = self.opt
        hyper = DensifyHyper(
            grad_threshold=opt.densify_grad_threshold,
            min_opacity=opt.min_opacity,
            percent_dense=opt.percent_dense,
        )
        key = jax.random.fold_in(self.key, 1_000_000 + self.iteration)
        for _ in range(4):
            new_state, dropped = _densify_step(
                self.model, key, hyper, size_thr,
                jnp.float32(self.scene.scene_extent),
            )
            if int(dropped) == 0:
                self.model = new_state
                return
            # Grow capacity and replay (deterministic given the same key).
            cap = self.model.aux.alive.shape[0]
            new_cap = int(cap * self.cfg.tpu.capacity_growth) + int(dropped)
            new_cap = -(-new_cap // 1024) * 1024
            self.model = grow_capacity(self.model, new_cap)
        self.model = new_state

    def _reset_opacity(self):
        regions = self.render_regions
        motion = get_motion_mask(self.model.params)
        if regions == ("static",):
            mask, use = ~motion, True
        elif regions == ("dynamic",):
            mask, use = motion, True
        else:
            mask, use = motion, False
        params = _reset_opacity_step(self.model.params, mask, use)
        self.model = self.model._replace(params=params)

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str):
        save_pytree(
            path,
            {
                "model": self.model,
                "deform": self.deform,
                "deform_adam": self.deform_adam,
            },
            meta={
                "iteration": self.iteration,
                "active_sh_degree": self.active_sh_degree,
                "lambda_color": self.lambda_color,
                "opacity_reset_interval": self.opacity_reset_interval,
            },
        )

    def load_checkpoint(self, path: str):
        tree, meta = load_pytree(
            path,
            {
                "model": self.model,
                "deform": self.deform,
                "deform_adam": self.deform_adam,
            },
        )
        self.model = tree["model"]
        self.deform = tree["deform"]
        self.deform_adam = tree["deform_adam"]
        self.iteration = meta["iteration"]
        self.active_sh_degree = meta["active_sh_degree"]
        self.lambda_color = meta["lambda_color"]
        self.opacity_reset_interval = meta["opacity_reset_interval"]
