"""Host-side training orchestration (the reference train.py:39-482 loop).

The inner step is one jitted program (train.step.train_step); this loop
handles everything with host-visible control flow: camera sampling,
densification cadence, opacity resets, SH warm-up, eval reports, and
checkpoints. Loss windows and the tof_iters flip are traced weight
gates inside the step (step._weights_at) — only structural transitions
(warm-up/dynamic, sync end, densify freeze, bucket growth) recompile.
"""

from __future__ import annotations

import dataclasses
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
from gftorf_tpu.data.scene import Scene
from gftorf_tpu.models.deform import DeformConfig, init_deform
from gftorf_tpu.models.gaussians import (
    AdamState,
    DensifyHyper,
    densify_and_prune,
    get_motion_mask,
    grow_capacity,
    reset_opacity_state,
    prune_only,
    sort_layout,
)
from gftorf_tpu.train.step import (
    METRIC_NAMES,
    SchedStatic,
    StepStatic,
    train_step,
)
from gftorf_tpu.utils.checkpoint import load_pytree, save_pytree


@functools.partial(jax.jit, static_argnums=(2, 3))
def _densify_step(state, key, hyper: DensifyHyper, max_screen_size: float,
                  scene_extent):
    return densify_and_prune(state, key, hyper, scene_extent, max_screen_size)


@functools.partial(jax.jit, static_argnums=(2,))
def _reset_opacity_step(state, mask, use_mask: bool):
    return reset_opacity_state(state, mask if use_mask else None)


_sort_layout_step = jax.jit(sort_layout)


class Trainer:
    def __init__(self, cfg: Config, scene: Optional[Scene] = None,
                 startup_artifacts: bool = True):
        self.cfg = cfg
        # Seed BEFORE Scene construction: the random point-cloud init
        # draws from global np.random, and the reference seeds first too
        # (safe_state runs before Scene in train.py:634,43). Seeding
        # after would make the initial model depend on ambient RNG state
        # and break cross-run determinism (e.g. overflow-replay tests).
        m, opt = cfg.model, cfg.opt
        random.seed(m.seed)
        np.random.seed(m.seed)
        self.key = jax.random.PRNGKey(m.seed)

        self.scene = scene or Scene(cfg)

        self.opt = opt
        self.iteration = 0
        self.active_sh_degree = 0
        self.lambda_color = opt.lambda_color
        self.opacity_reset_interval = opt.opacity_reset_interval

        # Init-time sanity artifacts (cameras.json, scene_bounds.png —
        # scene/__init__.py:63-83, torf_utils.py:446-466). Skipped for
        # inference-only loads (render/bench), where the matplotlib plot
        # is pure startup latency.
        if m.model_path and startup_artifacts:
            from gftorf_tpu.data.scene import (
                write_scene_bounds_png,
                write_scene_metadata,
            )

            try:
                write_scene_metadata(self.scene, m.model_path)
                write_scene_bounds_png(self.scene, m.model_path)
            except Exception as e:  # plot failure must not abort training
                print(f"[warn] scene metadata/bounds write failed: {e}",
                      flush=True)

        # Layout invariant for slice-based compaction
        # (StepStatic.compact_layout): rows sorted
        # [dynamic+alive | static+alive | dead], re-established at every
        # event that changes the alive/motion partition (densify, prune,
        # checkpoint restore). grow_capacity appends dead rows and
        # preserves it.
        self.model = _sort_layout_step(self.scene.model_state)
        self.deform_cfg = DeformConfig(
            depth=m.D, width=m.W, xyz_multires=m.xyz_multires,
            t_multires=m.t_multires, sh_degree=m.sh_degree,
            isotropic=m.isotropic_gaussians,
            xavier_init_dxyz=m.xavier_init_dxyz,
            precision=getattr(cfg.tpu, "deform_precision", "highest"),
        )
        self.deform = init_deform(jax.random.PRNGKey(m.seed + 1), self.deform_cfg)
        zeros = jax.tree.map(jnp.zeros_like, self.deform)
        self.deform_adam = AdamState(mu=zeros, nu=zeros, step=jnp.int32(0))

        self.viewpoint_stack: list = []
        self.ema_loss = 0.0
        self.history: list = []
        # Metric pipeline: steps are dispatched without waiting for their
        # results; metrics are fetched ``metrics_lag`` steps later so the
        # host never serializes on the device (through the TPU tunnel a
        # synchronous per-iter fetch costs a full round trip). Records
        # keep the pre-step state (immutable array refs, no copies) so a
        # tile-overflow can deterministically roll back and replay.
        self.metrics_lag = max(0, getattr(cfg.tpu, "metrics_lag", 1))
        self._pending: list = []
        self._last_resolve_t = time.perf_counter()
        self.tile_cap = cfg.tpu.max_per_tile
        self.tile_cap_limit = max(self.tile_cap,
                                  getattr(cfg.tpu, "max_per_tile_limit", 16384))
        # Active compositor layout. `flat_stream` may flip to True at
        # runtime (auto-fallback below) and back; `_flat_auto` marks an
        # automatic switch so only those disengage when the scene thins.
        self.flat_stream = bool(cfg.tpu.flat_stream)
        self._flat_auto = False
        self._flat_fallback_ok = (
            cfg.tpu.use_pallas
            and jax.default_backend() == "tpu"
            and getattr(cfg.tpu, "tile_overflow_fallback", "flat") == "flat"
        )
        if cfg.tpu.use_pallas and jax.default_backend() == "tpu":
            # The DENSE Pallas backward kernel's scoped-VMEM budget
            # bounds the tile depth for a given tile shape
            # (pallas_composite.py _bwd_pref); clamp the grow-and-replay
            # ceiling to the calibrated bound AT THIS STEP'S CHANNEL
            # GATES (the training step is the only program that runs the
            # backward kernel; its config_tof carries need_dd only when
            # a dd-loss window exists and never need_distribution, see
            # _static_for). Past the ceiling the trainer switches to the
            # exact flat-stream compositor (tile depth is not a kernel
            # dimension there) unless tile_overflow_fallback="truncate".
            # On CPU the XLA compositor runs instead (no VMEM bound).
            from gftorf_tpu.render.pallas_composite import (
                max_feasible_tile_cap,
            )

            dd_possible = (opt.lambda_dd != 0.0
                           and opt.dd_loss_iter_end
                           > opt.dd_loss_iter_start + 1)
            feas = max_feasible_tile_cap(
                cfg.tpu.tile_h * cfg.tpu.tile_w,
                need_dd=dd_possible, need_distribution=False)
            # The clamp applies even when flat_stream is configured on:
            # an auto-engaged flat fallback restored from a checkpoint
            # can later DISENGAGE to the dense kernels, and the
            # grow-and-replay ceiling must already be dense-feasible
            # then (growing past it raises mid-training).
            if self.tile_cap > feas and not self.flat_stream:
                raise ValueError(
                    f"max_per_tile={self.tile_cap} infeasible for "
                    f"{cfg.tpu.tile_h}x{cfg.tpu.tile_w} tiles (backward "
                    f"scoped-VMEM bound: {feas})"
                )
            if self.tile_cap_limit > feas:
                print(f"[trainer] max_per_tile_limit {self.tile_cap_limit} "
                      f"-> {feas} ({cfg.tpu.tile_h}x{cfg.tpu.tile_w} tile "
                      f"backward VMEM bound; overflow past it falls back "
                      f"to {'the exact flat-stream compositor' if self._flat_fallback_ok else 'truncation'})",
                      flush=True)
                self.tile_cap_limit = feas
            if getattr(cfg.tpu, "check_vmem_cap", True):
                # Compiler-truth guard: fail loudly NOW if the
                # calibrated ceiling no longer compiles on this
                # toolchain (render/vmem_check.py).
                from gftorf_tpu.render.vmem_check import check_bwd_cap

                check_bwd_cap(cfg.tpu.tile_h, cfg.tpu.tile_w,
                              self.tile_cap_limit, need_dd=dd_possible,
                              need_distribution=False)
        self._tile_limit_warned = False
        # Duplicate-list capacity factor: grown (and the step replayed)
        # on overflow, mirroring the tile-cap escalation — the reference
        # sizes this buffer exactly every step (rasterizer_impl.cu:311)
        # and is never lossy, so silent truncation is not acceptable.
        self.dup_factor = cfg.tpu.dup_factor
        self.dup_factor_limit = max(
            self.dup_factor, getattr(cfg.tpu, "dup_factor_limit", 96))
        self._dup_limit_warned = False
        # Adaptive shrinking (the other half of exact sizing: the
        # reference allocates both buffers to the step's exact need,
        # rasterizer_impl.cu:311 — growth-on-overflow bounds us from
        # below, this tracking reclaims the headroom from above so
        # gather volume and kernel depth-lanes follow the scene).
        self.shrink_window = getattr(cfg.tpu, "shrink_window", 200)
        self.tile_cap_floor = getattr(cfg.tpu, "max_per_tile_floor", 256)
        self.dup_factor_floor = getattr(cfg.tpu, "dup_factor_floor", 2)
        self._occ_steps = 0
        self._occ_tile_max = 0
        self._occ_rendered_max = 0

        # Device mesh: (data, shard) from TpuParams. data batches cameras
        # (DP, grads averaged), shard splits each render + the deform MLP
        # (parallel/sharded.py). Densify/prune stay host-driven on the
        # replicated state, so nothing else changes.
        data_ax = max(1, cfg.tpu.mesh_data)
        shard_ax = max(1, cfg.tpu.mesh_shards)
        if data_ax * shard_ax > 1:
            n_dev = len(jax.devices())
            if data_ax * shard_ax > n_dev:
                raise ValueError(
                    f"mesh_data*mesh_shards={data_ax * shard_ax} exceeds "
                    f"available devices ({n_dev})"
                )
            self.mesh_shape = (data_ax, shard_ax)
        else:
            self.mesh_shape = None
        self.data_ax = data_ax

        if self.scene.scene_type == "torf":
            self.render_regions = ("dynamic",)
        elif m.init_static_first:
            self.render_regions = ("static",)
        else:
            self.render_regions = ("static", "dynamic")

        self.deform_bucket = 0
        self.render_bucket = 0
        self._update_deform_bucket()

    def _update_deform_bucket(self):
        """Compaction buckets, host-tracked as next pow2 over the live
        counts (+5% headroom): the deform MLP evaluates only the
        dynamic+alive rows, the render path preprocesses only the alive
        rows. Both counts change exclusively at densify/prune events,
        which is exactly when this is recalled; a bucket change costs
        one recompile of the step."""
        cap = int(self.model.aux.alive.shape[0])

        def bucket(count):
            b = 1024
            while b < int(count * 1.05) + 1:
                b *= 2
            return 0 if b >= cap else b

        if self.cfg.model.dynamic:
            self.deform_bucket = bucket(int(jnp.sum(
                get_motion_mask(self.model.params) & self.model.aux.alive
            )))
        else:
            self.deform_bucket = 0
        if self.cfg.tpu.compact_render:
            self.render_bucket = bucket(int(jnp.sum(self.model.aux.alive)))
        else:
            self.render_bucket = 0

    # ------------------------------------------------------------------
    def _raster_config(self, tof: bool):
        cfg = self.scene.raster_config(tof, self.cfg.model.sh_degree)
        if (cfg.max_per_tile != self.tile_cap
                or cfg.dup_factor != self.dup_factor
                or cfg.flat_stream != self.flat_stream):
            cfg = dataclasses.replace(cfg, max_per_tile=self.tile_cap,
                                      dup_factor=self.dup_factor,
                                      flat_stream=self.flat_stream)
        return cfg

    def _static_for(self, iteration: int,
                    flow_frame: Optional[bool] = None) -> StepStatic:
        m, opt = self.cfg.model, self.opt
        dynamic_on = m.dynamic and iteration > opt.warm_up
        regions = self.render_regions
        if dynamic_on and self.scene.scene_type == "ftorf":
            regions = ("static", "dynamic")
        # Channel gates: the step's loss never reads the first-sample
        # distribution, and the depth-distortion channel only inside the
        # dd window — drop the unused compositor work (settings.py flags;
        # eval/render paths build their own default configs).
        dd_on = (opt.lambda_dd != 0.0
                 and opt.dd_loss_iter_end > opt.dd_loss_iter_start + 1)
        return StepStatic(
            scene_type=self.scene.scene_type,
            # The loss reads depth_distortion from the ToF render only
            # (step.py consumes out_tof.depth_distortion), so the color
            # config drops it even inside the dd window.
            config_color=dataclasses.replace(
                self._raster_config(False),
                need_dd=False, need_distribution=False),
            config_tof=dataclasses.replace(
                self._raster_config(True),
                need_dd=dd_on, need_distribution=False),
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
            # Loss windows and the tof_iters color flip are traced
            # weight gates inside the step (_weights_at) — these static
            # flags only say whether the term exists at all, so window
            # boundaries never recompile the program.
            # strict <: the traced flip is `it > tof_iters`, so a flip
            # scheduled at the final iteration never takes effect
            color_on=(opt.lambda_color != 0.0
                      or 0 < opt.tof_iters < opt.iterations),
            depth_on=opt.lambda_depth != 0.0,
            dd_on=dd_on,
            oe_on=opt.use_opacity_entropy_loss,
            scale_on=opt.use_scale_loss,
            mlp_reg_on=opt.lambda_mlp_reg != 0.0,
            flow_on=(self.scene.scene_type == "ftorf"
                     and opt.lambda_flow != 0.0 and dynamic_on),
            # Static only when the step actually reads it (otherwise a
            # spurious second compile variant) — see StepStatic docs.
            flow_frame=(
                flow_frame
                if (self.scene.scene_type == "ftorf"
                    and opt.lambda_flow != 0.0 and dynamic_on)
                else None
            ),
            optimize_phase_offset=opt.optimize_phase_offset,
            optimize_dc_offset=opt.optimize_dc_offset,
            random_bg=m.random_bg_color,
            bg_color=tuple(m.bg_color),
            tof_permutation=self.scene.tof_permutation,
            tof_inverse_permutation=self.scene.tof_inverse_permutation,
            scene_extent=self.scene.scene_extent,
            single_camera=self.scene.cameras_identical,
            deform_sync=iteration <= opt.optimize_sync_iters,
            frozen_gauss=iteration >= opt.densify_until_iter,
            # Initial values: the tof_iters flip of lambda_color and the
            # reset-interval halving happen in-jit (traced on `it`), so
            # the host-mutated copies must NOT leak into the static
            # config (that would recompile at the flip and double-halve
            # the interval on resume).
            sched=SchedStatic.from_opt(opt, opt.lambda_color,
                                       opt.opacity_reset_interval),
            mesh_shape=self.mesh_shape,
            deform_bucket=self.deform_bucket,
            render_bucket=self.render_bucket,
            # GFTORF_COMPACT_LAYOUT=0: A/B escape hatch back to the
            # round-4 gather/scatter bucket path (the sorted-layout
            # invariant still holds; only the slice-based consumption
            # is disabled).
            compact_layout=(
                os.environ.get("GFTORF_COMPACT_LAYOUT", "1") != "0"),
            deform_clip=self.cfg.tpu.deform_clip,
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
    def _dispatch(self, it: int, idx: int, static: StepStatic) -> dict:
        """Dispatch one step and record it in the pending pipeline."""
        prev = (self.model, self.deform, self.deform_adam)
        self.model, self.deform, self.deform_adam, packed = train_step(
            static, self.model, self.deform, self.deform_adam,
            self.scene.train_frames, idx, it, self.key,
        )
        try:
            packed.copy_to_host_async()
        except AttributeError:
            pass
        rec = {"it": it, "idx": idx, "static": static, "packed": packed,
               "prev": prev}
        self._pending.append(rec)
        return rec

    def _resolve_one(self) -> dict:
        """Fetch the oldest pending record's metrics; react to overflow."""
        rec = self._pending.pop(0)
        vals = np.asarray(rec["packed"])
        metrics = dict(zip(METRIC_NAMES, [float(v) for v in vals]))

        if metrics["compact_overflow"] > 0:
            # Invariant violation, not a data condition: the render
            # bucket is sized from the alive count at every event that
            # can change it. Truncated rows would silently drop points.
            # (The count is data-axis-averaged — report it raw.)
            raise RuntimeError(
                f"render compaction truncated rows at iter {rec['it']} "
                f"(mean over data slices: {metrics['compact_overflow']}, "
                f"bucket at dispatch: {rec['static'].render_bucket}) — "
                f"bucket tracking bug"
            )
        if self._overflowed(metrics):
            metrics = self._grow_and_replay(rec, metrics)
        else:
            # Unrecoverable overflow (every ceiling already reached —
            # possible when caps start at their limits, e.g. a resumed
            # run): the grow-and-replay path never runs, so the loud
            # truncation warnings must fire here.
            if metrics["tile_overflow"] > 0:
                self._warn_tile_limit(rec["it"], metrics["tile_overflow"])
            if metrics["dup_overflow"] > 0:
                self._warn_dup_limit(rec["it"])
        self._note_occupancy(metrics)

        loss = metrics["loss"]
        self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
        now = time.perf_counter()
        out = {
            "iteration": rec["it"],
            "idx": int(np.atleast_1d(rec["idx"])[0]),
            "loss": loss,
            "l1_p": metrics["l1_p"],
            "ema_loss": self.ema_loss,
            "iter_time": now - self._last_resolve_t,
            "num_points": int(metrics["num_points"]),
            "visible": int(metrics["visible"]),
            "dup_overflow": bool(metrics["dup_overflow"]),
            "tile_overflow": int(metrics["tile_overflow"]),
        }
        self._last_resolve_t = now
        self.history.append(out)
        return out

    def _note_occupancy(self, metrics: dict) -> None:
        """Track buffer occupancy high-water marks and shrink capacities
        sitting far above need (see TpuParams.shrink_window). Shrinks
        need no replay — nothing was lost — and an over-eager shrink is
        self-correcting via the grow-and-replay overflow path."""
        if self.shrink_window <= 0:
            return
        self._occ_steps += 1
        self._occ_tile_max = max(self._occ_tile_max,
                                 int(metrics["tile_max"]))
        self._occ_rendered_max = max(self._occ_rendered_max,
                                     int(metrics["rendered_max"]))
        if self._occ_steps < self.shrink_window:
            return
        shrunk = []
        tile_target = self._tile_cap_need(self._occ_tile_max)
        # Auto-engaged flat-stream disengages once the deepest observed
        # tile fits the dense ceiling with the same 1.5x hysteresis the
        # shrinks use — the dense kernels are ~10-15% faster per step,
        # so reclaiming them when the scene thins out matters. An
        # over-eager switch-back self-corrects through grow-and-replay
        # (which re-engages flat at the ceiling).
        if (self.flat_stream and self._flat_auto
                and tile_target * 3 <= self.tile_cap_limit * 2):
            print(f"[iter {self.iteration}] occupancy tracking: deepest "
                  f"tile {self._occ_tile_max} fits the dense ceiling "
                  f"{self.tile_cap_limit}; flat-stream fallback off "
                  f"(max_per_tile -> {tile_target})", flush=True)
            self.flat_stream = False
            self._flat_auto = False
            self.tile_cap = tile_target
            self._occ_steps = 0
            self._occ_tile_max = 0
            self._occ_rendered_max = 0
            return
        # Hysteresis: shrink only past a 1.5x gap (each capacity change
        # recompiles the step). Growth lands exactly at need * margin,
        # so the [need, 1.5*need] band absorbs occupancy fluctuation
        # without oscillating. Flat-stream mode has no tile-depth
        # capacity — changing max_per_tile there would only recompile
        # the step for nothing.
        if (not self.flat_stream
                and tile_target * 3 <= self.tile_cap * 2):
            shrunk.append(f"max_per_tile {self.tile_cap} -> {tile_target} "
                          f"(deepest tile {self._occ_tile_max})")
            self.tile_cap = tile_target
        dup_target = self._dup_factor_need(self._occ_rendered_max)
        if dup_target * 3 <= self.dup_factor * 2:
            shrunk.append(
                f"dup_factor {self.dup_factor} -> {dup_target} "
                f"(max rendered {self._occ_rendered_max})"
            )
            self.dup_factor = dup_target
        if shrunk:
            print(f"[iter {self.iteration}] occupancy tracking: "
                  + "; ".join(shrunk), flush=True)
        self._occ_steps = 0
        self._occ_tile_max = 0
        self._occ_rendered_max = 0

    _CAP_MARGIN = 1.35

    def _tile_cap_need(self, tile_max: int) -> int:
        """128-aligned max_per_tile for an observed deepest tile."""
        return max(self.tile_cap_floor,
                   -(-int(tile_max * self._CAP_MARGIN) // 128) * 128)

    def _dup_factor_need(self, rendered_max: int) -> int:
        """dup_factor for an observed instance total (num_rendered is
        computed pre-clip, so it is the true need even on overflow)."""
        p_rows = self.render_bucket or int(self.model.aux.alive.shape[0])
        return max(self.dup_factor_floor,
                   -(-int(rendered_max * self._CAP_MARGIN) // p_rows))

    def _overflowed(self, metrics: dict) -> bool:
        """True when a recoverable capacity was exceeded this step (the
        reference sizes both buffers exactly every step and is never
        lossy: rasterizer_impl.cu:311 / forward.cu:424-676). A tile
        overflow at the dense VMEM ceiling is still recoverable while
        the flat-stream fallback is available."""
        tile_fixable = (self.tile_cap < self.tile_cap_limit
                        or (not self.flat_stream
                            and self._flat_fallback_ok))
        return ((metrics["tile_overflow"] > 0 and tile_fixable)
                or (metrics["dup_overflow"] > 0
                    and self.dup_factor < self.dup_factor_limit))

    def _grow_and_replay(self, rec: dict, metrics: dict) -> dict:
        """Capacity overflow (tile-depth truncation or duplicate-list
        truncation): grow whichever capacity overflowed and
        deterministically replay from the pre-step state — same
        (it, idx, key) sequence, so the corrected run is bit-identical
        to a run that started with the larger capacity.
        """
        replay = [rec] + self._pending
        self._pending = []
        while True:
            grew = []
            if metrics["tile_overflow"] > 0:
                if self.tile_cap < self.tile_cap_limit:
                    # Size to the measured need (the reference allocates
                    # exactly, rasterizer_impl.cu:311) instead of
                    # doubling: a doubling overshoot sits inside the
                    # shrink hysteresis band and is never reclaimed.
                    # tile_max is the pre-clip deepest tile, valid
                    # unless the duplicate list itself clipped — then
                    # the next replay iteration remeasures with the
                    # grown duplicate capacity.
                    self.tile_cap = min(
                        max(self._tile_cap_need(int(metrics["tile_max"])),
                            self.tile_cap + 128),
                        self.tile_cap_limit,
                    )
                    grew.append(f"max_per_tile={self.tile_cap} (dropped "
                                f"{int(metrics['tile_overflow'])} instances)")
                elif not self.flat_stream and self._flat_fallback_ok:
                    # Dense tile cap exhausted (the VMEM-calibrated
                    # ceiling): switch to the exact flat-stream
                    # compositor instead of truncating — tile depth is
                    # not a kernel dimension there, so the scene's
                    # crowding cannot overflow it. Disengages via
                    # occupancy tracking when the scene thins out.
                    self.flat_stream = True
                    self._flat_auto = True
                    grew.append(
                        f"flat_stream=True (deepest tile "
                        f"{int(metrics['tile_max'])} exceeds the dense "
                        f"VMEM ceiling {self.tile_cap_limit}; exact "
                        f"stream fallback)")
            if (metrics["dup_overflow"] > 0
                    and self.dup_factor < self.dup_factor_limit):
                self.dup_factor = min(
                    max(self._dup_factor_need(int(metrics["rendered_max"])),
                        self.dup_factor + 1),
                    self.dup_factor_limit,
                )
                grew.append(f"dup_factor={self.dup_factor}")
            if not grew:
                break
            print(f"[iter {rec['it']}] capacity overflow -> "
                  f"{', '.join(grew)}, replaying", flush=True)
            self.model, self.deform, self.deform_adam = rec["prev"]
            for r in replay:
                static = dataclasses.replace(
                    r["static"],
                    config_color=dataclasses.replace(
                        r["static"].config_color,
                        max_per_tile=self.tile_cap,
                        dup_factor=self.dup_factor,
                        flat_stream=self.flat_stream),
                    config_tof=dataclasses.replace(
                        r["static"].config_tof,
                        max_per_tile=self.tile_cap,
                        dup_factor=self.dup_factor,
                        flat_stream=self.flat_stream),
                )
                self._dispatch(r["it"], r["idx"], static)
            rec = self._pending.pop(0)
            replay = [rec] + self._pending
            self._pending = []
            vals = np.asarray(rec["packed"])
            metrics = dict(zip(METRIC_NAMES, [float(v) for v in vals]))
            if not self._overflowed(metrics):
                self._pending = replay[1:]
                break
        if metrics["tile_overflow"] > 0:
            self._warn_tile_limit(rec["it"], metrics["tile_overflow"])
        if metrics["dup_overflow"] > 0:
            self._warn_dup_limit(rec["it"])
        return metrics

    def _warn_tile_limit(self, it: int, dropped: float) -> None:
        """Loud one-time escalation when the tile cap ceiling is hit:
        from here on overflowing steps silently truncate the deepest
        instances (the per-record tile_overflow int in train_log.jsonl
        is the only other evidence)."""
        if self._tile_limit_warned:
            return
        self._tile_limit_warned = True
        print(f"[iter {it}] WARNING: tile overflow ({int(dropped)} instances"
              f" dropped) at max_per_tile_limit={self.tile_cap_limit};"
              " renders are truncated until the scene thins out"
              " (raise --max_per_tile_limit to keep exactness)", flush=True)

    def _warn_dup_limit(self, it: int) -> None:
        """Loud one-time escalation when the duplicate-list ceiling is
        hit: overflowing steps silently drop (gaussian, tile) instances
        past capacity (per-record dup_overflow bool in train_log.jsonl
        remains the evidence)."""
        if self._dup_limit_warned:
            return
        self._dup_limit_warned = True
        print(f"[iter {it}] WARNING: duplicate-list overflow at "
              f"dup_factor_limit={self.dup_factor_limit}; renders drop "
              "instances until the scene thins out (raise "
              "--dup_factor_limit to keep exactness)", flush=True)

    def drain(self) -> list:
        """Resolve every pending step (call before host-side events that
        read metrics or mutate model state)."""
        outs = []
        while self._pending:
            outs.append(self._resolve_one())
        return outs

    def step(self) -> list:
        """Advance one iteration; returns the list of *resolved* metric
        records (possibly empty while the pipeline fills, several at a
        drain point). Records carry their own 'iteration' key."""
        self.iteration += 1
        it = self.iteration
        m, opt = self.cfg.model, self.opt

        if it % 1000 == 0 and self.active_sh_degree < m.sh_degree:
            self.active_sh_degree += 1

        if self.data_ax > 1:
            idx = np.array(
                [self._pick_camera() for _ in range(self.data_ax)], np.int32
            )
            # DP batches mix flow/non-flow frames -> runtime gating.
            static = self._static_for(it)
        else:
            idx = self._pick_camera()
            fid = self.scene.data.train_cameras[idx].frame_id
            # GFTORF_STATIC_FLOW=0: A/B escape hatch back to the
            # runtime (lax.cond) flow gating of round 4.
            if os.environ.get("GFTORF_STATIC_FLOW", "1") == "0":
                static = self._static_for(it)
            else:
                static = self._static_for(it, flow_frame=bool(fid % 4 == 0))
        self._dispatch(it, idx, static)

        outs = []
        # --- Densification (train.py:441-464) — host-side events must see
        # replay-corrected state, so drain the pipeline first.
        if it < opt.densify_until_iter:
            if it > opt.densify_from_iter and it % opt.densification_interval == 0:
                outs += self.drain()
                size_thr = 10.0 if it > self.opacity_reset_interval else 0.0
                self._densify(size_thr)
            if it % self.opacity_reset_interval == 0:
                outs += self.drain()
                self._reset_opacity()
        elif (self.opt.use_opacity_entropy_loss
              and it % opt.densification_interval == 0):
            outs += self.drain()
            self.model = _sort_layout_step(
                prune_only(self.model, opt.min_opacity))
            self._update_deform_bucket()

        # tof_iters event (train.py:476-478)
        if it == opt.tof_iters:
            outs += self.drain()
            self.lambda_color = 1.0
            self.opacity_reset_interval = int(self.opacity_reset_interval / 2)

        while len(self._pending) > self.metrics_lag:
            outs.append(self._resolve_one())
        return outs

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
                self.model = _sort_layout_step(new_state)
                self._update_deform_bucket()
                return
            # Grow capacity and replay (deterministic given the same key).
            cap = self.model.aux.alive.shape[0]
            new_cap = int(cap * self.cfg.tpu.capacity_growth) + int(dropped)
            new_cap = -(-new_cap // 1024) * 1024
            self.model = grow_capacity(self.model, new_cap)
        print(f"[iter {self.iteration}] densification still dropping "
              f"{int(dropped)} points after 4 capacity growths — "
              "accepting truncated densify", flush=True)
        self.model = _sort_layout_step(new_state)
        self._update_deform_bucket()

    def _reset_opacity(self):
        regions = self.render_regions
        motion = get_motion_mask(self.model.params)
        if regions == ("static",):
            mask, use = ~motion, True
        elif regions == ("dynamic",):
            mask, use = motion, True
        else:
            mask, use = motion, False
        self.model = _reset_opacity_step(self.model, mask, use)

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
                # Grown capacities survive resume (a restart would
                # otherwise re-discover them via an overflow replay).
                "tile_cap": self.tile_cap,
                "dup_factor": self.dup_factor,
                # So does an auto-engaged flat-stream fallback.
                "flat_stream": self.flat_stream,
                "flat_auto": self._flat_auto,
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
        # Clamp restored capacities to this build's ceilings (the
        # checkpoint may predate a tightened VMEM-feasibility bound).
        self.tile_cap = min(int(meta.get("tile_cap", self.tile_cap)),
                            self.tile_cap_limit)
        self.dup_factor = min(int(meta.get("dup_factor", self.dup_factor)),
                              self.dup_factor_limit)
        # An auto-engaged flat fallback resumes engaged (only honored
        # where the fallback is available: the flag would otherwise
        # select a Pallas path on a CPU resume, where rasterize()
        # ignores it anyway).
        if meta.get("flat_stream") and (self._flat_fallback_ok
                                        or self.cfg.tpu.flat_stream):
            self.flat_stream = True
            # Only an AUTO-engaged fallback may auto-disengage; a run
            # configured flat_stream=true stays flat regardless of what
            # the checkpointing run did.
            self._flat_auto = (bool(meta.get("flat_auto", False))
                               and not self.cfg.tpu.flat_stream)
        # Checkpoints may predate the sorted-layout invariant.
        self.model = _sort_layout_step(self.model)
        self._update_deform_bucket()
