#!/usr/bin/env python
"""Training CLI, reference-compatible (train.py in brownvc/gftorf).

Usage:
    python train.py --config configs/ftorf.json [--source_path ...] [...]

Any ModelParams / OptimizationParams / PipelineParams / TpuParams field
can be overridden on the command line; precedence is defaults < JSON <
CLI, matching the reference (train.py:605-643).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from gftorf_tpu.config import (
        Config,
        ModelParams,
        OptimizationParams,
        PipelineParams,
        TpuParams,
    )

    parser = argparse.ArgumentParser(description="gftorf_tpu training")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (tpu/cpu); the TPU "
                             "plugin overrides JAX_PLATFORMS, this wins")
    parser.add_argument("--profile_steps", type=int, nargs=2, default=None,
                        metavar=("START", "END"),
                        help="capture a jax.profiler trace between these "
                             "iterations (written to model_path/profile)")
    parser.add_argument("--test_iterations", nargs="+", type=int, default=None)
    parser.add_argument("--save_iterations", nargs="+", type=int, default=None)
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=None)
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize() (coordinator "
                             "address / process count / process id from the "
                             "standard JAX env vars) before any device "
                             "enumeration. The compiled train step and its "
                             "collectives are mesh-portable (see "
                             "tests/test_multiprocess.py for a 2-process "
                             "run of the step program), but this Trainer is "
                             "single-controller: run it with num_processes=1 "
                             "over the devices one process can address; the "
                             "multi-process host loop (process-gated IO, "
                             "global-array data feeding) is not wired yet")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans: every jitted program "
                             "re-runs op-by-op and raises at the first NaN "
                             "producer (the reference's --detect_anomaly, "
                             "train.py:615,636). Slow; debugging only")
    parser.add_argument("--tensorboard", action="store_true",
                        help="also write TensorBoard event files to "
                             "model_path (scalars every logged iter, "
                             "per-split metrics + histograms at evals), "
                             "mirroring the reference's SummaryWriter "
                             "(train.py:410-433,581-601); off by default "
                             "because the torch TB import costs ~10 s")
    for group in (ModelParams(), OptimizationParams(), PipelineParams(),
                  TpuParams()):
        for f in dataclasses.fields(group):
            if f.name in ("test_iterations", "save_iterations",
                          "checkpoint_iterations"):
                continue
            default = getattr(group, f.name)
            if isinstance(default, bool):
                parser.add_argument(f"--{f.name}", type=lambda s: s.lower()
                                    in ("1", "true", "yes"), default=None)
            elif isinstance(default, list):
                parser.add_argument(f"--{f.name}", nargs=len(default),
                                    type=float, default=None)
            else:
                parser.add_argument(f"--{f.name}", type=type(default),
                                    default=None)
    return parser


def main(argv=None):
    from gftorf_tpu.config import Config

    parser = build_parser()
    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        import jax

        # Must run before any backend/device enumeration; idempotent
        # guards are the caller's job (one initialize per process).
        jax.distributed.initialize()
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    from gftorf_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    overrides = {k: v for k, v in vars(args).items()
                 if k not in ("config", "quiet", "start_checkpoint",
                              "platform", "profile_steps", "distributed",
                              "debug_nans")
                 and v is not None}
    cfg = Config.from_json(args.config, overrides)

    os.makedirs(cfg.model.model_path, exist_ok=True)
    cfg.save(cfg.model.model_path)

    from gftorf_tpu.train.loop import Trainer
    from gftorf_tpu.train.evaluate import evaluate_and_report

    trainer = Trainer(cfg)
    if args.start_checkpoint:
        trainer.load_checkpoint(args.start_checkpoint)

    iterations = cfg.opt.iterations
    test_iters = args.test_iterations
    if test_iters is None:
        test_iters = [1] + list(
            np.linspace(0, iterations, iterations // 1000 + 1).astype(int)
        )
    save_iters = args.save_iterations or [iterations // 2, iterations]
    ckpt_iters = args.checkpoint_iterations or []

    t_start = time.time()
    log_path = os.path.join(cfg.model.model_path, "train_log.jsonl")
    log_f = open(log_path, "a")
    profile_range = args.profile_steps

    tb = None
    if args.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb = SummaryWriter(cfg.model.model_path)
        except ImportError:
            print("tensorboard requested but not importable; "
                  "continuing with train_log.jsonl only", flush=True)

    def handle_record(out):
        oit = out["iteration"]
        if profile_range and oit == profile_range[1]:
            import jax

            jax.profiler.stop_trace()
            print(f"profiler trace written to "
                  f"{cfg.model.model_path}/profile", flush=True)
        if oit % 50 == 0 or oit == 1:
            log_f.write(json.dumps(out) + "\n")
            log_f.flush()
            if tb is not None:
                for k, v in out.items():
                    if isinstance(v, (int, float)) and k != "iteration":
                        tb.add_scalar(f"train/{k}", v, oit)
        if not args.quiet and (oit % 200 == 0 or oit == 1):
            print(
                f"[{oit}/{iterations}] loss {out['ema_loss']:.5f} "
                f"pts {out['num_points']} vis {out['visible']} "
                f"{out['iter_time']*1e3:.1f} ms", flush=True,
            )
        if cfg.pipe.debug and (oit % cfg.tpu.debug_interval == 0
                               or oit == 1):
            from gftorf_tpu.train.debug import dump_debug_images

            # label with the trainer's live iteration: the model state is
            # metrics_lag steps ahead of this resolved record
            dump_debug_images(trainer, out["idx"], trainer.iteration)

    while trainer.iteration < iterations:
        if profile_range and trainer.iteration + 1 == profile_range[0]:
            import jax

            jax.profiler.start_trace(
                os.path.join(cfg.model.model_path, "profile")
            )
        outs = trainer.step()
        it = trainer.iteration
        if it in test_iters or it in save_iters or it in ckpt_iters:
            outs += trainer.drain()
        for out in outs:
            handle_record(out)
        if it in test_iters:
            from gftorf_tpu.train.debug import param_histograms

            report = evaluate_and_report(trainer)
            log_f.write(json.dumps({"eval": report, "iteration": it}) + "\n")
            log_f.write(json.dumps({
                "histograms": param_histograms(trainer.model),
                "iteration": it,
            }) + "\n")
            log_f.flush()
            if tb is not None:
                from gftorf_tpu.train.debug import param_series

                for split, metrics in report.items():
                    for k, v in metrics.items():
                        if isinstance(v, (int, float)):
                            tb.add_scalar(f"{split}/{k}", v, it)
                for name, vals in param_series(trainer.model).items():
                    if vals.size:
                        tb.add_histogram(f"scene/{name}", vals, it)
            if not args.quiet:
                print(f"[eval {it}] {report}", flush=True)
        if it in save_iters:
            from gftorf_tpu.train.export import save_scene_artifacts

            save_scene_artifacts(trainer, it)
        if it in ckpt_iters:
            trainer.save_checkpoint(
                os.path.join(cfg.model.model_path, f"chkpnt{it}.npz")
            )
    for out in trainer.drain():
        handle_record(out)
    log_f.close()
    print(f"Training complete in {time.time()-t_start:.1f} s")


if __name__ == "__main__":
    main()
