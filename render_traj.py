#!/usr/bin/env python
"""F-ToRF trajectory / quad-cadence visualization renderer.

Counterpart of the reference's render_ftorf_viz_traj.py (:836-858):
 - quad-by-quad rendering: the deformation is evaluated at every quad
   slot (4x the integration-frame rate), producing motion-interpolated
   depth/phasor sequences;
 - Gaussian 3D-trajectory tracking: sample dynamic Gaussians by motion
   magnitude quantiles, project their deformed positions over time, and
   draw fading 2D trajectories over the renders.

Usage:
    python render_traj.py --model_path output/scene [--iteration N]
                          [--num_tracks 64] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--num_tracks", type=int, default=64)
    parser.add_argument("--trail", type=int, default=12)
    parser.add_argument("--max_frames", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import imageio

    from gftorf_tpu.models.deform import apply_deform
    from gftorf_tpu.models.gaussians import get_motion_mask
    from gftorf_tpu.render_sets import load_trained
    from gftorf_tpu.data.scene import take_frame
    from gftorf_tpu.train.evaluate import eval_frame
    from gftorf_tpu.utils.viz import (
        depth_to_disp_viz_window,
        paper_viz_bounds,
        to8b,
    )

    trainer, cfg, it = load_trained(args.model_path, args.iteration)
    out_dir = os.path.join(args.model_path, f"traj_{it}")
    os.makedirs(os.path.join(out_dir, "depth_quad"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "traj"), exist_ok=True)
    for q in range(4):
        os.makedirs(os.path.join(out_dir, f"depth_q{q}"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, f"quad_q{q}"), exist_ok=True)
    inv_perm = list(trainer.scene.tof_inverse_permutation)

    scene = trainer.scene
    static = trainer._static_for(max(trainer.iteration, 1))
    # paper disparity window keyed by scene name (torf_utils.py:474-495)
    scene_name = os.path.basename(cfg.model.source_path.rstrip("/"))
    viz_lo, viz_hi, _ = paper_viz_bounds(scene_name)
    params = trainer.model.params
    motion = np.asarray(get_motion_mask(params) & trainer.model.aux.alive)
    n_frames = scene.num_train if not args.max_frames else min(
        scene.num_train, args.max_frames
    )
    denom = max(cfg.model.total_num_views - 1, 1)

    # --- select tracked Gaussians by motion-magnitude quantiles
    # (reference picks quantile-based samples, :276-296)
    xyz_n = np.asarray(params.xyz) / scene.scene_extent
    t0 = jnp.zeros((xyz_n.shape[0], 1))
    t1 = jnp.full((xyz_n.shape[0], 1), 0.5)
    d0 = np.asarray(apply_deform(trainer.deform, trainer.deform_cfg,
                                 jnp.asarray(xyz_n), t0)[0])
    d1 = np.asarray(apply_deform(trainer.deform, trainer.deform_cfg,
                                 jnp.asarray(xyz_n), t1)[0])
    mag = np.linalg.norm(d1 - d0, axis=-1) * motion
    idx_pool = np.where(motion & (mag > 0))[0]
    if idx_pool.size == 0:
        idx_pool = np.where(motion)[0]
    if idx_pool.size == 0:
        print("no dynamic gaussians to track")
        idx_sel = np.array([], np.int64)
    else:
        qs = np.quantile(mag[idx_pool], np.linspace(0.5, 0.99,
                                                    args.num_tracks))
        idx_sel = np.array(
            [idx_pool[np.argmin(np.abs(mag[idx_pool] - q))] for q in qs]
        )

    # --- per-frame renders + tracked 2D positions
    depth_frames, traj_frames = [], []
    tracks2d = []
    for fid in range(n_frames):
        frame = take_frame(scene.train_frames, fid)
        _, out_color, out_tof = eval_frame(
            static, params, trainer.deform, trainer.model.aux.alive, frame
        )
        depth = np.asarray(out_tof.depth[0])
        dimg = depth_to_disp_viz_window(depth, viz_lo, viz_hi)
        imageio.imwrite(
            os.path.join(out_dir, "depth_quad", f"{fid:04d}.png"), dimg
        )
        depth_frames.append(dimg)

        # per-quad-slot sequences (reference depth_qK / quad_qK at fps/4)
        q = int(frame.frame_id) % 4
        imageio.imwrite(
            os.path.join(out_dir, f"depth_q{q}", f"{fid:04d}.png"), dimg
        )
        phasor = np.asarray(out_tof.phasor)
        quad_im = np.abs(phasor[3:][inv_perm][q])
        quad_im = quad_im / max(float(quad_im.max()), 1e-6)
        imageio.imwrite(
            os.path.join(out_dir, f"quad_q{q}", f"{fid:04d}.png"),
            to8b(quad_im),
        )

        if idx_sel.size:
            t = jnp.full((idx_sel.size, 1), fid / denom)
            d_xyz = apply_deform(
                trainer.deform, trainer.deform_cfg,
                jnp.asarray(xyz_n[idx_sel]), t,
            )[0]
            pts = np.asarray(params.xyz)[idx_sel] + np.asarray(d_xyz)
            k = np.asarray(frame.intrinsics_tof)
            view_t = np.asarray(frame.cam_tof.viewmatrix)
            cam = pts @ view_t[:3, :3] + view_t[3, :3]
            uv = (k @ cam.T)
            uv = (uv[:2] / np.maximum(uv[2:], 1e-6)).T
            tracks2d.append(uv)

            # draw fading trails (reference :73-114)
            from PIL import Image, ImageDraw

            img = Image.fromarray(depth_frames[-1].copy())
            draw = ImageDraw.Draw(img)
            start = max(0, len(tracks2d) - args.trail)
            for t_i in range(start + 1, len(tracks2d)):
                fade = (t_i - start) / max(len(tracks2d) - start, 1)
                col = (int(255 * fade), int(50 * fade), int(255 * (1 - fade)))
                for j in range(idx_sel.size):
                    x0, y0 = tracks2d[t_i - 1][j]
                    x1, y1 = tracks2d[t_i][j]
                    draw.line([(x0, y0), (x1, y1)], fill=col, width=1)
            traj_frames.append(np.asarray(img))
            imageio.imwrite(
                os.path.join(out_dir, "traj", f"{fid:04d}.png"),
                traj_frames[-1],
            )

    if len(depth_frames) > 1:
        imageio.mimsave(os.path.join(out_dir, "depth_quad.gif"),
                        depth_frames, duration=0.08)
    if len(traj_frames) > 1:
        imageio.mimsave(os.path.join(out_dir, "traj.gif"),
                        traj_frames, duration=0.08)

    from gftorf_tpu.video_panel import (
        create_quad_cadence_panel,
        create_website_panel,
    )

    create_website_panel(args.model_path, it, traj_dir=out_dir)
    create_quad_cadence_panel(args.model_path, it, traj_dir=out_dir)
    print(f"trajectory renders written to {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
