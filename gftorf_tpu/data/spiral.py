"""Spiral render-path synthesis (torf_utils.py:331-403), numpy host-side."""

from __future__ import annotations

import numpy as np


def _normalize(v, axis=-1, eps=1e-6):
    return v / (np.linalg.norm(v, ord=2, axis=axis, keepdims=True) + eps)


def viewmatrix(z, up, pos):
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], 1)


def poses_avg(poses):
    hwf = poses[0, :3, -1:]
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return np.concatenate([viewmatrix(vec2, up, center), hwf], 1)


def render_path_spiral(c2w, up, rads, focal, zrate, rots, n):
    render_poses = []
    rads = np.array(list(rads) + [1.0])
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, n + 1)[:-1]:
        c = np.dot(
            c2w[:3, :4],
            np.array([np.sin(-theta), np.cos(-theta), np.sin(-theta * zrate), 1.0])
            * rads,
        )
        z = _normalize(-c + np.dot(c2w[:3, :4], np.array([0, 0, focal, 1.0])))
        pose = np.eye(4)
        pose[:3, :4] = viewmatrix(z, up, c)
        render_poses.append(pose)
    return render_poses


def get_render_poses_spiral(focal_length, bounds, poses, n_views=60, n_rots=2):
    poses = np.array(poses)
    if focal_length < 0:
        close, inf = bounds.min() * 0.9, bounds.max() * 5.0
        dt = 0.75
        focal_length = 1.0 / ((1.0 - dt) / close + dt / inf)
    c2w = poses_avg(poses)
    up = _normalize(poses[:, :3, 1].sum(0))
    tt = poses[:, :3, 3] - c2w[:3, 3]
    if np.sum(tt) < 1e-10:
        tt = np.array([1.0, 1.0, 1.0])
    rads = np.percentile(np.abs(tt), 90, 0) * np.ones(3) / 3.0
    return np.array(
        render_path_spiral(c2w, up, rads, focal_length, zrate=0.5,
                           rots=n_rots, n=n_views)
    ).astype(np.float32)


def recenter_poses(poses):
    poses_ = poses + 0
    bottom = np.reshape([0, 0, 0, 1.0], [1, 4])
    c2w = poses_avg(poses)
    c2w = np.concatenate([c2w[:3, :4], bottom], -2)
    bottom_t = np.tile(np.reshape(bottom, [1, 1, 4]), [poses.shape[0], 1, 1])
    p = np.concatenate([poses[:, :3, :4], bottom_t], -2)
    p = np.linalg.inv(c2w) @ p
    poses_[:, :3, :4] = p[:, :3, :4]
    return poses_, np.linalg.inv(c2w)
