"""Render-path generation: interpolated camera trajectories.

TPU-side equivalent of the reference's path machinery
(``camera_utils.py:133-350``): the Waymo render path re-uses one physical
camera's trajectory (reference render.py / datasets.py:1130-1140 subsample
``poses[::cam_num]``); this module adds smooth interpolation between those
keyframes (linear positions + quaternion slerp on rotations) to hit an
arbitrary frame count.
"""

from __future__ import annotations

import numpy as np


def _rotmat_to_quat(m):
    """3x3 rotation -> quaternion [x, y, z, w]."""
    t = np.trace(m)
    if t > 0:
        s = 0.5 / np.sqrt(t + 1.0)
        return np.array([(m[2, 1] - m[1, 2]) * s, (m[0, 2] - m[2, 0]) * s,
                         (m[1, 0] - m[0, 1]) * s, 0.25 / s])
    i = np.argmax([m[0, 0], m[1, 1], m[2, 2]])
    j, k = (i + 1) % 3, (i + 2) % 3
    s = 2.0 * np.sqrt(max(1.0 + m[i, i] - m[j, j] - m[k, k], 1e-12))
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (m[j, i] + m[i, j]) / s
    q[k] = (m[k, i] + m[i, k]) / s
    q[3] = (m[k, j] - m[j, k]) / s
    return q


def _quat_to_rotmat(q):
    x, y, z, w = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _slerp(q0, q1, t):
    d = np.clip(np.dot(q0, q1), -1, 1)
    if d < 0:
        q1, d = -q1, -d
    if d > 0.9995:
        q = q0 + t * (q1 - q0)
        return q / np.linalg.norm(q)
    theta = np.arccos(d)
    return (np.sin((1 - t) * theta) * q0 + np.sin(t * theta) * q1) / np.sin(
        theta)


def interpolate_poses(keyframes, num_frames):
    """Smoothly interpolate [K, 4, 4] keyframe poses to [num_frames, 4, 4]."""
    keyframes = np.asarray(keyframes, np.float64)
    k = len(keyframes)
    if k == 1:
        return np.tile(keyframes, (num_frames, 1, 1)).astype(np.float32)
    quats = [_rotmat_to_quat(p[:3, :3]) for p in keyframes]
    out = []
    for f in range(num_frames):
        u = f * (k - 1) / max(num_frames - 1, 1)
        i = min(int(u), k - 2)
        t = u - i
        pose = np.eye(4)
        pose[:3, :3] = _quat_to_rotmat(_slerp(quats[i], quats[i + 1], t))
        pose[:3, 3] = ((1 - t) * keyframes[i][:3, 3]
                       + t * keyframes[i + 1][:3, 3])
        out.append(pose)
    return np.asarray(out, np.float32)


def render_path_from_dataset(dataset, num_frames, cam_stride=None):
    """Build a render path from one physical camera's trajectory.

    Mirrors the reference's Waymo path (poses[::cam_num], datasets.py:1130),
    then interpolates to `num_frames`.
    """
    stride = cam_stride or dataset.cam_num
    keyframes = dataset.camtoworlds[::stride]
    return interpolate_poses(keyframes, num_frames)
