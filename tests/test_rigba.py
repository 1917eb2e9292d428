"""Synthetic-geometry tests of the native rig bundle adjuster.

Follows the reference's BA test strategy (SURVEY.md §4,
optim/bundle_adjustment_test.cc): build a synthetic multi-camera rig with
known geometry, perturb, solve, and assert which parameter blocks moved and
that the solution recovers the ground truth.
"""

import numpy as np
import pytest

from ucnerf_tpu.pose import rigba


def _quat_from_axis_angle(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])


def _qrot(q, v):
    w, x, y, z = q
    u = np.array([x, y, z])
    return (v + 2 * w * np.cross(u, v) + 2 * np.cross(u, np.cross(u, v)))


def _make_scene(rng, num_snapshots=6, num_cameras=3, num_points=80,
                noise_px=0.0):
    """Rig moving along x, looking at a point cloud in front (+z)."""
    intr = np.tile([[100.0, 100.0, 64.0, 48.0]], (num_cameras, 1))
    # Ground-truth rig (world-to-rig): rig at x = s * 0.5.
    rig_q = np.tile([[1.0, 0, 0, 0]], (num_snapshots, 1))
    rig_t = np.stack([[-0.5 * s, 0.0, 0.0] for s in range(num_snapshots)])
    # Relative poses: small yaw offsets + x baselines (camera 0 = identity).
    rel_q = np.stack([
        _quat_from_axis_angle([0, 1, 0], 0.08 * c) for c in
        range(num_cameras)])
    rel_q[0] = [1, 0, 0, 0]
    rel_t = np.stack([[0.3 * c, 0.0, 0.0] for c in range(num_cameras)])
    rel_t[0] = 0

    pts = np.stack([
        rng.uniform(-3, 3 + 0.5 * num_snapshots, num_points),
        rng.uniform(-2, 2, num_points),
        rng.uniform(4, 9, num_points),
    ], axis=1)

    obs_s, obs_c, obs_p, obs_xy = [], [], [], []
    for s in range(num_snapshots):
        for c in range(num_cameras):
            for p in range(num_points):
                x_rig = _qrot(rig_q[s], pts[p]) + rig_t[s]
                x_cam = _qrot(rel_q[c], x_rig) + rel_t[c]
                if x_cam[2] < 0.5:
                    continue
                u = intr[c, 0] * x_cam[0] / x_cam[2] + intr[c, 2]
                v = intr[c, 1] * x_cam[1] / x_cam[2] + intr[c, 3]
                if not (0 <= u < 128 and 0 <= v < 96):
                    continue
                obs_s.append(s)
                obs_c.append(c)
                obs_p.append(p)
                obs_xy.append([u + rng.normal(0, noise_px),
                               v + rng.normal(0, noise_px)])
    return (rig_q, rig_t, rel_q, rel_t, pts, intr,
            np.array(obs_s), np.array(obs_c), np.array(obs_p),
            np.array(obs_xy))


def test_zero_residual_at_ground_truth(rng):
    rig_q, rig_t, rel_q, rel_t, pts, intr, os_, oc, op, oxy = _make_scene(rng)
    out = rigba.solve(rig_q, rig_t, rel_q, rel_t, pts, intr, os_, oc, op,
                      oxy, fix_points=True, fix_rig_poses=True,
                      fix_rel_rot=True, fix_rel_trans=True, max_iterations=1)
    assert out[-1] < 1e-9


def test_recovers_perturbed_rig_poses(rng):
    rig_q, rig_t, rel_q, rel_t, pts, intr, os_, oc, op, oxy = _make_scene(rng)
    rig_t_pert = rig_t + rng.normal(0, 0.05, rig_t.shape)
    out = rigba.solve(rig_q.copy(), rig_t_pert, rel_q.copy(), rel_t.copy(),
                      pts.copy(), intr, os_, oc, op, oxy,
                      fix_rel_rot=True, fix_rel_trans=True, fix_points=True,
                      max_iterations=30, huber_delta=0.0)
    rq, rt, _, _, _, cost = out
    assert cost < 1e-6, cost
    np.testing.assert_allclose(rt, rig_t, atol=1e-4)


def test_fix_trans_refine_rot_recovers_rel_rotation(rng):
    """The UC-NeRF mode: relative translations stay put, rotations refine."""
    rig_q, rig_t, rel_q, rel_t, pts, intr, os_, oc, op, oxy = _make_scene(rng)
    rel_q_pert = rel_q.copy()
    dq = _quat_from_axis_angle([0, 1, 0], 0.02)
    # Perturb camera 1's relative rotation.
    w, x, y, z = rel_q[1]
    pw, px, py, pz = dq
    rel_q_pert[1] = [
        pw * w - px * x - py * y - pz * z,
        pw * x + px * w + py * z - pz * y,
        pw * y - px * z + py * w + pz * x,
        pw * z + px * y - py * x + pz * w,
    ]
    rel_t_before = rel_t.copy()
    out = rigba.solve(rig_q.copy(), rig_t.copy(), rel_q_pert, rel_t.copy(),
                      pts.copy(), intr, os_, oc, op, oxy,
                      fix_rig_poses=True, fix_rel_trans=True,
                      fix_points=True, max_iterations=30, huber_delta=0.0)
    _, _, cq, ct, _, cost = out
    assert cost < 1e-6, cost
    # Translations unchanged (the fix_trans_refine_rot contract).
    np.testing.assert_array_equal(ct, rel_t_before)
    # Rotation recovered.
    np.testing.assert_allclose(np.abs(np.dot(cq[1], rel_q[1])), 1.0,
                               atol=1e-6)


def test_full_ba_with_noise_reduces_cost(rng):
    rig_q, rig_t, rel_q, rel_t, pts, intr, os_, oc, op, oxy = _make_scene(
        rng, noise_px=0.5)
    rig_t_pert = rig_t + rng.normal(0, 0.03, rig_t.shape)
    pts_pert = pts + rng.normal(0, 0.05, pts.shape)

    # Evaluate-only runs give the perturbed cost and the noise-floor cost
    # (the cost at the ground truth, irreducible with noisy observations).
    eval_only = dict(fix_rig_poses=True, fix_rel_rot=True,
                     fix_rel_trans=True, fix_points=True, max_iterations=1)
    before = rigba.solve(rig_q.copy(), rig_t_pert.copy(), rel_q.copy(),
                         rel_t.copy(), pts_pert.copy(), intr, os_, oc, op,
                         oxy, **eval_only)[-1]
    floor = rigba.solve(rig_q.copy(), rig_t.copy(), rel_q.copy(),
                        rel_t.copy(), pts.copy(), intr, os_, oc, op,
                        oxy, **eval_only)[-1]
    out = rigba.solve(rig_q.copy(), rig_t_pert, rel_q.copy(), rel_t.copy(),
                      pts_pert, intr, os_, oc, op, oxy,
                      fix_rel_trans=True, max_iterations=40)
    after = out[-1]
    assert after < before * 0.5, (before, after)
    # The solution should land at (or below) the noise floor.
    assert after <= floor * 1.1, (after, floor)


def test_triangulation_recovers_points(rng):
    rig_q, rig_t, rel_q, rel_t, pts, intr, os_, oc, op, oxy = _make_scene(rng)
    est, valid = rigba.triangulate(len(pts), os_, oc, op, oxy, rig_q, rig_t,
                                   rel_q, rel_t, intr, max_error=2.0)
    # Points observed from >= 2 views triangulate back to the truth.
    counts = np.bincount(op, minlength=len(pts))
    well_observed = counts >= 2
    assert valid[well_observed].mean() > 0.95
    np.testing.assert_allclose(est[valid], pts[valid], atol=1e-3)
