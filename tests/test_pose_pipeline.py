"""End-to-end test of the spatiotemporal pose-refinement pipeline on a
synthetic rig: images rendered from TRUE poses, pipeline initialized with a
perturbed relative rotation — refinement must rotate it back (the UC-NeRF
fix_trans_refine_rot use case)."""

import json

import numpy as np
import pytest

from ucnerf_tpu.data import cameras as camlib
from ucnerf_tpu.data import datasets as dsets
from ucnerf_tpu.data import warping
from ucnerf_tpu.pose import features, matching, pipeline


def _render_gray(c2w_gl, k, h, w):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    origins, dirs, _, _, _ = camlib.pixels_to_rays(
        x, y, np.linalg.inv(k)[None], c2w_gl[None, :3, :])
    rgb, _, _ = dsets.synthetic_scene_color_and_depth(origins, dirs)
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def _rot_y(deg):
    r = np.radians(deg)
    m = np.eye(4)
    m[:3, :3] = [[np.cos(r), 0, np.sin(r)], [0, 1, 0],
                 [-np.sin(r), 0, np.cos(r)]]
    return m


@pytest.fixture(scope="module")
def rig_scene():
    h, w, f = 128, 176, 150.0
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    num_frames, num_cams = 6, 2
    rel_true = [np.eye(4), _rot_y(6.0)]
    rel_true[1][:3, 3] = [0.3, 0.0, 0.0]

    images, w2c_true, intrinsics = [], [], []
    for s in range(num_frames):
        ang = 0.08 * s  # gentle (automotive-like) per-frame motion
        pos = np.array([2.5 * np.sin(ang), 0.4, 2.5 * np.cos(ang)])
        c2w_gl_rig = dsets._lookat_cam_to_world(pos, (0.0, 0.0, 0.0))
        w2c_rig = np.linalg.inv(c2w_gl_rig @ warping.GL_TO_CV)
        for c in range(num_cams):
            w2c = rel_true[c] @ w2c_rig
            c2w_gl = np.linalg.inv(w2c) @ warping.GL_TO_CV
            images.append(_render_gray(c2w_gl, k, h, w))
            w2c_true.append(w2c)
            intrinsics.append(k)
    return (np.stack(images), np.stack(w2c_true), np.stack(intrinsics),
            num_frames, num_cams, rel_true)


def test_harris_detects_scene_corners(rig_scene):
    images, *_ = rig_scene
    kps, descs = features.detect_and_describe(images[0], max_keypoints=300)
    assert len(kps) > 50
    assert descs.shape[1] == 121
    np.testing.assert_allclose(np.linalg.norm(descs, axis=1), 1.0, atol=1e-4)


def test_matching_same_image_identity(rig_scene):
    images, *_ = rig_scene
    kps, descs = features.detect_and_describe(images[0], max_keypoints=200)
    m = matching.mutual_nn_ratio_match(descs, descs, ratio=0.99)
    # Self-matching must map i -> i.
    assert len(m) > 0
    assert (m[:, 0] == m[:, 1]).mean() > 0.95


def test_refinement_recovers_relative_rotation(rig_scene):
    images, w2c_true, intrinsics, num_frames, num_cams, rel_true = rig_scene

    # Perturb cam 1's relative rotation by 1.2 degrees.
    pert = _rot_y(1.2)
    w2c_init = w2c_true.copy()
    for s in range(num_frames):
        w2c_init[s * num_cams + 1] = (
            pert @ rel_true[1]
            @ np.linalg.inv(rel_true[0])  # identity, for clarity
            @ w2c_true[s * num_cams])

    def rel_rot_error(w2c):
        errs = []
        for s in range(num_frames):
            rel = (w2c[s * num_cams + 1]
                   @ np.linalg.inv(w2c[s * num_cams]))
            dr = rel[:3, :3] @ rel_true[1][:3, :3].T
            errs.append(np.degrees(np.arccos(
                np.clip((np.trace(dr) - 1) / 2, -1, 1))))
        return float(np.mean(errs))

    err_before = rel_rot_error(w2c_init)
    assert err_before > 1.0

    out = pipeline.refine_poses(images, w2c_init, intrinsics, num_frames,
                                num_cams, max_keypoints=400,
                                epipolar_px=8.0, tri_max_error=25.0,
                                huber_px=2.0, ba_iterations=40,
                                verbose=False)
    assert out["num_points"] > 30
    err_after = rel_rot_error(out["w2c"])
    assert err_after < err_before * 0.5, (err_before, err_after)
    # Relative translation must be untouched (fix_trans_refine_rot).
    rel_after = out["w2c"][1] @ np.linalg.inv(out["w2c"][0])
    np.testing.assert_allclose(np.linalg.norm(rel_after[:3, 3]),
                               np.linalg.norm(rel_true[1][:3, 3]), rtol=0.05)


def test_pose_json_roundtrip(tmp_path, rig_scene):
    images, w2c_true, intrinsics, num_frames, num_cams, _ = rig_scene
    path = tmp_path / "pose.json"
    pipeline.write_pose_json(path, w2c_true, num_frames, num_cams)
    data = json.load(open(path))
    assert len(data) == num_frames * num_cams
    key = "cam_1/00000000"
    assert key in data
    # Parse back with the dataset-side reader conventions.
    attrs = data[key]
    r = camlib.quat_xyzw_to_rotmat(
        [attrs["q_x"], attrs["q_y"], attrs["q_z"], attrs["q_w"]])
    np.testing.assert_allclose(r, w2c_true[0][:3, :3], atol=1e-6)
    np.testing.assert_allclose(
        [attrs["p_x"], attrs["p_y"], attrs["p_z"]], w2c_true[0][:3, 3],
        atol=1e-9)
