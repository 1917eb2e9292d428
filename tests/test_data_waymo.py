"""On-disk-contract fixture tests for the WaymoV2 loader.

Builds a miniature Waymo-style segment in a tmp dir — tiny jpgs,
``scenario.pt`` pickle, ``.npz`` semantic masks, MVS depth ``.npy`` files and
a refined ``pose.json`` — and exercises ``WaymoV2Dataset`` end-to-end
(reference contract: ``/root/reference/nerf/internal/datasets.py:883-1140``).

Covers both pose sources (scenario.pt vs pose.json override), the
``Config.factor`` downsampling (waymo.gin:3 trains at 1920/4 x 1280/4),
depth scene-scaling, sky-class mask extraction, and the every-8th-frame-group
test split (datasets.py:1104-1111)."""

from __future__ import annotations

import dataclasses
import json
import os
import pickle

import numpy as np
import pytest

from ucnerf_tpu import configs
from ucnerf_tpu.data import datasets

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

N_FRAMES = 16
CAMS = ["cam_1", "cam_2", "cam_3"]
CAM_OBSERVERS = ["camera_FRONT", "camera_FRONT_LEFT", "camera_FRONT_RIGHT"]
NATIVE_W, NATIVE_H = 1920, 1280
SKY_CLASS = 10


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _make_segment(root, rng):
    """Write a minimal Waymo-style segment; returns ground-truth dict."""
    intr = np.array([[900.0, 0, NATIVE_W / 2],
                     [0, 900.0, NATIVE_H / 2],
                     [0, 0, 1]], np.float64)
    observers = {}
    c2ws = {}
    for ci, (cam, oid) in enumerate(zip(CAMS, CAM_OBSERVERS)):
        cam_c2w = []
        for f in range(N_FRAMES):
            c2w = np.eye(4)
            c2w[:3, :3] = _rotz(0.1 * ci + 0.02 * f)
            c2w[:3, 3] = [2.0 * f, 0.5 * ci, 1.5]
            cam_c2w.append(c2w)
        c2ws[cam] = np.stack(cam_c2w)
        observers[oid] = {
            "class_name": "Camera",
            "data": {
                "intr": np.tile(intr[None], (N_FRAMES, 1, 1)),
                "c2w": c2ws[cam],
            },
        }
    with open(os.path.join(root, "scenario.pt"), "wb") as f:
        pickle.dump({"observers": observers}, f)

    depth_dir = os.path.join(root, "depth")
    os.makedirs(depth_dir)
    rgb_gt, depth_gt, sky_gt = {}, {}, {}
    # Tiny source jpgs: the loader resizes to the target anyway; what matters
    # is that per-image content is distinguishable and masks/depths line up.
    sw, sh = 96, 64
    for ci, cam in enumerate(CAMS):
        os.makedirs(os.path.join(root, "images", cam))
        os.makedirs(os.path.join(root, "masks", cam))
        for f in range(N_FRAMES):
            shade = int(10 + 3 * f + 60 * ci)
            img = np.full((sh, sw, 3), shade, np.uint8)
            Image.fromarray(img, "RGB").save(
                os.path.join(root, "images", cam, f"{f:08d}.jpg"),
                quality=95)
            rgb_gt[(ci, f)] = shade / 255.0

            seg = np.zeros((sh, sw), np.uint8)
            seg[: sh // 4] = SKY_CLASS  # top quarter is sky
            np.savez(os.path.join(root, "masks", cam, f"{f:08d}.npz"), seg)
            sky_gt[(ci, f)] = seg

            d = np.full((sh, sw), 5.0 + f + ci, np.float32)
            d[0, 0] = 0.2  # below the <=0.5 invalid cutoff -> zeroed
            np.save(os.path.join(depth_dir, f"{f:08d}{cam}.npy"), d)
            depth_gt[(ci, f)] = d
    return dict(intr=intr, c2ws=c2ws, depth_dir=depth_dir, rgb=rgb_gt,
                depth=depth_gt, sky=sky_gt)


@pytest.fixture(scope="module")
def segment(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("waymo_seg"))
    gt = _make_segment(root, np.random.default_rng(0))
    return root, gt


def _config(root, gt, **kw):
    base = dict(
        dataset_loader="waymov2", data_dir=root,
        depth_dir=gt["depth_dir"], cam_type=6, factor=4,
        load_sky_segments=True, near=0.0, far=8.0)
    base.update(kw)
    return configs.Config(**base)


@pytest.fixture(autouse=True)
def _small_segment(monkeypatch):
    monkeypatch.setattr(datasets.WaymoV2Dataset, "NUM_FRAMES", N_FRAMES)


def test_factor_downsamples_to_canonical_size(segment):
    """factor=4 must train at 480x320 (waymo.gin:1-14, datasets.py:262-276)."""
    root, gt = segment
    ds = datasets.load_dataset("train", _config(root, gt, factor=4))
    assert (ds.width, ds.height) == (480, 320)
    assert ds.images.shape[1:] == (320, 480, 3)
    # Intrinsics rescaled with the image: fx shrinks by the resize ratio.
    k = np.linalg.inv(ds.pixtocams[0])
    assert k[0, 0] == pytest.approx(gt["intr"][0, 0] * 480 / NATIVE_W,
                                    rel=1e-5)
    assert k[1, 2] == pytest.approx(gt["intr"][1, 2] * 320 / NATIVE_H,
                                    rel=1e-5)

    ds8 = datasets.load_dataset("train", _config(root, gt, factor=8))
    assert (ds8.width, ds8.height) == (240, 160)


def test_split_and_contents(segment):
    root, gt = segment
    cfg = _config(root, gt, factor=20)  # 96x64: fast
    train = datasets.load_dataset("train", cfg)
    test = datasets.load_dataset("test", cfg)

    ncams = 3
    total = N_FRAMES * ncams
    all_idx = np.arange(total)
    test_sel = all_idx % (8 * ncams) < ncams  # datasets.py:1104-1111
    assert test.n_examples == int(test_sel.sum())
    assert train.n_examples == total - test.n_examples

    # Flat index f*ncams + ci; frame groups 0 and 8 are test.
    # Image contents: per-(cam, frame) constant shade survives the resize.
    # train[0] is frame 0's group excluded -> first train image is frame 1.
    got = float(np.mean(train.images[0]))
    assert got == pytest.approx(gt["rgb"][(0, 1)], abs=2 / 255)
    got_test = float(np.mean(test.images[0]))
    assert got_test == pytest.approx(gt["rgb"][(0, 0)], abs=2 / 255)

    # Sky masks: top quarter is sky everywhere.
    assert train.sky_segments is not None
    assert np.all(train.sky_segments[:, : 64 // 4] == 1.0)
    assert np.all(train.sky_segments[:, 64 // 4:] == 0.0)


def test_depth_scene_scaling(segment):
    """Depths share the pose normalization scale (datasets.py:1094-1098)."""
    root, gt = segment
    cfg = _config(root, gt, factor=20)
    train = datasets.load_dataset("train", cfg)

    # Recompute the scale the loader applied from the raw c2ws.
    raw = np.concatenate([
        np.stack([gt["c2ws"][cam][f] for cam in CAMS])
        for f in range(N_FRAMES)])
    centers = raw[:, :3, 3]
    centers = centers - centers.mean(axis=0)
    scale = 1.0 / np.mean(np.linalg.norm(centers, axis=-1))

    # First train example is (frame 1, cam_1): raw constant depth 5 + 1 + 0.
    d = train.disp_images[0]
    expect = (5.0 + 1.0) * scale
    assert np.median(d) == pytest.approx(expect, rel=1e-5)
    # The <=0.5 cutoff zeroed the corner pixel BEFORE scaling.
    assert d[0, 0] == 0.0

    # Camera positions: unit mean radius after normalization.
    r = np.mean(np.linalg.norm(train.camtoworlds[:, :3, 3], axis=-1))
    # train split only -> not exactly 1, but the full set is.
    full = np.concatenate(
        [train.camtoworlds[:, :3, 3], datasets.load_dataset(
            "test", cfg).camtoworlds[:, :3, 3]])
    assert np.mean(np.linalg.norm(full, axis=-1)) == pytest.approx(1.0,
                                                                   rel=1e-3)
    del r


def test_pose_json_override(segment):
    """refine_name swaps scenario.pt poses for pose.json world-to-cam
    quaternions (datasets.py:971-981)."""
    from scipy.spatial.transform import Rotation

    root, gt = segment
    # Write a pose.json with a recognizable rigid offset from the originals.
    pose_json = {}
    offset = np.eye(4)
    offset[:3, :3] = _rotz(0.3)
    offset[:3, 3] = [1.0, -2.0, 0.5]
    for cam in CAMS:
        for f in range(N_FRAMES):
            c2w = offset @ gt["c2ws"][cam][f]
            w2c = np.linalg.inv(c2w)
            q = Rotation.from_matrix(w2c[:3, :3]).as_quat()  # x, y, z, w
            pose_json[f"{cam}/{f:08d}"] = dict(
                q_x=float(q[0]), q_y=float(q[1]), q_z=float(q[2]),
                q_w=float(q[3]), p_x=float(w2c[0, 3]), p_y=float(w2c[1, 3]),
                p_z=float(w2c[2, 3]))
    refine_path = os.path.join(root, "pose.json")
    with open(refine_path, "w") as f:
        json.dump(pose_json, f)

    cfg = _config(root, gt, factor=20)
    cfg_ref = dataclasses.replace(cfg, refine_name=refine_path)
    base = datasets.load_dataset("train", cfg)
    refined = datasets.load_dataset("train", cfg_ref)

    # A global rigid transform is absorbed by the center+scale normalization
    # up to rotation; relative poses between two views must match the offset
    # composition, and differ from the unrefined ones.
    def rel(ds):
        a, b = ds.camtoworlds[0], ds.camtoworlds[5]
        return np.linalg.inv(a) @ b

    # Relative geometry is preserved by a global rigid offset + similarity
    # normalization (rotation part exactly; translation up to global scale).
    rb, rr = rel(base), rel(refined)
    np.testing.assert_allclose(rr[:3, :3], rb[:3, :3], atol=1e-5)
    np.testing.assert_allclose(
        rr[:3, 3] / np.linalg.norm(rr[:3, 3]),
        rb[:3, 3] / np.linalg.norm(rb[:3, 3]), atol=1e-5)

    # And the loader really did read pose.json, not scenario.pt: absolute
    # orientations differ by the rigid offset's rotation.
    got = refined.camtoworlds[0][:3, :3] @ np.linalg.inv(
        base.camtoworlds[0][:3, :3])
    np.testing.assert_allclose(got, offset[:3, :3], atol=1e-4)


def test_sample_batch_end_to_end(segment):
    root, gt = segment
    cfg = _config(root, gt, factor=20)
    train = datasets.load_dataset("train", cfg)
    batch = train.sample_batch(np.random.default_rng(0), 64)
    assert batch["origins"].shape == (64, 3)
    assert batch["rgb"].shape == (64, 3)
    assert np.isfinite(batch["directions"]).all()
    assert set(batch["sky_segs"].astype(np.int64).tolist()) <= {0, 1}


def test_nuscenes_variant_geometry(tmp_path_factory, monkeypatch):
    """The NuScenes loader shares the Waymo on-disk contract but reads
    1600x900 native frames, sky class 142, and its own frame count
    (reference datasets.py:596-878 geometry)."""
    root = str(tmp_path_factory.mktemp("nusc_seg"))
    n_frames = 8
    monkeypatch.setattr(datasets.NuScenesDataset, "NUM_FRAMES", n_frames)

    intr = np.array([[1200.0, 0, 800.0], [0, 1200.0, 450.0], [0, 0, 1]])
    observers = {}
    for ci, oid in enumerate(CAM_OBSERVERS):
        c2w = np.stack([np.eye(4)] * n_frames)
        c2w[:, :3, 3] = np.stack([np.arange(n_frames) * 2.0,
                                  np.full(n_frames, 0.5 * ci),
                                  np.full(n_frames, 1.5)], -1)
        observers[oid] = {"class_name": "Camera",
                          "data": {"intr": np.tile(intr[None],
                                                   (n_frames, 1, 1)),
                                   "c2w": c2w}}
    with open(os.path.join(root, "scenario.pt"), "wb") as f:
        pickle.dump({"observers": observers}, f)
    for ci, cam in enumerate(CAMS):
        os.makedirs(os.path.join(root, "images", cam))
        os.makedirs(os.path.join(root, "masks", cam))
        for fidx in range(n_frames):
            img = np.full((45, 80, 3), 40 + ci * 50, np.uint8)
            Image.fromarray(img, "RGB").save(
                os.path.join(root, "images", cam, f"{fidx:08d}.jpg"))
            seg = np.zeros((45, 80), np.uint8)
            seg[:10] = 142  # NuScenes sky class
            np.savez(os.path.join(root, "masks", cam, f"{fidx:08d}.npz"),
                     seg)

    cfg = configs.Config(dataset_loader="nuscenes", data_dir=root,
                         cam_type=6, factor=10, load_sky_segments=True,
                         near=0.0, far=8.0)
    train = datasets.load_dataset("train", cfg)
    # 1600x900 native / factor 10.
    assert (train.width, train.height) == (160, 90)
    k = np.linalg.inv(train.pixtocams[0])
    assert k[0, 0] == pytest.approx(1200.0 * 160 / 1600, rel=1e-5)
    # Sky mask came from class 142.
    assert np.all(train.sky_segments[:, :2] == 1.0)
    assert np.all(train.sky_segments[:, 40:] == 0.0)
