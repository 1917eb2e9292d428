import dataclasses

import numpy as np
import pytest

from ucnerf_tpu import configs
from ucnerf_tpu.data import cameras as camlib
from ucnerf_tpu.data import datasets, warping


@pytest.fixture(scope="module")
def tiny_cfg():
    return configs.tiny()


@pytest.fixture(scope="module")
def train_ds(tiny_cfg):
    return datasets.load_dataset("train", tiny_cfg)


def test_pixels_to_rays_center_pixel_points_forward():
    # The ray through the principal point equals the camera forward axis.
    w, h, f = 64, 48, 60.0
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    c2w = datasets._lookat_cam_to_world([0, 0, 4.0], [0, 0, 0])
    # Integer pixel nearest the principal point (its center sits half a
    # pixel off, so allow a sub-pixel angular tolerance).
    px = np.array([int(w / 2 - 0.5)])
    py = np.array([int(h / 2 - 0.5)])
    origins, dirs, viewdirs, radii, _ = camlib.pixels_to_rays(
        px, py, np.linalg.inv(k)[None], c2w[None, :3, :])
    np.testing.assert_allclose(origins[0], [0, 0, 4.0], atol=1e-6)
    np.testing.assert_allclose(viewdirs[0], [0, 0, -1.0], atol=1.0 / f)
    assert radii.shape == (1, 1) and radii[0, 0] > 0


def test_pixels_to_rays_up_pixel_tilts_up():
    w, h, f = 64, 48, 60.0
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    c2w = datasets._lookat_cam_to_world([0, 0, 4.0], [0, 0, 0])
    px = np.array([int(w / 2 - 0.5)])
    py_up = np.array([5])  # smaller y = upper image region
    _, _, vd, _, _ = camlib.pixels_to_rays(
        px, py_up, np.linalg.inv(k)[None], c2w[None, :3, :])
    assert vd[0, 1] > 0  # tilts toward +y (world up)


def test_undistort_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.4, 0.4, 100)
    y = rng.uniform(-0.4, 0.4, 100)
    params = dict(k1=0.05, k2=-0.01, p1=1e-3, p2=-5e-4)
    # Distort forward.
    r = x * x + y * y
    d = 1.0 + r * (params["k1"] + r * params["k2"])
    xd = d * x + 2 * params["p1"] * x * y + params["p2"] * (r + 2 * x * x)
    yd = d * y + 2 * params["p2"] * x * y + params["p1"] * (r + 2 * y * y)
    xu, yu = camlib.radial_and_tangential_undistort(xd, yd, **params)
    np.testing.assert_allclose(xu, x, atol=1e-6)
    np.testing.assert_allclose(yu, y, atol=1e-6)


def test_quat_to_rotmat_identity_and_orthonormal():
    np.testing.assert_allclose(
        camlib.quat_xyzw_to_rotmat([0, 0, 0, 1]), np.eye(3), atol=1e-12)
    q = np.array([0.1, -0.2, 0.3, 0.9])
    q = q / np.linalg.norm(q)
    r = camlib.quat_xyzw_to_rotmat(q)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-10)


def test_synthetic_dataset_shapes(train_ds, tiny_cfg):
    ds = train_ds
    assert ds.images.ndim == 4 and ds.images.shape[-1] == 3
    assert ds.camtoworlds.shape == (ds.n_examples, 4, 4)
    assert ds.pixtocams.shape == (ds.n_examples, 3, 3)
    assert ds.sky_segments.shape == ds.images.shape[:3]
    assert ds.disp_images.shape == ds.images.shape[:3]
    assert 0 <= ds.images.min() and ds.images.max() <= 1


def test_synthetic_multiview_consistency(train_ds):
    """The analytic scene must give the same color for rays meeting at the
    same surface point: check depth reprojection between two views."""
    ds = train_ds
    d0 = ds.disp_images[0]
    cv = warping.GL_TO_CV
    pix, mask = warping.warp_image(
        ds.camtoworlds[0] @ cv, ds.camtoworlds[1] @ cv, d0,
        np.linalg.inv(ds.pixtocams[0]))
    assert mask.sum() > 100  # plenty of co-visible surface
    ys, xs = np.nonzero(mask)
    sel = slice(0, len(ys), max(1, len(ys) // 200))
    ys, xs = ys[sel], xs[sel]
    tx = np.clip(np.round(pix[ys, xs, 0]).astype(int), 0, ds.width - 1)
    ty = np.clip(np.round(pix[ys, xs, 1]).astype(int), 0, ds.height - 1)
    c_ref = ds.images[0, ys, xs]
    c_src = ds.images[1, ty, tx]
    # Mostly agreeing colors (occlusions + rounding produce a small tail).
    err = np.linalg.norm(c_ref - c_src, axis=-1)
    assert np.median(err) < 0.15, np.median(err)


def test_sample_batch_layout(train_ds, tiny_cfg):
    rng = np.random.default_rng(1)
    batch = train_ds.sample_batch(rng, 128)
    assert batch["origins"].shape == (128, 3)
    assert batch["directions"].shape == (128, 3)
    assert batch["viewdirs"].shape == (128, 3)
    assert batch["cam_dirs"].shape == (128, 3)
    assert batch["radii"].shape == (128, 1)
    assert batch["near"].shape == (128, 1)
    assert batch["rgb"].shape == (128, 3)
    assert batch["sky_segs"].shape == (128,)
    assert batch["cam_idx"].dtype == np.int32
    np.testing.assert_allclose(
        np.linalg.norm(batch["viewdirs"], axis=-1), 1.0, atol=1e-5)


def test_image_batch_matches_sample(train_ds):
    img_batch = train_ds.image_batch(0)
    h, w = train_ds.height, train_ds.width
    assert img_batch["origins"].shape == (h, w, 3)
    assert img_batch["rgb"].shape == (h, w, 3)
    np.testing.assert_allclose(img_batch["rgb"], train_ds.images[0],
                               atol=1e-6)


def test_virtual_pose_batch():
    cfg = configs.tiny(virtual_poses=True)
    ds = datasets.load_dataset("train", cfg)
    assert ds.virtual_poses is not None
    assert len(ds.virtual_poses) == 9 * ds.n_examples
    rng = np.random.default_rng(2)
    batch = ds.sample_batch(rng, 100)
    assert batch["origins"].shape == (100, 3)
    # Virtual rays exist: some origins differ from all real camera centers.
    cam_centers = ds.camtoworlds[:, :3, 3]
    d = np.linalg.norm(batch["origins"][:, None] - cam_centers[None], axis=-1)
    assert (d.min(axis=1) > 1e-6).sum() > 0


def test_warp_depth_roundtrip(train_ds):
    """Warping a view's depth into itself is the identity."""
    ds = train_ds
    k = np.linalg.inv(ds.pixtocams[0])
    cv = ds.camtoworlds[0] @ warping.GL_TO_CV
    pix, mask = warping.warp_image(cv, cv, ds.disp_images[0], k)
    ys, xs = np.nonzero(mask)
    np.testing.assert_allclose(pix[ys, xs, 0], xs + 0.0, atol=0.01)
    np.testing.assert_allclose(pix[ys, xs, 1], ys + 0.0, atol=0.01)


def test_warp_image_jax_matches_numpy(train_ds):
    import jax.numpy as jnp
    ds = train_ds
    k = np.linalg.inv(ds.pixtocams[0]).astype(np.float32)
    cv0 = (ds.camtoworlds[0] @ warping.GL_TO_CV).astype(np.float32)
    cv1 = (ds.camtoworlds[1] @ warping.GL_TO_CV).astype(np.float32)
    pix_np, mask_np = warping.warp_image(cv0, cv1, ds.disp_images[0], k)
    pix_j, mask_j = warping.warp_image_jax(
        jnp.asarray(cv0), jnp.asarray(cv1),
        jnp.asarray(ds.disp_images[0]), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(pix_j)[mask_np],
                               pix_np[mask_np], atol=0.05)
    assert (np.asarray(mask_j) == mask_np).mean() > 0.999


def test_train_test_split_disjoint(tiny_cfg):
    tr = datasets.load_dataset("train", tiny_cfg)
    te = datasets.load_dataset("test", tiny_cfg)
    # Distinct camera centers between splits.
    ctr = tr.camtoworlds[:, :3, 3]
    cte = te.camtoworlds[:, :3, 3]
    d = np.linalg.norm(ctr[:, None] - cte[None], axis=-1)
    assert d.min() > 1e-6


def test_correspondence_pool_multiple_neighbors():
    """Each virtual view pairs with several distinct temporal neighbors
    (reference re-draws the neighbor per batch, datasets.py:510-517; the
    precomputed pool must keep that supervision diversity)."""
    from ucnerf_tpu.data import warping

    cfg = configs.tiny(virtual_poses=True)
    ds = datasets.load_dataset("train", cfg)
    pool = warping.precompute_correspondence_pool(
        ds, np.random.default_rng(0), pool_per_pair=64,
        neighbors_per_view=3)
    assert pool is not None
    # Interior virtual views (clipping can't collapse their neighbors)
    # must reference >= 2 distinct real views each.
    per_view = {}
    for v, r in zip(pool["src_cam_idx"], pool["ref_idx"]):
        per_view.setdefault(int(v), set()).add(int(r))
    interior = {v: refs for v, refs in per_view.items()
                if 2 <= v // 9 < ds.n_examples - 2}
    assert interior, "no interior virtual views warped successfully"
    multi = [len(refs) >= 2 for refs in interior.values()]
    assert np.mean(multi) > 0.5, np.mean(multi)
    # Pool indices stay in range.
    assert pool["ref_idx"].max() < ds.n_examples
    assert pool["src_px"].max() < ds.width
    assert pool["ref_py"].max() < ds.height
