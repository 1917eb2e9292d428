import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.models.mvs import corr as corr_lib
from ucnerf_tpu.models.mvs import pipelines
from ucnerf_tpu.models.mvs.datasets import SyntheticMVSWindows
from ucnerf_tpu.models.mvs.extractor import BasicEncoder
from ucnerf_tpu.models.mvs.raft import RAFTMVS
from ucnerf_tpu.models.mvs.update import UpdateBlock, disp_encoding


def test_encoder_shapes():
    enc = BasicEncoder(output_dim=16, norm_fn="instance")
    x = jnp.zeros((2, 32, 48, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (2, 8, 12, 16)
    enc_lr = BasicEncoder(output_dim=16, norm_fn="none", encoder_type="LR")
    y2 = enc_lr.apply(enc_lr.init(jax.random.PRNGKey(1), x), x)
    assert y2.shape == (2, 4, 6, 16)


def test_projective_transform_identity():
    # Same view: coordinates must map to themselves for any disparity.
    poses = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    k = jnp.array([[10.0, 0, 8], [0, 10.0, 6], [0, 0, 1]])
    intr = jnp.tile(k[None], (2, 1, 1))
    disps = jnp.full((3, 12, 16), 0.5)
    coords = corr_lib.projective_transform(poses, intr, disps, 0, 1)
    y, x = np.meshgrid(np.arange(12), np.arange(16), indexing="ij")
    np.testing.assert_allclose(np.asarray(coords[..., 0]),
                               np.broadcast_to(x, (3, 12, 16)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(coords[..., 1]),
                               np.broadcast_to(y, (3, 12, 16)), atol=1e-4)


def test_bilinear_sample_exact_on_grid():
    img = jnp.arange(5 * 4 * 2, dtype=jnp.float32).reshape(5, 4, 2)
    coords = jnp.array([[1.0, 2.0], [0.0, 0.0], [3.0, 4.0]])
    out = corr_lib.bilinear_sample_nhwc(img, coords)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img[2, 1]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(img[0, 0]))
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(img[4, 3]))
    # Outside -> zero padding.
    out_oob = corr_lib.bilinear_sample_nhwc(img, jnp.array([[-2.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out_oob), 0.0)


def test_corr_volume_peaks_at_true_depth():
    """Identical feature maps + identity relative pose: correlation must be
    maximal regardless of hypothesis; with a translated view, the hypothesis
    matching the true depth should win."""
    rng = np.random.default_rng(0)
    h, w, c = 12, 16, 8
    f = rng.normal(size=(h, w, c)).astype(np.float32)
    fmaps = jnp.stack([jnp.asarray(f), jnp.asarray(f)])
    poses = jnp.tile(jnp.eye(4)[None], (2, 1, 1))
    k = jnp.array([[10.0, 0, 8], [0, 10.0, 6], [0, 0, 1]])
    intr = jnp.tile(k[None], (2, 1, 1))
    disps = jnp.stack([jnp.full((h, w), d) for d in (0.1, 0.5, 1.0)])
    vol = corr_lib.build_corr_volume(fmaps, poses, intr, disps, [1])
    assert vol.shape == (1, h, w, 3)
    # identity pose: all hypotheses identical
    v = np.asarray(vol[0])
    np.testing.assert_allclose(v[..., 0], v[..., 2], atol=1e-4)
    # equals |f|^2/64
    np.testing.assert_allclose(v[..., 0], (f * f).sum(-1) / 64, rtol=1e-4)


def test_corr_pyramid_and_lookup():
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.normal(size=(2, 6, 8, 16)).astype(np.float32))
    pyr = corr_lib.corr_pyramid(vol, num_levels=3)
    assert [p.shape[-1] for p in pyr] == [16, 8, 4]
    disp = jnp.full((6, 8), 0.02)
    origin = jnp.zeros((6, 8))
    out = corr_lib.lookup(pyr, disp, origin, incre=0.0025, n_incre=16,
                          radius=2)
    assert out.shape == (2, 6, 8, 3 * 5)
    assert np.all(np.isfinite(np.asarray(out)))


def test_disp_encoding_zero_for_constant():
    d = jnp.full((1, 8, 10, 1), 3.0)
    enc = disp_encoding(d, size=5)
    # Interior pixels: neighbors - center = 0.
    np.testing.assert_allclose(np.asarray(enc[0, 3:5, 3:7]), 0.0, atol=1e-6)


def test_raft_mvs_end_to_end_tiny():
    """Full cascade on tiny synthetic windows: runs, finite, right shape."""
    win = SyntheticMVSWindows(num_views=3)
    images, poses, intr, scale = win.window(0)
    # Crop to a small multiple of 8 for speed.
    images = images[:, :32, :48]
    model = RAFTMVS(cascade=((8, 64, 2), (-1, 320, 2)), dim_fmap=16,
                    dim_net=16, dim_inp=16, num_levels=2, radius=2)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                        jnp.asarray(poses), jnp.asarray(intr))
    disp = model.apply(params, jnp.asarray(images), jnp.asarray(poses),
                       jnp.asarray(intr), scale=jnp.float32(scale))
    assert disp.shape == (8, 12)
    assert np.all(np.isfinite(np.asarray(disp)))


def test_sequence_loss_decreases_with_better_estimates():
    rng = np.random.default_rng(2)
    gt = jnp.asarray(rng.uniform(0.1, 1.0, (16, 20)).astype(np.float32))
    bad = [gt * 0.2, gt * 0.5]
    good = [gt * 0.9, gt * 1.0]
    loss_bad, _ = pipelines.sequence_loss(bad, gt, gradual_weight=0.5)
    loss_good, m = pipelines.sequence_loss(good, gt, gradual_weight=0.5)
    assert float(loss_good) < float(loss_bad)
    assert float(m["less3"]) >= 0


def test_postprocess_disp():
    disp = jnp.array([[-1.0, 0.0, 0.5, 0.01]])
    depth = pipelines.postprocess_disp(disp, max_depth=50.0)
    out = np.asarray(depth)[0]
    assert out[0] == pytest.approx(1e-6)  # negative -> 1e6 disp -> tiny depth
    assert out[1] == 0.0
    assert out[2] == pytest.approx(2.0)
    assert out[3] == 0.0  # 100m > 50m cutoff -> invalid


def test_multires_fusion():
    full = np.full((8, 8), 2.0, np.float32)
    half = np.full((8, 8), 2.01, np.float32)
    fused = pipelines.multires_fusion(half, full, th=0.02)
    np.testing.assert_allclose(fused, full)  # consistent -> keep full res
    half_bad = np.full((8, 8), 3.0, np.float32)
    fused2 = pipelines.multires_fusion(half_bad, full, th=0.02)
    np.testing.assert_allclose(fused2, half_bad)  # inconsistent -> fallback


def test_geometric_consistency_on_synthetic():
    """Exact analytic depths must be self-consistent across views."""
    win = SyntheticMVSWindows(num_views=3)
    depth_ref = jnp.asarray(win.depths[0])
    k = jnp.asarray(win.intrinsics[0])
    src = [(jnp.asarray(win.depths[i]), jnp.asarray(win.poses[i]),
            jnp.asarray(win.intrinsics[i])) for i in (1, 2)]
    mask, fused = pipelines.geometric_consistency_mask(
        depth_ref, jnp.asarray(win.poses[0]), k, src, pix_th=1.0,
        depth_th=0.02, min_views=1)
    m = np.asarray(mask)
    valid = np.asarray(depth_ref) > 0
    # A reasonable fraction of valid pixels should be cross-view consistent.
    assert m[valid].mean() > 0.2, m[valid].mean()
    # Fused depth close to the reference where masked.
    f = np.asarray(fused)
    err = np.abs(f[m] - np.asarray(depth_ref)[m]) / np.asarray(depth_ref)[m]
    assert np.median(err) < 0.02


def _dense_windows(num_views):
    """Synthetic fixture with ~15 deg baselines: the reference's strict
    D2HC thresholds assume narrow-baseline automotive footage; the default
    tiny ring (~51 deg apart) has too little cross-view overlap to test
    anything but the reject path."""
    from ucnerf_tpu import configs

    return SyntheticMVSWindows(config=configs.tiny(training_views=24),
                               num_views=num_views)


def test_dynamic_consistency_masks_accepts_truth_rejects_outliers():
    """Exact analytic depths pass the dynamic check; injected outliers die."""
    win = _dense_windows(4)
    depth_ref = np.asarray(win.depths[0]).copy()
    h, w = depth_ref.shape
    # Corrupt a block of the reference depth by 3x.
    depth_bad = depth_ref.copy()
    depth_bad[h // 4: h // 2, w // 4: w // 2] *= 3.0
    src = [(jnp.asarray(win.depths[i]), jnp.asarray(win.poses[i]),
            jnp.asarray(win.intrinsics[i])) for i in (1, 2, 3)]
    mask, fused = pipelines.dynamic_consistency_masks(
        jnp.asarray(depth_bad), jnp.asarray(win.poses[0]),
        jnp.asarray(win.intrinsics[0]), src, thre=-0.5)
    m = np.asarray(mask)
    bad_region = np.zeros((h, w), bool)
    bad_region[h // 4: h // 2, w // 4: w // 2] = True
    valid = depth_ref > 0
    # Outlier block must be (almost entirely) masked out...
    assert m[bad_region & valid].mean() < 0.05, m[bad_region & valid].mean()
    # ...while a healthy fraction of untouched pixels survives.
    assert m[~bad_region & valid].mean() > 0.25, m[~bad_region & valid].mean()


def test_adaptive_geometric_fusion_hits_target_fraction():
    win = _dense_windows(4)
    pairs = [(i, [j for j in range(4) if j != i]) for i in range(4)]
    glb = 0.3
    results = pipelines.adaptive_geometric_fusion(
        win.depths[:4], win.poses[:4], win.intrinsics[:4], pairs, glb=glb,
        tot_iter=6)
    assert set(results) == {0, 1, 2, 3}
    fracs = [np.asarray(m).mean() for m, _, _ in results.values()]
    # Bisection steers the mean surviving fraction toward glb.
    assert 0.05 < float(np.mean(fracs)) < 0.8, np.mean(fracs)
    for ref, (m, fused, thre) in results.items():
        d = np.asarray(win.depths[ref])
        mm = np.asarray(m)
        if mm.any():
            err = np.abs(fused[mm] - d[mm]) / np.maximum(d[mm], 1e-9)
            assert np.median(err) < 0.05


def test_fused_point_cloud_and_ply(tmp_path):
    from ucnerf_tpu.extraction.meshing import write_ply

    win = _dense_windows(3)
    pairs = [(0, [1, 2])]
    results = pipelines.adaptive_geometric_fusion(
        win.depths[:3], win.poses[:3], win.intrinsics[:3], pairs,
        glb=0.25, tot_iter=4)
    xyz, rgb = pipelines.fused_point_cloud(
        results, win.images / 255.0, win.poses[:3], win.intrinsics[:3])
    assert len(xyz) > 50
    assert rgb.shape == xyz.shape
    # Points must lie on the analytic scene surfaces: sphere r=0.8 or the
    # y=-1 ground plane (scene geometry from datasets.synthetic_scene...).
    on_plane = np.abs(xyz[:, 1] + 1.0) < 0.05
    on_sphere = np.abs(np.linalg.norm(xyz, axis=1) - 0.8) < 0.05
    assert (on_plane | on_sphere).mean() > 0.9

    path = str(tmp_path / "cloud.ply")
    write_ply(path, xyz, np.zeros((0, 3), np.int32), colors=rgb)
    data = open(path, "rb").read()
    assert data.startswith(b"ply")
    assert f"element vertex {len(xyz)}".encode() in data


def test_temporal_offsets_sweep():
    """Window source counts match the reference demo's 6/8/10 sweep
    (demo_custom.py:33-44); offsets stay same-camera (multiples of
    num_cams) and symmetric."""
    from ucnerf_tpu.models.mvs.datasets import temporal_offsets

    for nf in (6, 8, 10):
        offs = temporal_offsets(nf, 3)
        assert len(offs) == nf
        assert np.all(offs % 3 == 0)
        np.testing.assert_array_equal(offs, -offs[::-1])
    np.testing.assert_array_equal(temporal_offsets(6, 3),
                                  np.array([-3, -2, -1, 1, 2, 3]) * 3)


def test_mvs_training_converges():
    """cli.mvs_train (the reference train.py:37-141 role) actually learns:
    sequence loss over GT-disparity supervision decreases over a short tiny
    run on the synthetic windows."""
    from ucnerf_tpu.cli import mvs_train

    losses = mvs_train.main(["--tiny", "--steps", "15",
                             "--crop", "32", "48", "--lr", "1e-3"])
    assert len(losses) == 15
    assert np.isfinite(losses).all()
    assert min(losses[-3:]) < losses[0], losses
