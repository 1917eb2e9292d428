"""Render-path generator tests (reference camera_utils.py:133-350).

Checks shapes, rotation orthonormality, continuity, the ellipse's
constant-speed resampling, and spline keyframe fidelity — the properties the
reference relies on when feeding these paths to render.py.
"""

import numpy as np
import pytest

from ucnerf_tpu.data import paths


def _orbit_poses(n=24, radius=4.0, height=1.0):
    """Synthetic inward-looking camera ring (positions on a circle)."""
    out = []
    for theta in np.linspace(0, 2 * np.pi, n, endpoint=False):
        pos = np.array([radius * np.cos(theta), radius * np.sin(theta),
                        height + 0.3 * np.sin(3 * theta)])
        out.append(paths.viewmatrix(pos - np.zeros(3), np.array([0, 0, 1.0]),
                                    pos))
    return np.stack(out)


def _assert_valid_poses(p, n):
    assert p.shape == (n, 3, 4)
    assert p.dtype == np.float32
    rot = p[:, :3, :3]
    eye = np.eye(3)[None]
    np.testing.assert_allclose(rot @ np.transpose(rot, (0, 2, 1)),
                               np.broadcast_to(eye, rot.shape), atol=1e-5)
    dets = np.linalg.det(rot)
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)


def _max_step(p):
    return np.max(np.linalg.norm(p[1:, :3, 3] - p[:-1, :3, 3], axis=-1))


def test_spiral_path_shape_and_continuity():
    poses = _orbit_poses()
    bounds = np.array([0.5, 20.0])
    p = paths.generate_spiral_path(poses, bounds, n_frames=60)
    _assert_valid_poses(p, 60)
    # Spiral positions stay within the camera hull scale and move smoothly.
    assert _max_step(p) < 2.0
    assert np.all(np.abs(p[:, :3, 3]) < 10.0)


def test_ellipse_path_const_speed():
    poses = _orbit_poses()
    p = paths.generate_ellipse_path(poses, n_frames=90, const_speed=True)
    _assert_valid_poses(p, 90)
    steps = np.linalg.norm(p[1:, :3, 3] - p[:-1, :3, 3], axis=-1)
    # Constant-speed resampling: interior step lengths are near-uniform.
    interior = steps[1:-1]
    assert interior.max() / interior.min() < 1.5
    # Cameras look at the focus point: z-axis ~ position - center.
    center = paths.focus_point(poses)
    look = p[:, :3, 3] - center
    look /= np.linalg.norm(look, axis=-1, keepdims=True)
    cos = np.sum(look * p[:, :3, 2], axis=-1)
    assert np.all(cos > 0.999)


def test_ellipse_z_variation_changes_height():
    poses = _orbit_poses()
    flat = paths.generate_ellipse_path(poses, n_frames=30, z_variation=0.0)
    wavy = paths.generate_ellipse_path(poses, n_frames=30, z_variation=1.0)
    assert np.ptp(flat[:, 2, 3]) < 1e-6
    assert np.ptp(wavy[:, 2, 3]) > 0.1


def test_interpolated_path_hits_keyframes():
    keys = _orbit_poses(n=6)
    n_interp = 20
    p = paths.generate_interpolated_path(keys, n_interp=n_interp,
                                         smoothness=0.0)
    _assert_valid_poses(p, n_interp * (len(keys) - 1))
    # With smoothness=0 the spline interpolates: frame k*n_interp sits at
    # keyframe k (u linspace is endpoint=False over the keyframe span).
    for k in range(len(keys) - 1):
        d = np.linalg.norm(p[k * n_interp, :3, 3] - keys[k, :3, 3])
        assert d < 0.05, (k, d)
    # Continuity.
    assert _max_step(p) < 0.5


def test_interpolated_path_few_keyframes_degree_clamp():
    keys = _orbit_poses(n=3)  # fewer points than degree 5 -> k clamps to 2
    p = paths.generate_interpolated_path(keys, n_interp=10)
    _assert_valid_poses(p, 20)


def test_create_render_spline_path_names_and_exposures():
    keys = _orbit_poses(n=8)
    names = [f"img_{i:03d}.png" for i in range(8)]
    keyframes = names[::2]
    exposures = np.linspace(1.0, 2.0, 8)
    idx, p, exp = paths.create_render_spline_path(
        keyframes, names, keys, exposures=exposures, n_interp=12)
    np.testing.assert_array_equal(idx, [0, 2, 4, 6])
    _assert_valid_poses(p, 12 * 3)
    assert exp.shape == (12 * 3,)
    assert np.all(exp > 0.9) and np.all(exp < 2.1)


def test_create_render_spline_path_requires_two_keyframes():
    keys = _orbit_poses(n=4)
    names = [f"img_{i}.png" for i in range(4)]
    with pytest.raises(ValueError):
        paths.create_render_spline_path([names[0]], names, keys)


def test_generate_render_path_dispatch():
    class _DS:
        pass

    ds = _DS()
    ds.camtoworlds = np.concatenate(
        [_orbit_poses(n=12),
         np.broadcast_to(np.array([[0, 0, 0, 1.0]]), (12, 1, 4))], axis=1)
    ds.cam_num = 3

    from ucnerf_tpu import configs
    cfg = configs.Config(render_path_frames=24)
    for ptype in ("spiral", "ellipse", "spline"):
        p = paths.generate_render_path(ptype, ds, cfg)
        assert p.shape[1:] == (3, 4), ptype
        assert len(p) > 0
    p = paths.generate_render_path("keyframe", ds, cfg)
    assert len(p) == 24
    with pytest.raises(ValueError):
        paths.generate_render_path("nope", ds, cfg)


def test_generate_render_path_spline_keyframes_file(tmp_path):
    """Name-file keyframe selection (reference create_render_spline_path)
    through the dispatch: names resolve against dataset.image_names."""
    class _DS:
        pass

    ds = _DS()
    ds.camtoworlds = np.concatenate(
        [_orbit_poses(n=12),
         np.broadcast_to(np.array([[0, 0, 0, 1.0]]), (12, 1, 4))], axis=1)
    ds.cam_num = 3
    ds.image_names = [f"cam_1/{i:08d}.jpg" for i in range(12)]
    kf = tmp_path / "keyframes.txt"
    kf.write_text("\n".join(ds.image_names[::3]))

    from ucnerf_tpu import configs
    cfg = configs.Config(render_path_frames=24,
                         render_spline_keyframes=8,
                         render_spline_keyframes_file=str(kf))
    p = paths.generate_render_path("spline", ds, cfg)
    _assert_valid_poses(p, len(p))
    assert len(p) > 0
