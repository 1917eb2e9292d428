import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.ops import rendering


def _ray_batch(n=4, m=8):
    tdist = jnp.broadcast_to(jnp.linspace(0.1, 4.0, m + 1), (n, m + 1))
    origins = jnp.zeros((n, 3))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    radii = jnp.full((n, 1), 0.01)
    return tdist, origins, dirs, radii


def test_cast_rays_shapes():
    tdist, origins, dirs, radii = _ray_batch()
    means, stds, ts = rendering.cast_rays(None, tdist, origins, dirs, dirs,
                                          radii)
    assert means.shape == (4, 8, 6, 3)
    assert stds.shape == (4, 8, 6)
    assert ts.shape == (4, 8, 6)


def test_cast_rays_samples_near_frustum():
    # Hex samples match the frustum's moments, not its support: they may
    # overshoot t1 by a few percent of the interval width, but must stay
    # ordered and close to [t0, t1].
    tdist, origins, dirs, radii = _ray_batch()
    _, _, ts = rendering.cast_rays(None, tdist, origins, dirs, dirs, radii)
    t0 = np.asarray(tdist)[..., :-1, None]
    t1 = np.asarray(tdist)[..., 1:, None]
    width = t1 - t0
    ts = np.asarray(ts)
    assert np.all(ts >= t0 - 0.1 * width)
    assert np.all(ts <= t1 + 0.1 * width)
    assert np.all(np.diff(ts, axis=-1) >= 0)


def test_cast_rays_mean_matches_frustum_zmean():
    # The 6-point average of t approximates the conical frustum's t_mean.
    tdist, origins, dirs, radii = _ray_batch(n=1, m=4)
    _, _, ts = rendering.cast_rays(None, tdist, origins, dirs, dirs, radii)
    t0 = np.asarray(tdist)[0, :-1]
    t1 = np.asarray(tdist)[0, 1:]
    mu, hw = (t0 + t1) / 2, (t1 - t0) / 2
    t_mean = mu + (2 * mu * hw**2) / (3 * mu**2 + hw**2)
    np.testing.assert_allclose(np.asarray(ts)[0].mean(-1), t_mean, rtol=1e-3)


def test_cast_rays_points_on_ray_axis_mean():
    # Hex pattern is symmetric: the mean offset lies on the ray axis.
    tdist, origins, dirs, radii = _ray_batch(n=2, m=4)
    means, _, ts = rendering.cast_rays(None, tdist, origins, dirs, dirs, radii)
    mean_pts = np.asarray(means).mean(axis=-2)  # [n, m, 3]
    z = np.asarray(ts).mean(-1)
    expect = np.asarray(dirs)[:, None, :] * z[..., None]
    np.testing.assert_allclose(mean_pts, expect, atol=1e-5)


def test_compute_alpha_weights_opaque_sums_to_one():
    density = jnp.ones((4, 8)) * 0.5
    tdist = jnp.broadcast_to(jnp.linspace(0.0, 4.0, 9), (4, 9))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    w, alpha, trans = rendering.compute_alpha_weights(density, tdist, dirs,
                                                      opaque_background=True)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)


def test_compute_alpha_weights_matches_manual():
    density = jnp.array([[1.0, 2.0, 0.5]])
    tdist = jnp.array([[0.0, 1.0, 2.0, 3.0]])
    dirs = jnp.array([[0.0, 0.0, 2.0]])  # norm 2 -> delta doubled
    w, alpha, trans = rendering.compute_alpha_weights(density, tdist, dirs)
    dd = np.array([1.0, 2.0, 0.5]) * 2.0
    alpha_ref = 1 - np.exp(-dd)
    trans_ref = np.exp(-np.concatenate([[0], np.cumsum(dd)[:-1]]))
    np.testing.assert_allclose(np.asarray(alpha)[0], alpha_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w)[0], alpha_ref * trans_ref,
                               rtol=1e-5)


def test_volumetric_rendering_solid_surface():
    # A wall of density at sample 3: rgb == wall color, depth == t_mid.
    n, m = 2, 8
    tdist = jnp.broadcast_to(jnp.linspace(0.0, 4.0, m + 1), (n, m + 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    density = jnp.zeros((n, m)).at[:, 3].set(1e5)
    w, _, _ = rendering.compute_alpha_weights(density, tdist, dirs)
    rgbs = jnp.broadcast_to(jnp.array([0.2, 0.4, 0.8]), (n, m, 3))
    out = rendering.volumetric_rendering(rgbs, w, tdist, 1.0,
                                         jnp.full((n, 1), 4.0), True)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.tile([0.2, 0.4, 0.8], (n, 1)), atol=1e-4)
    t_mid = (1.5 + 2.0) / 2
    np.testing.assert_allclose(np.asarray(out["depth"]), t_mid, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["acc"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["distance_median"]), t_mid,
                               atol=0.3)


def test_volumetric_rendering_sky_depth_clamp():
    # Zero density -> acc 0 -> depth forced to 300 (render.py:208-213).
    n, m = 1, 4
    tdist = jnp.broadcast_to(jnp.linspace(0.0, 4.0, m + 1), (n, m + 1))
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    w = jnp.zeros((n, m))
    rgbs = jnp.zeros((n, m, 3))
    out = rendering.volumetric_rendering(rgbs, w, tdist, 0.5,
                                         jnp.full((n, 1), 4.0), False)
    np.testing.assert_allclose(np.asarray(out["depth"]), 300.0)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.5, atol=1e-6)
