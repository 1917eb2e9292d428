import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.ops import stepfun


def _invert_cdf_np(u, t, w_logits):
    """Numpy oracle following the reference's *_np twins (stepfun.py:164-172)."""
    w = np.exp(w_logits) / np.exp(w_logits).sum(axis=-1, keepdims=True)
    cw = np.minimum(1, np.cumsum(w[..., :-1], axis=-1))
    shape = cw.shape[:-1] + (1,)
    cw0 = np.concatenate([np.zeros(shape), cw, np.ones(shape)], axis=-1)
    return np.stack(
        [np.interp(u[i], cw0[i], t[i]) for i in range(t.shape[0])])


def test_searchsorted(rng):
    a = np.sort(rng.uniform(0, 1, (3, 9)), axis=-1).astype(np.float32)
    v = rng.uniform(-0.2, 1.2, (3, 7)).astype(np.float32)
    lo, hi = stepfun.searchsorted(jnp.asarray(a), jnp.asarray(v))
    for i in range(3):
        for j in range(7):
            if v[i, j] < a[i, 0]:
                assert lo[i, j] == 0 and hi[i, j] == 0
            elif v[i, j] >= a[i, -1]:
                assert lo[i, j] == 8 and hi[i, j] == 8
            else:
                assert a[i, lo[i, j]] <= v[i, j] < a[i, hi[i, j]]
                assert hi[i, j] == lo[i, j] + 1


def test_invert_cdf_matches_numpy(rng):
    t = np.sort(rng.uniform(0, 1, (4, 9)), axis=-1).astype(np.float32)
    logits = rng.normal(size=(4, 8)).astype(np.float32)
    u = np.sort(rng.uniform(0, 1 - 1e-6, (4, 16)), axis=-1).astype(np.float32)
    out = stepfun.invert_cdf(jnp.asarray(u), jnp.asarray(t),
                             jnp.asarray(logits))
    ref = _invert_cdf_np(u, t, logits)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_sample_deterministic_monotone(rng):
    t = np.sort(rng.uniform(0, 1, (2, 9)), axis=-1).astype(np.float32)
    logits = rng.normal(size=(2, 8)).astype(np.float32)
    s = stepfun.sample(None, jnp.asarray(t), jnp.asarray(logits), 16)
    s = np.asarray(s)
    assert np.all(np.diff(s, axis=-1) >= -1e-6)
    assert np.all(s >= t[:, :1] - 1e-6) and np.all(s <= t[:, -1:] + 1e-6)


def test_sample_random_in_domain(rng):
    t = np.sort(rng.uniform(0, 1, (2, 9)), axis=-1).astype(np.float32)
    logits = rng.normal(size=(2, 8)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    s = np.asarray(stepfun.sample(key, jnp.asarray(t), jnp.asarray(logits),
                                  16, single_jitter=True))
    assert np.all(np.diff(s, axis=-1) >= -1e-6)
    assert np.all(s >= t[:, :1] - 1e-6) and np.all(s <= t[:, -1:] + 1e-6)


def test_sample_intervals_fenceposts(rng):
    t = np.sort(rng.uniform(0, 1, (2, 9)), axis=-1).astype(np.float32)
    logits = rng.normal(size=(2, 8)).astype(np.float32)
    out = np.asarray(stepfun.sample_intervals(
        None, jnp.asarray(t), jnp.asarray(logits), 8, domain=(0.0, 1.0)))
    assert out.shape == (2, 9)
    assert np.all(np.diff(out, axis=-1) >= -1e-6)
    assert np.all(out >= 0) and np.all(out <= 1)


def test_max_dilate_simple():
    # One unit-weight bin [0.4, 0.6] dilated by 0.1 -> support [0.3, 0.7].
    t = jnp.array([[0.0, 0.4, 0.6, 1.0]])
    w = jnp.array([[0.0, 1.0, 0.0]])
    td, wd = stepfun.max_dilate(t, w, 0.1)
    td, wd = np.asarray(td), np.asarray(wd)
    for lo, hi, val in zip(td[0, :-1], td[0, 1:], wd[0]):
        mid = (lo + hi) / 2
        expect = 1.0 if (0.3 <= mid < 0.7) else 0.0
        assert val == expect, (lo, hi, val)


def test_integrate_weights_endpoints(rng):
    w = rng.uniform(0, 1, (3, 8)).astype(np.float32)
    w /= w.sum(axis=-1, keepdims=True)
    cw = np.asarray(stepfun.integrate_weights(jnp.asarray(w)))
    np.testing.assert_allclose(cw[:, 0], 0.0)
    np.testing.assert_allclose(cw[:, -1], 1.0)
    assert np.all(np.diff(cw, axis=-1) >= -1e-6)


def test_lossfun_distortion_zero_for_delta():
    # All weight in one infinitesimally narrow bin -> loss ~ width/3.
    t = jnp.array([[0.0, 0.499, 0.501, 1.0]])
    w = jnp.array([[0.0, 1.0, 0.0]])
    loss = float(stepfun.lossfun_distortion(t, w)[0])
    np.testing.assert_allclose(loss, 0.002 / 3, atol=1e-6)


def test_lossfun_outer_envelope(rng):
    # When the proposal envelope dominates, the loss is zero.
    t = jnp.array([[0.0, 0.25, 0.5, 0.75, 1.0]])
    w = jnp.array([[0.1, 0.2, 0.3, 0.1]])
    t_env = jnp.array([[0.0, 0.5, 1.0]])
    w_env = jnp.array([[0.9, 0.9]])
    loss = np.asarray(stepfun.lossfun_outer(t, w, t_env, w_env))
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)
    # With a zero envelope the loss is w^2 / (w + eps) ~ w.
    loss2 = np.asarray(stepfun.lossfun_outer(t, w, t_env, 0 * w_env))
    np.testing.assert_allclose(loss2, np.asarray(w), rtol=1e-4)


def test_blur_stepfun_preserves_mass(rng):
    x = np.sort(rng.uniform(0, 1, (2, 9)), axis=-1).astype(np.float32)
    y = rng.uniform(0, 2, (2, 8)).astype(np.float32)
    r = 0.01
    xr, yr = stepfun.blur_stepfun(jnp.asarray(x), jnp.asarray(y), r)
    xr, yr = np.asarray(xr), np.asarray(yr)
    assert xr.shape == (2, 18) and yr.shape == (2, 18)
    assert np.all(np.diff(xr, axis=-1) >= -1e-6)
    # Trapezoid mass of the blurred fn == rectangle mass of the original.
    mass_in = np.sum(y * np.diff(x, axis=-1), axis=-1)
    mass_out = np.sum(
        0.5 * (yr[:, 1:] + yr[:, :-1]) * np.diff(xr, axis=-1), axis=-1)
    np.testing.assert_allclose(mass_out, mass_in, rtol=1e-3)


def test_blur_stepfun_box_profile():
    # Blurring a single unit bin with radius r gives a trapezoid.
    x = jnp.array([[0.0, 1.0]])
    y = jnp.array([[1.0]])
    xr, yr = stepfun.blur_stepfun(x, y, 0.25)
    np.testing.assert_allclose(np.asarray(xr)[0], [-0.25, 0.25, 0.75, 1.25],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(yr)[0], [0.0, 1.0, 1.0, 0.0],
                               atol=1e-5)


def test_resample_conserves(rng):
    tp = np.sort(rng.uniform(0, 1, (2, 9)), axis=-1).astype(np.float32)
    vp = rng.uniform(0, 1, (2, 8)).astype(np.float32)
    t = np.stack([np.linspace(tp[i, 0], tp[i, -1], 17) for i in range(2)])
    v = np.asarray(stepfun.resample(jnp.asarray(t.astype(np.float32)),
                                    jnp.asarray(tp), jnp.asarray(vp)))
    np.testing.assert_allclose(v.sum(-1), vp.sum(-1), rtol=1e-4)


def test_weighted_percentile_uniform():
    t = jnp.array([[0.0, 0.5, 1.0]])
    w = jnp.array([[0.5, 0.5]])
    out = np.asarray(stepfun.weighted_percentile(t, w, [5, 50, 95]))
    np.testing.assert_allclose(out[0], [0.05, 0.5, 0.95], atol=1e-3)
