import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.ops import mathx


def test_sorted_interp_matches_numpy(rng):
    xp = np.sort(rng.uniform(0, 10, size=(4, 16)), axis=-1).astype(np.float32)
    fp = np.sort(rng.uniform(-5, 5, size=(4, 16)), axis=-1).astype(np.float32)
    x = np.sort(rng.uniform(-1, 11, size=(4, 32)), axis=-1).astype(np.float32)
    out = mathx.sorted_interp(jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp))
    ref = np.stack([np.interp(x[i], xp[i], fp[i]) for i in range(4)])
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_sorted_interp_handles_repeated_knots():
    xp = jnp.array([[0.0, 1.0, 1.0, 2.0]])
    fp = jnp.array([[0.0, 1.0, 2.0, 3.0]])
    x = jnp.array([[0.5, 1.0, 1.5]])
    out = mathx.sorted_interp(x, xp, fp)
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[0, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(out[0, 2], 2.5, atol=1e-6)


def test_sorted_interp_quad_reduces_to_cdf_on_knots(rng):
    # On exact knots, the quadratic interpolation returns the CDF values.
    xp = np.sort(rng.uniform(0, 1, size=(2, 8)), axis=-1).astype(np.float32)
    fpdf = rng.uniform(0, 2, size=(2, 8)).astype(np.float32)
    fcdf = np.cumsum(fpdf, axis=-1).astype(np.float32)
    out = mathx.sorted_interp_quad(
        jnp.asarray(xp), jnp.asarray(xp), jnp.asarray(fpdf), jnp.asarray(fcdf))
    np.testing.assert_allclose(out, fcdf, atol=1e-4, rtol=1e-4)


def test_safe_exp_forward_and_grad():
    assert np.isfinite(mathx.safe_exp(jnp.float32(1000.0)))
    g = jax.grad(mathx.safe_exp)(jnp.float32(2.0))
    np.testing.assert_allclose(g, np.exp(2.0), rtol=1e-5)
    # Gradient stays large (not clipped to zero) past the clamp.
    g_big = jax.grad(mathx.safe_exp)(jnp.float32(100.0))
    assert g_big == mathx.safe_exp(jnp.float32(100.0))


def test_learning_rate_decay_endpoints():
    lr0 = mathx.learning_rate_decay(0, 0.01, 0.001, 1000)
    lr1 = mathx.learning_rate_decay(1000, 0.01, 0.001, 1000)
    np.testing.assert_allclose(lr0, 0.01, rtol=1e-6)
    np.testing.assert_allclose(lr1, 0.001, rtol=1e-6)
    # Warmup: tiny at step 0, full at delay_steps.
    lr_w0 = mathx.learning_rate_decay(0, 0.01, 0.001, 1000, 100, 1e-8)
    assert lr_w0 < 1e-9
    lr_w = mathx.learning_rate_decay(100, 0.01, 0.001, 1000, 100, 1e-8)
    np.testing.assert_allclose(
        lr_w, mathx.learning_rate_decay(100, 0.01, 0.001, 1000), rtol=1e-5)


def test_fast_erf_close_to_erf():
    x = jnp.linspace(-3, 3, 101)
    np.testing.assert_allclose(
        mathx.fast_erf(x), jax.scipy.special.erf(x), atol=7e-3)


def test_safe_trig_large_args():
    x = jnp.array([1e8, -1e8, 1.0])
    assert np.all(np.isfinite(mathx.safe_sin(x)))
    assert np.all(np.isfinite(mathx.safe_cos(x)))
    np.testing.assert_allclose(mathx.safe_sin(x)[2], np.sin(1.0), rtol=1e-6)


def test_take_along_last_exact_and_grad(rng):
    """One-hot MXU selection is bit-exact vs take_along_axis, incl. grads."""
    import jax
    import jax.numpy as jnp
    from ucnerf_tpu.ops import mathx

    y = jnp.asarray(rng.standard_normal((7, 33)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 33, size=(7, 50)), jnp.int32)
    got = mathx.take_along_last(y, idx)
    want = jnp.take_along_axis(y, idx, axis=-1)
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # Gradient w.r.t. y (a transpose-matmul scatter) matches exactly too.
    ct = jnp.asarray(rng.standard_normal((7, 50)), jnp.float32)
    g_got = jax.grad(lambda a: jnp.sum(mathx.take_along_last(a, idx) * ct))(y)
    g_want = jax.grad(
        lambda a: jnp.sum(jnp.take_along_axis(a, idx, axis=-1) * ct))(y)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_want))
