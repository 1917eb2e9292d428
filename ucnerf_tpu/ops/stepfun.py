"""Step-function toolkit: resampling, dilation, histogram losses (TPU/JAX).

Functional parity with the reference's step-function library
(``/root/reference/nerf/internal/stepfun.py``): vectorized searchsorted
(stepfun.py:6-25), CDF-inversion sampling (stepfun.py:154-218), interval
sampling (stepfun.py:251-294), max-dilation (stepfun.py:75-105), the
proposal/distortion losses (stepfun.py:52-61,297-307) and the anti-aliased
step-function blur (stepfun.py:395-403).

All functions are pure and jit-safe.  Randomness is passed as an explicit
``jax.random`` key (``None`` selects the deterministic branch, mirroring the
reference's ``rand`` flag).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.ops import mathx

EPS = mathx.EPS


def searchsorted(a, v):
    """For each v, find idx_lo/idx_hi in sorted `a` with a[lo] <= v < a[hi].

    Out-of-range queries clamp both indices to the first/last index of `a`.
    Implemented with masked extrema over a dense [..., M, N] comparison, which
    maps onto the VPU with no data-dependent control flow (stepfun.py:6-25).
    """
    i = jnp.arange(a.shape[-1], dtype=jnp.int32)
    v_ge_a = v[..., None, :] >= a[..., :, None]
    idx_lo = jnp.max(jnp.where(v_ge_a, i[:, None], i[:1, None]), axis=-2)
    idx_hi = jnp.min(jnp.where(~v_ge_a, i[:, None], i[-1:, None]), axis=-2)
    return idx_lo, idx_hi


def query(tq, t, y, outside_value=0):
    """Look up the values of the step function (t, y) at locations tq."""
    idx_lo, idx_hi = searchsorted(t, tq)
    yq = mathx.take_along_last(y, jnp.minimum(idx_lo, y.shape[-1] - 1))
    return jnp.where(idx_lo == idx_hi, outside_value, yq)


def inner_outer(t0, t1, y1):
    """Construct inner and outer measures on (t1, y1) for intervals t0."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    idx_lo, idx_hi = searchsorted(t1, t0)
    cy1_lo = mathx.take_along_last(cy1, idx_lo)
    cy1_hi = mathx.take_along_last(cy1, idx_hi)
    y0_outer = cy1_hi[..., 1:] - cy1_lo[..., :-1]
    y0_inner = jnp.where(idx_hi[..., :-1] <= idx_lo[..., 1:],
                         cy1_lo[..., 1:] - cy1_hi[..., :-1], 0.0)
    return y0_inner, y0_outer


def lossfun_outer(t, w, t_env, w_env):
    """Penalize proposal weights that fail to upper-bound the nerf weights."""
    _, w_outer = inner_outer(t, t_env, w_env)
    return jnp.maximum(w - w_outer, 0.0) ** 2 / (w + EPS)


def weight_to_pdf(t, w):
    """Turn weights summing to 1 into a PDF integrating to 1."""
    return w / jnp.maximum(t[..., 1:] - t[..., :-1], EPS)


def pdf_to_weight(t, p):
    """Turn a PDF integrating to 1 into weights summing to 1."""
    return p * (t[..., 1:] - t[..., :-1])


def max_dilate(t, w, dilation, domain=(-jnp.inf, jnp.inf)):
    """Dilate (via max-pooling) a non-negative step function."""
    t0 = t[..., :-1] - dilation
    t1 = t[..., 1:] + dilation
    t_dilate = jnp.sort(jnp.concatenate([t, t0, t1], axis=-1), axis=-1)
    t_dilate = jnp.clip(t_dilate, *domain)
    covered = ((t0[..., None, :] <= t_dilate[..., None])
               & (t1[..., None, :] > t_dilate[..., None]))
    w_dilate = jnp.max(jnp.where(covered, w[..., None, :], 0.0),
                       axis=-1)[..., :-1]
    return t_dilate, w_dilate


def max_dilate_weights(t, w, dilation, domain=(-jnp.inf, jnp.inf),
                       renormalize=False):
    """Dilate (via max-pooling) a set of weights (stepfun.py:91-105)."""
    p = weight_to_pdf(t, w)
    t_dilate, p_dilate = max_dilate(t, p, dilation, domain=domain)
    w_dilate = pdf_to_weight(t_dilate, p_dilate)
    if renormalize:
        w_dilate /= jnp.maximum(
            jnp.sum(w_dilate, axis=-1, keepdims=True), EPS)
    return t_dilate, w_dilate


def integrate_weights(w):
    """CDF endpoints of weights assumed to sum to 1: [0, cumsum..., 1]."""
    cw = jnp.minimum(1.0, jnp.cumsum(w[..., :-1], axis=-1))
    shape = cw.shape[:-1] + (1,)
    return jnp.concatenate(
        [jnp.zeros(shape, cw.dtype), cw, jnp.ones(shape, cw.dtype)], axis=-1)


def invert_cdf(u, t, w_logits):
    """Invert the CDF defined by (t, w_logits) at points u in [0, 1)."""
    w = jax.nn.softmax(w_logits, axis=-1)
    cw = integrate_weights(w)
    return mathx.sorted_interp(u, cw, t)


def sample(key, t, w_logits, num_samples, single_jitter=False,
           deterministic_center=False):
    """Piecewise-constant PDF sampling from a step function (stepfun.py:175-218).

    Args:
      key: PRNG key, or None for deterministic linspace sampling.
      t: [..., num_bins + 1], sorted bin endpoints.
      w_logits: [..., num_bins], logits of bin weights.
      num_samples: number of samples.
      single_jitter: jitter all samples along a ray by one shared offset.
      deterministic_center: with key=None, return interval centers instead of a
        full-span linspace.

    Returns:
      t_samples: [..., num_samples].
    """
    if key is None:
        if deterministic_center:
            pad = 1 / (2 * num_samples)
            u = jnp.linspace(pad, 1.0 - pad - EPS, num_samples)
        else:
            u = jnp.linspace(0, 1.0 - EPS, num_samples)
        u = jnp.broadcast_to(u, t.shape[:-1] + (num_samples,))
    else:
        u_max = EPS + (1 - EPS) / num_samples
        max_jitter = (1 - u_max) / (num_samples - 1) - EPS
        d = 1 if single_jitter else num_samples
        u = (jnp.linspace(0, 1 - u_max, num_samples) +
             jax.random.uniform(key, t.shape[:-1] + (d,)) * max_jitter)
    return invert_cdf(u, t, w_logits)


def sample_intervals(key, t, w_logits, num_samples, single_jitter=False,
                     domain=(-jnp.inf, jnp.inf)):
    """Sample *intervals* (rather than points) from a step function.

    Returns num_samples+1 fenceposts spanning midpoints of adjacent sampled
    centers, with reflected and domain-clamped first/last posts
    (stepfun.py:251-294).
    """
    if num_samples <= 1:
        raise ValueError(f"num_samples must be > 1, is {num_samples}.")
    centers = sample(key, t, w_logits, num_samples, single_jitter,
                     deterministic_center=True)
    mid = (centers[..., 1:] + centers[..., :-1]) / 2
    minval, maxval = domain
    first = jnp.maximum(2 * centers[..., :1] - mid[..., :1], minval)
    last = jnp.minimum(2 * centers[..., -1:] - mid[..., -1:], maxval)
    return jnp.concatenate([first, mid, last], axis=-1)


def lossfun_distortion(t, w):
    """Compute iint w[i] w[j] |t[i] - t[j]| di dj (stepfun.py:297-307)."""
    ut = (t[..., 1:] + t[..., :-1]) / 2
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3
    return loss_inter + loss_intra


def weighted_percentile(t, w, ps):
    """Weighted percentiles of a step function; w must sum to 1 on each ray."""
    cw = integrate_weights(w)
    q = jnp.broadcast_to(jnp.asarray(ps, t.dtype) / 100,
                         t.shape[:-1] + (len(ps),))
    return mathx.sorted_interp(q, cw, t)


def resample(t, tp, vp, use_avg=False):
    """Resample a step function (tp, vp) onto new fenceposts t."""
    if use_avg:
        wp = jnp.diff(tp, axis=-1)
        v_numer = resample(t, tp, vp * wp, use_avg=False)
        v_denom = resample(t, tp, wp, use_avg=False)
        return v_numer / jnp.maximum(v_denom, EPS)
    acc = jnp.cumsum(vp, axis=-1)
    acc0 = jnp.concatenate([jnp.zeros_like(acc[..., :1]), acc], axis=-1)
    acc0_resampled = mathx.sorted_interp(t, tp, acc0)
    return jnp.diff(acc0_resampled, axis=-1)


def blur_stepfun(x, y, r):
    """Convolve a step function (x, y) with a box filter of radius r.

    Returns the blurred (now piecewise-linear) function sampled at the union
    of shifted knots (stepfun.py:395-403).  x: [..., n+1] fenceposts,
    y: [..., n] values; output xr: [..., 2n+2], yr: [..., 2n+2].
    """
    # Sort the union of left/right-shifted knots, tracking provenance.
    xr_all = jnp.concatenate([x - r, x + r], axis=-1)
    n2 = xr_all.shape[-1]
    idx = jnp.broadcast_to(jnp.arange(n2, dtype=jnp.int32), xr_all.shape)
    xr, xr_idx = jax.lax.sort_key_val(xr_all, idx, dimension=-1)
    # Derivative impulses of the box-filtered function at each original knot.
    y1 = (jnp.concatenate([y, jnp.zeros_like(y[..., :1])], axis=-1) -
          jnp.concatenate([jnp.zeros_like(y[..., :1]), y], axis=-1)) / (2 * r)
    y2 = mathx.take_along_last(
        jnp.concatenate([y1, -y1], axis=-1), xr_idx[..., :-1])
    yr = jnp.maximum(
        jnp.cumsum((xr[..., 1:] - xr[..., :-1]) * jnp.cumsum(y2, axis=-1),
                   axis=-1), 0.0)
    yr = jnp.concatenate([jnp.zeros_like(yr[..., :1]), yr], axis=-1)
    return xr, yr
