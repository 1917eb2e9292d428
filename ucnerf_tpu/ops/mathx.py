"""Numerically-safe math helpers (TPU/JAX).

Functional parity with the reference's math library
(``/root/reference/nerf/internal/math.py``): fast erf approximation
(math.py:5-7), safe trig/exp (math.py:18-41), log-lerp LR schedule
(math.py:44-85), and the TPU-style sorted interpolation primitives
(math.py:88-133) used by the CDF-resampling chain.  All functions here are
pure, jit-safe, and operate on the trailing axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

EPS = float(np.finfo(np.float32).eps)


def fast_erf(x):
    """Cheap erf approximation: sign(x) * sqrt(1 - exp(-4/pi x^2)).

    Matches the custom approximation in the reference (math.py:5-7).  The
    exact ``jax.lax.erf`` is used where the reference calls ``torch.erf``
    (models.py:495); this approximation is kept for parity-checking.
    """
    return jnp.sign(x) * jnp.sqrt(1.0 - jnp.exp(-(4.0 / jnp.pi) * x**2))


def safe_trig_helper(x, fn, t=100 * jnp.pi):
    """Mod `x` into a safe range before applying a trig function."""
    return fn(jnp.where(jnp.abs(x) < t, x, x % t))


def safe_cos(x):
    return safe_trig_helper(x, jnp.cos)


def safe_sin(x):
    return safe_trig_helper(x, jnp.sin)


@jax.custom_jvp
def safe_exp(x):
    """exp(min(x, 88)) with the gradient of plain exp (large when x large)."""
    return jnp.exp(jnp.minimum(x, 88.0))


@safe_exp.defjvp
def _safe_exp_jvp(primals, tangents):
    (x,) = primals
    (x_dot,) = tangents
    y = safe_exp(x)
    return y, y * x_dot


def log_lerp(t, v0, v1):
    """Interpolate log-linearly from v0 (t=0) to v1 (t=1)."""
    if v0 <= 0 or v1 <= 0:
        raise ValueError(f"Interpolants {v0} and {v1} must be positive.")
    lv0, lv1 = np.log(v0), np.log(v1)
    return jnp.exp(jnp.clip(t, 0, 1) * (lv1 - lv0) + lv0)


def learning_rate_decay(step, lr_init, lr_final, max_steps, lr_delay_steps=0,
                        lr_delay_mult=1.0):
    """Log-lerp LR decay with a reverse-cosine warmup (math.py:53-85)."""
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    return delay_rate * log_lerp(step / max_steps, lr_init, lr_final)


def take_along_last(y, idx):
    """Exact ``jnp.take_along_axis(y, idx, axis=-1)`` as a one-hot MXU
    contraction, for SMALL trailing dims (stepfun histograms, N <~ 256).

    Rationale (PERF_NOTES round 5): XLA lowers trailing-axis
    ``take_along_axis`` on v5e to a kCustom gather fusion that runs at
    ~2 GB/s — the three such gathers in the anti-interlevel loss chain
    (``sorted_interp_quad``, ``blur_stepfun``) cost 49 ms of a 1.2 s
    flagship step.  A one-hot ``(idx == iota)`` matrix contracted against
    ``y`` is mathematically EXACT selection (products are y*1 and y*0, both
    exact in f32; HIGHEST precision forbids bf16 demotion) and maps onto the
    MXU; its transpose (the gradient w.r.t. ``y``) is likewise a matmul
    instead of a scatter-add.

    y: [..., N], idx: int[..., M] (values in [0, N)) -> [..., M].
    """
    n = y.shape[-1]
    onehot = (idx[..., :, None] == jnp.arange(n, dtype=idx.dtype)).astype(
        y.dtype)
    return jnp.einsum("...mn,...n->...m", onehot, y,
                      precision=jax.lax.Precision.HIGHEST)


def _masked_extrema(mask, y, axis=-2):
    """Given mask[..., M, N] over sorted y[..., M], return (y0, y1) where y0 is
    y at the last True row and y1 is y at the first False row, clamped to the
    first/last entry when the query is out of range."""
    y0 = jnp.max(jnp.where(mask, y[..., None], y[..., :1, None]), axis=axis)
    y1 = jnp.min(jnp.where(~mask, y[..., None], y[..., -1:, None]), axis=axis)
    return y0, y1


def sorted_interp(x, xp, fp):
    """TPU-friendly piecewise-linear interp; xp and fp must be sorted.

    Uses the masked max/min formulation instead of searchsorted (math.py:88-107)
    so it vectorizes as dense compare/select ops on the VPU, with no gathers.
    """
    mask = x[..., None, :] >= xp[..., :, None]  # [..., M, N]
    fp0, fp1 = _masked_extrema(mask, fp)
    xp0, xp1 = _masked_extrema(mask, xp)
    offset = jnp.clip(jnp.nan_to_num((x - xp0) / (xp1 - xp0), nan=0.0), 0, 1)
    return fp0 + offset * (fp1 - fp0)


def sorted_interp_quad(x, xp, fpdf, fcdf):
    """Piecewise-quadratic CDF interpolation (math.py:110-133).

    Interpolates the CDF `fcdf` (paired with a piecewise-linear PDF `fpdf` on
    knots `xp`) at the query points `x`.  Used by the anti-aliased interlevel
    loss, where the blurred proposal histogram has a piecewise-linear PDF.
    """
    mask = x[..., None, :] >= xp[..., :, None]  # [..., M, N]
    # Interval endpoints located by value-extrema over the masked CDF, with
    # first-occurrence argmax/argmin tie-breaking — exactly the reference's
    # torch.max/min(...).indices semantics, so degenerate queries (outside
    # [xp[0], xp[-1]], CDF plateaus) gather the same fpdf entries.
    big = jnp.where(mask, fcdf[..., :, None], fcdf[..., :1, None])
    small = jnp.where(~mask, fcdf[..., :, None], fcdf[..., -1:, None])
    fcdf0 = jnp.max(big, axis=-2)
    idx0 = jnp.argmax(big, axis=-2)
    idx1 = jnp.argmin(small, axis=-2)
    fpdf0 = take_along_last(fpdf, idx0)
    fpdf1 = take_along_last(fpdf, idx1)
    xp0, xp1 = _masked_extrema(mask, xp)
    offset = jnp.clip(jnp.nan_to_num((x - xp0) / (xp1 - xp0), nan=0.0), 0, 1)
    # Trapezoid rule on the linear PDF between xp0 and x.
    return fcdf0 + (x - xp0) * (fpdf0 + fpdf1 * offset + fpdf0 * (1 - offset)) / 2


def override_gradient(fval, gval):
    """Use `fval` in the forward pass but `gval`'s gradient."""
    return jax.lax.stop_gradient(fval) + (gval - jax.lax.stop_gradient(gval))
