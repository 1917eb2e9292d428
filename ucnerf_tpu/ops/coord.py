"""Coordinate warps: scene contraction, ray-distance curves, pos. encodings.

Functional parity with the reference (``/root/reference/nerf/internal/coord.py``):
the mip-NeRF 360 scene contraction (coord.py:8-15), the explicit-determinant
Gaussian-tracked contraction (coord.py:60-116), Zip-NeRF's power ray warp
(coord.py:119-177), and the sinusoidal / integrated positional encodings
(coord.py:180-226).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.ops import mathx

EPS = mathx.EPS


def contract(x):
    """Contract points towards the origin (Eq 10 of mip-NeRF 360).

    Maps R^3 into the ball of radius 2: identity inside the unit ball,
    (2 - 1/|x|) * x/|x| outside.
    """
    x_mag_sq = jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), EPS)
    z = jnp.where(x_mag_sq <= 1, x,
                  ((2 * jnp.sqrt(x_mag_sq) - 1) / x_mag_sq) * x)
    return z


def inv_contract(z):
    """The inverse of contract()."""
    z_mag_sq = jnp.maximum(jnp.sum(z**2, axis=-1, keepdims=True), EPS)
    x = jnp.where(
        z_mag_sq <= 1, z,
        z / jnp.maximum(2 * jnp.sqrt(z_mag_sq) - z_mag_sq, EPS))
    return x


def contract_mean_std(x, std):
    """Contract Gaussians (mean x, isotropic std) through contract().

    The std is scaled by det(J)^(1/3) of the contraction Jacobian, computed in
    closed form from the eigenvalues (coord.py:60-72) instead of materializing
    the 3x3 Jacobian — cheaper and TPU-friendly (no per-point 3x3 det).
    """
    x_mag_sq = jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), EPS)
    x_mag_sqrt = jnp.sqrt(x_mag_sq)
    mask = x_mag_sq <= 1
    z = jnp.where(mask, x, ((2 * x_mag_sqrt - 1) / x_mag_sq) * x)
    # det(J)^(1/3) = cbrt(2|x| - 1)^... reduces to ((2|x|-1)^(1/3) / |x|)^2.
    det_13 = (jnp.cbrt(jnp.maximum(2 * x_mag_sqrt - 1, EPS)) / x_mag_sqrt) ** 2
    std = jnp.where(mask[..., 0], std, det_13[..., 0] * std)
    return z, std


def track_linearize(fn, mean, std, stop_grads=True):
    """Linearize `fn` around Gaussian (mean, std), Kalman-style.

    Only the 'contract' warp is supported (as in the reference).  With
    stop_grads=True (default) gradients are stopped through the warp,
    matching the reference's @torch.no_grad on track_linearize
    (coord.py:75-116): sampling geometry is treated as fixed w.r.t. the
    parameters being optimized.  stop_grads=False is the documented TPU
    deviation (Config.contract_origin_grads): the contraction is
    differentiable, so photometric gradients reach the sample means — and
    through them the ray ORIGINS — which is what per-camera translation
    refinement needs (QUALITY_r03: translation is unlearnable under the
    reference semantics).
    """
    if fn != "contract":
        raise NotImplementedError(fn)
    mean, std = contract_mean_std(mean, std)
    if stop_grads:
        return jax.lax.stop_gradient(mean), jax.lax.stop_gradient(std)
    return mean, std


def contract_mean_std_cm(x, std):
    """Channel-major twin of contract_mean_std: x [3, ...], std [...].

    Keeps the coordinate axis leading so the large point axes stay in the
    TPU lane/sublane dims (no [..., 3] lane padding)."""
    x_mag_sq = jnp.maximum(x[0] ** 2 + x[1] ** 2 + x[2] ** 2, EPS)
    x_mag_sqrt = jnp.sqrt(x_mag_sq)
    mask = x_mag_sq <= 1
    scale = jnp.where(mask, 1.0, (2 * x_mag_sqrt - 1) / x_mag_sq)
    z = x * scale[None]
    det_13 = (jnp.cbrt(jnp.maximum(2 * x_mag_sqrt - 1, EPS)) / x_mag_sqrt) ** 2
    std = jnp.where(mask, std, det_13 * std)
    return z, std


def track_linearize_cm(fn, mean, std, stop_grads=True):
    """Channel-major track_linearize (see track_linearize for stop_grads)."""
    if fn != "contract":
        raise NotImplementedError(fn)
    mean, std = contract_mean_std_cm(mean, std)
    if stop_grads:
        return jax.lax.stop_gradient(mean), jax.lax.stop_gradient(std)
    return mean, std


def power_transformation(x, lam):
    """Power transformation, Eq (4) of Zip-NeRF."""
    lam_1 = np.abs(lam - 1)
    return lam_1 / lam * ((x / lam_1 + 1) ** lam - 1)


def inv_power_transformation(x, lam):
    """Inverse power transformation."""
    lam_1 = np.abs(lam - 1)
    return ((x * lam / lam_1 + 1 + EPS) ** (1 / lam) - 1) * lam_1


def construct_ray_warps(fn, t_near, t_far, lam=None):
    """Construct a bijection between metric and normalized ray distances.

    Args:
      fn: None (identity), 'piecewise', 'power_transformation', 'reciprocal',
        'log', 'exp', 'sqrt', 'square'.
      t_near/t_far: near/far plane distances (broadcastable tensors).
      lam: lambda for the power transformation.

    Returns:
      (t_to_s, s_to_t) mapping metric distance <-> normalized [0, 1].
    """
    if fn is None:
        fn_fwd = lambda x: x
        fn_inv = lambda x: x
    elif fn == "piecewise":
        fn_fwd = lambda x: jnp.where(x < 1, 0.5 * x, 1 - 0.5 / x)
        fn_inv = lambda x: jnp.where(x < 0.5, 2 * x, 0.5 / (1 - x))
    elif fn == "power_transformation":
        fn_fwd = lambda x: power_transformation(x * 2, lam=lam)
        fn_inv = lambda y: inv_power_transformation(y, lam=lam) / 2
    else:
        fwd_mapping = {
            "reciprocal": jnp.reciprocal,
            "log": jnp.log,
            "exp": jnp.exp,
            "sqrt": jnp.sqrt,
            "square": jnp.square,
        }
        inv_mapping = {
            "reciprocal": jnp.reciprocal,
            "log": jnp.exp,
            "exp": jnp.log,
            "sqrt": jnp.square,
            "square": jnp.sqrt,
        }
        fn_fwd = fwd_mapping[fn]
        fn_inv = inv_mapping[fn]

    s_near, s_far = [fn_fwd(x) for x in (t_near, t_far)]
    t_to_s = lambda t: (fn_fwd(t) - s_near) / (s_far - s_near)
    s_to_t = lambda s: fn_inv(s * s_far + (1 - s) * s_near)
    return t_to_s, s_to_t


def expected_sin(mean, var):
    """Mean of sin(x) for x ~ N(mean, var)."""
    return jnp.exp(-0.5 * var) * mathx.safe_sin(mean)


def integrated_pos_enc(mean, var, min_deg, max_deg):
    """IPE: sinusoids of Gaussian-distributed coordinates (coord.py:185-204)."""
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    shape = mean.shape[:-1] + (-1,)
    scaled_mean = (mean[..., None, :] * scales[:, None]).reshape(shape)
    scaled_var = (var[..., None, :] * scales[:, None] ** 2).reshape(shape)
    return expected_sin(
        jnp.concatenate([scaled_mean, scaled_mean + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([scaled_var] * 2, axis=-1))


def pos_enc(x, min_deg, max_deg, append_identity=True):
    """The positional encoding used by the original NeRF paper."""
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    shape = x.shape[:-1] + (-1,)
    scaled_x = (x[..., None, :] * scales[:, None]).reshape(shape)
    four_feat = jnp.sin(
        jnp.concatenate([scaled_x, scaled_x + 0.5 * jnp.pi], axis=-1))
    if append_identity:
        return jnp.concatenate([x, four_feat], axis=-1)
    return four_feat
