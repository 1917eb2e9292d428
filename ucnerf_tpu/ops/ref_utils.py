"""Reflection-direction utilities + integrated directional encoding (TPU/JAX).

Functional parity with the reference
(``/root/reference/nerf/internal/ref_utils.py``): vector reflection,
normalization, weighted mean angular error (ref_utils.py:6-44), and the
ref-NeRF integrated directional encoding over spherical harmonics
(ref_utils.py:92-157).  The SH coefficient tables are precomputed in numpy at
closure-build time; the encoding itself avoids complex arithmetic (real/imag
parts tracked separately, which also keeps everything in plain f32 on TPU).
"""

from __future__ import annotations

import math as pymath

import jax
import jax.numpy as jnp
import numpy as np


def reflect(viewdirs, normals):
    """u = 2 dot(n, v) n - v (normals assumed unit length)."""
    return (2.0 * jnp.sum(normals * viewdirs, axis=-1, keepdims=True)
            * normals - viewdirs)


def l2_normalize(x, eps=None):
    eps = eps or float(np.finfo(np.float32).eps)
    return x / jnp.sqrt(
        jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), eps**2))


def compute_weighted_mae(weights, normals, normals_gt):
    """Weighted mean angular error in degrees (unit-length normals)."""
    one_eps = 1 - float(np.finfo(np.float32).eps)
    return ((weights * jnp.arccos(
        jnp.clip((normals * normals_gt).sum(-1), -one_eps, one_eps))).sum()
        / weights.sum() * 180.0 / jnp.pi)


def _generalized_binomial_coeff(a, k):
    return np.prod(a - np.arange(k)) / pymath.factorial(k)


def _assoc_legendre_coeff(l, m, k):
    """Coefficient of cos^k sin^m in P_l^m(cos theta)."""
    return ((-1) ** m * 2**l * pymath.factorial(l) / pymath.factorial(k)
            / pymath.factorial(l - k - m)
            * _generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l))


def _sph_harm_coeff(l, m, k):
    return (np.sqrt(
        (2.0 * l + 1.0) * pymath.factorial(l - m)
        / (4.0 * np.pi * pymath.factorial(l + m)))
        * _assoc_legendre_coeff(l, m, k))


def get_ml_array(deg_view):
    """All (m, l) pairs used by the encoding: l in {1,2,4,...}, 0 <= m <= l."""
    ml_list = []
    for i in range(deg_view):
        l = 2**i
        for m in range(l + 1):
            ml_list.append((m, l))
    return np.array(ml_list).T


def generate_ide_fn(deg_view):
    """Integrated directional encoding (ref-NeRF Eq. 6-8).

    Returns fn(xyz [..., 3], kappa_inv [..., 1]) -> [..., 2 * n_harmonics].
    """
    if deg_view > 5:
        raise ValueError("Only deg_view of at most 5 is numerically stable.")
    ml_array = get_ml_array(deg_view)
    l_max = 2 ** (deg_view - 1)

    mat = np.zeros((l_max + 1, ml_array.shape[1]))
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = _sph_harm_coeff(l, m, k)
    mat = jnp.asarray(mat, jnp.float32)
    m_arr = np.asarray(ml_array[0], np.int32)
    l_arr = np.asarray(ml_array[1], np.float32)
    sigma = jnp.asarray(0.5 * l_arr * (l_arr + 1), jnp.float32)

    def integrated_dir_enc_fn(xyz, kappa_inv):
        x = xyz[..., 0:1]
        y = xyz[..., 1:2]
        z = xyz[..., 2:3]
        vmz = jnp.concatenate([z**i for i in range(mat.shape[0])], axis=-1)
        # (x + iy)^m via real/imag recurrences (no complex dtype on the VPU).
        re, im = jnp.ones_like(x), jnp.zeros_like(x)
        res, ims = [], []
        power = 0
        max_m = int(m_arr.max())
        re_pows, im_pows = [re], [im]
        for _ in range(max_m):
            re, im = re * x - im * y, re * y + im * x
            re_pows.append(re)
            im_pows.append(im)
        vmxy_re = jnp.concatenate([re_pows[m] for m in m_arr], axis=-1)
        vmxy_im = jnp.concatenate([im_pows[m] for m in m_arr], axis=-1)

        zcomp = vmz @ mat
        sph_re = vmxy_re * zcomp
        sph_im = vmxy_im * zcomp
        att = jnp.exp(-sigma * kappa_inv)
        return jnp.concatenate([sph_re * att, sph_im * att], axis=-1)

    return integrated_dir_enc_fn


def generate_dir_enc_fn(deg_view):
    """Plain directional encoding: IDE with zero roughness."""
    ide_fn = generate_ide_fn(deg_view)

    def dir_enc_fn(xyz):
        return ide_fn(xyz, jnp.zeros_like(xyz[..., :1]))

    return dir_enc_fn
