"""Plane-sweep correlation volume for CER-MVS (TPU/JAX).

TPU-native replacement for the reference's CUDA correlation sampler
(``/root/reference/mvs/alt_cuda_corr/correlation_kernel.cu`` driven by
``mvs/core/corr.py:45-158``): the per-pixel, per-depth-hypothesis dot product
between reference features and bilinearly-sampled source features is
expressed as XLA gathers + an einsum over the feature axis — batched, fused,
and differentiable without custom kernels.

Pipeline (corr.py semantics):
  1. ``projective_transform``: plane-sweep warp of the ref pixel grid at D
     inverse-depth hypotheses into each source view (projective_ops.py:16-27).
  2. ``build_corr_volume``: bilinear-sample source features there and dot with
     ref features -> [num, H, W, D] per-view cost volumes (/ 64, as the
     reference divides both maps by 8).
  3. 2-level average pooling over D (corr.py:95-99).
  4. ``lookup``: per-pixel radius-r linear sampling along D around the current
     disparity estimate (corr.py:102-147).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def projective_transform(poses, intrinsics, disps, ref_idx, src_idx):
    """Warp ref-view pixels at given inverse depths into a source view.

    Args:
      poses: [V, 4, 4] world-to-cam (reference convention: Ps[:, jj] @
        Ps[:, ii]^-1 maps ref cam -> src cam).
      intrinsics: [V, 3, 3].
      disps: [D, H, W] inverse-depth hypotheses in the ref view.
      ref_idx/src_idx: ints.

    Returns:
      coords [D, H, W, 2] pixel coordinates in the src view.
    """
    k_src = jnp.zeros((4, 4)).at[:3, :3].set(intrinsics[src_idx]).at[3, 3].set(
        1.0)
    k_ref_inv = jnp.zeros((4, 4)).at[:3, :3].set(
        jnp.linalg.inv(intrinsics[ref_idx])).at[3, 3].set(1.0)
    pij = k_src @ poses[src_idx] @ jnp.linalg.inv(poses[ref_idx]) @ k_ref_inv

    d, h, w = disps.shape
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # Homogeneous [x, y, 1, disp] (projective_ops.py:5-13).
    x1 = (pij[0, 0] * x + pij[0, 1] * y + pij[0, 2] + pij[0, 3] * disps)
    y1 = (pij[1, 0] * x + pij[1, 1] * y + pij[1, 2] + pij[1, 3] * disps)
    z1 = (pij[2, 0] * x + pij[2, 1] * y + pij[2, 2] + pij[2, 3] * disps)
    z1 = jnp.where(jnp.abs(z1) > 1e-12, z1, 1e-12)
    coords = jnp.stack([x1 / z1, y1 / z1], axis=-1)
    return jnp.clip(coords, -1e4, 1e4)


def bilinear_sample_nhwc(img, coords):
    """Sample img [H, W, C] at coords [..., 2] (x, y), zero padding."""
    h, w = img.shape[:2]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        vals = img[yi, xi]  # gather [..., C]
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def build_corr_volume(fmaps, poses, intrinsics, disps, src_indices,
                      ref_idx=0):
    """Per-source-view cost volumes.

    Args:
      fmaps: [V, H, W, C] feature maps (1/4 or 1/8 res).
      poses/intrinsics: [V, 4, 4] / [V, 3, 3] at feature resolution.
      disps: [D, H, W] inverse-depth hypotheses for the ref view.
      src_indices: static list of source view ids.

    Returns:
      corr [num_src, H, W, D].
    """
    fref = fmaps[ref_idx] / 8.0  # [H, W, C]
    vols = []
    for j in src_indices:
        coords = projective_transform(poses, intrinsics, disps, ref_idx, j)
        fsrc = fmaps[j] / 8.0

        def sample_one(coords_d):
            sampled = bilinear_sample_nhwc(fsrc, coords_d)  # [H, W, C]
            return jnp.einsum("hwc,hwc->hw", sampled, fref)

        corr = jax.lax.map(sample_one, coords)  # [D, H, W]
        vols.append(jnp.moveaxis(corr, 0, -1))  # [H, W, D]
    return jnp.stack(vols, axis=0)


def corr_pyramid(corr, num_levels=3):
    """Average-pool the hypothesis axis into a pyramid (corr.py:95-99)."""
    pyr = [corr]
    for _ in range(num_levels - 1):
        d = corr.shape[-1] // 2
        corr = 0.5 * (corr[..., 0:2 * d:2] + corr[..., 1:2 * d:2])
        pyr.append(corr)
    return pyr


def _linear_sample_lastdim(vol, x):
    """Linearly sample vol [..., D] at positions x [..., K] -> [..., K].

    1-D twin of the reference's bilinear_sampler1 (y fixed at 0), zero
    padding outside [0, D-1]."""
    d = vol.shape[-1]
    x0 = jnp.floor(x)
    fx = x - x0
    x0i = x0.astype(jnp.int32)
    vol_b = vol[..., None, :]  # [..., 1, D]

    def tap(xi):
        valid = (xi >= 0) & (xi < d)
        xic = jnp.clip(xi, 0, d - 1)
        vals = jnp.take_along_axis(vol_b, xic[..., None], axis=-1)[..., 0]
        return jnp.where(valid, vals, 0.0)

    return tap(x0i) * (1 - fx) + tap(x0i + 1) * fx


def lookup(pyramid: Sequence[jnp.ndarray], disp, disps_origin, incre,
           n_incre, radius=5):
    """Sample the pyramid around the current disparity (corr.py:102-147).

    Args:
      pyramid: list of [num, H, W, D_l] volumes.
      disp: [H, W] current inverse-depth estimate.
      disps_origin: [H, W] center of the hypothesis slab.
      incre: hypothesis spacing.
      n_incre: number of hypotheses at level 0.
      radius: half window.

    Returns:
      features [num, H, W, num_levels * (2*radius+1)].
    """
    k = 2 * radius + 1
    center = jnp.maximum((disp - disps_origin) / incre + n_incre // 2, 0.0)
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    outs = []
    for i, vol in enumerate(pyramid):
        x = center[None, :, :, None] / (2**i) + dx  # [1, H, W, K]
        x = jnp.broadcast_to(x, vol.shape[:3] + (k,))
        outs.append(_linear_sample_lastdim(vol, x))
    return jnp.concatenate(outs, axis=-1)
