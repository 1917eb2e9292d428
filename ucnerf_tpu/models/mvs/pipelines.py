"""MVS pipelines: sequence loss, per-view inference, multires + geometric fusion.

Functional parity with the reference pipelines:
- ``sequence_loss`` (``/root/reference/mvs/loss.py:5-41``): gamma-decayed
  L1 blend of disparity and clipped depth errors over GRU iterations.
- ``infer_depth`` (``mvs/inference.py:19-70``): per-view inverse-depth,
  with the reference's post-processing (disp<0 -> 1e6, depth>50 -> 0).
- ``multires_fusion`` (``mvs/multires.py:16-40``): keep the 1x prediction
  where it agrees with the 0.5x prediction within 2%, else fall back.
- ``geometric_fusion`` (``mvs/fusion.py:39-342``): cross-view reprojection
  consistency masking (D2HC-RMVSNet style).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_resize(img, shape):
    """Bilinear resize [H, W] -> shape (jax)."""
    return jax.image.resize(img, shape, method="bilinear")


def sequence_loss(disp_est: Sequence[jnp.ndarray], disp_gt,
                  gradual_weight=0.5, gamma=0.9, depthloss_threshold=100.0,
                  depth_cut=1e-3):
    """Gamma-decayed sequence loss over GRU iterations (loss.py:5-41).

    disp_est: list of [h, w] per-iteration estimates (feature res).
    disp_gt: [H, W] ground-truth inverse depth (0 = invalid).
    """
    n = len(disp_est)
    ht, wd = disp_gt.shape
    valid = (disp_gt > 0).astype(jnp.float32)
    total = 0.0
    for i, est in enumerate(disp_est):
        est = bilinear_resize(est, (ht, wd))
        w_i = gamma ** (n - i - 1)
        loss_disp = jnp.abs(est - disp_gt)
        loss_depth = jnp.abs(1.0 / jnp.maximum(est, depth_cut)
                             - 1.0 / jnp.maximum(disp_gt, depth_cut))
        loss_depth = jnp.minimum(loss_depth, depthloss_threshold) / 3.6e5
        i_loss = (gradual_weight * loss_depth
                  + (1 - gradual_weight) * loss_disp)
        total += w_i * (valid * i_loss).mean()
        total += 0.01 * w_i * i_loss.mean()

    est_last = bilinear_resize(disp_est[-1], (ht, wd))
    epe = jnp.abs(1.0 / jnp.maximum(est_last, depth_cut) - 1.0 / jnp.maximum(
        disp_gt, depth_cut))
    denom = jnp.maximum(valid.sum(), 1.0)
    metrics = {
        "mean_depth_error": (epe * valid).sum() / denom,
        "less3": ((epe < 3) * valid).sum() / denom,
        "less10": ((epe < 10) * valid).sum() / denom,
        "less25": ((epe < 25) * valid).sum() / denom,
    }
    return total, metrics


def postprocess_disp(disp, max_depth=50.0):
    """Reference post-processing (inference.py:52-58): negative disparities
    become far (1e6), depths beyond max_depth become invalid (0)."""
    disp = jnp.where(disp < 0, 1e6, disp)
    depth = jnp.where(disp == 0, 0.0, 1.0 / disp)
    depth = jnp.where(depth > max_depth, 0.0, depth)
    return depth


def multires_fusion(depth_half, depth_full, th=0.02):
    """Cross-resolution consistency (multires.py:16-40): keep the full-res
    depth where |half - full| < th * half, else use the half-res depth."""
    depth_half = np.asarray(depth_half)
    depth_full = np.asarray(depth_full)
    if depth_half.shape != depth_full.shape:
        depth_half = np.asarray(
            jax.image.resize(jnp.asarray(depth_half), depth_full.shape,
                             "bilinear"))
    mask = np.abs(depth_half - depth_full) < th * depth_half
    return np.where(mask, depth_full, depth_half)


def reproject(depth_ref, pose_ref, pose_src, k_ref, k_src, depth_src):
    """Project ref pixels into src, sample src depth, project back.

    Returns (reprojected depth in ref frame, roundtrip pixel coords in ref).
    Used by geometric consistency (fusion.py:109-220 semantics).
    """
    h, w = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    k_ref_inv = jnp.linalg.inv(k_ref)
    rel = pose_src @ jnp.linalg.inv(pose_ref)  # world2cam convention

    pts = jnp.stack([x, y, jnp.ones_like(x)], 0).reshape(3, -1)
    cam_ref = k_ref_inv @ pts * depth_ref.reshape(1, -1)
    cam_src = rel[:3, :3] @ cam_ref + rel[:3, 3:]
    z_src = cam_src[2]
    pix_src = k_src @ (cam_src / jnp.where(jnp.abs(z_src) > 1e-9, z_src,
                                           1e-9))
    xs = pix_src[0].reshape(h, w)
    ys = pix_src[1].reshape(h, w)

    # Sample the src depth at those coords (nearest, zeros outside).
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32), 0, h - 1)
    inb = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    d_src = jnp.where(inb, depth_src[yi, xi], 0.0)

    # Back-project the src sample into ref.
    rel_inv = pose_ref @ jnp.linalg.inv(pose_src)
    cam_src2 = jnp.linalg.inv(k_src) @ pix_src * d_src.reshape(1, -1)
    cam_ref2 = rel_inv[:3, :3] @ cam_src2 + rel_inv[:3, 3:]
    z_ref2 = cam_ref2[2].reshape(h, w)
    pix_ref2 = k_ref @ (cam_ref2 / jnp.where(
        jnp.abs(cam_ref2[2]) > 1e-9, cam_ref2[2], 1e-9))
    x2 = pix_ref2[0].reshape(h, w)
    y2 = pix_ref2[1].reshape(h, w)
    return z_ref2, (x2, y2)


def geometric_consistency_mask(depth_ref, pose_ref, k_ref, src_views,
                               pix_th=1.0, depth_th=0.01, min_views=2):
    """Mask ref depths consistent across enough source views
    (fusion.py:109-240 semantics with fixed thresholds).

    src_views: list of (depth_src, pose_src, k_src).
    Returns (mask [H, W], fused depth = mean of consistent reprojections).
    """
    h, w = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    count = jnp.zeros((h, w))
    depth_sum = jnp.asarray(depth_ref)
    for depth_src, pose_src, k_src in src_views:
        z2, (x2, y2) = reproject(depth_ref, pose_ref, pose_src, k_ref, k_src,
                                 depth_src)
        dist = jnp.sqrt((x2 - x) ** 2 + (y2 - y) ** 2)
        rel_err = jnp.abs(z2 - depth_ref) / jnp.maximum(depth_ref, 1e-9)
        ok = (dist < pix_th) & (rel_err < depth_th) & (depth_ref > 0) & (
            z2 > 0)
        count += ok
        depth_sum += jnp.where(ok, z2, 0.0)
    mask = (count >= min_views) & (depth_ref > 0)
    fused = jnp.where(mask, depth_sum / (count + 1), 0.0)
    return mask, fused
