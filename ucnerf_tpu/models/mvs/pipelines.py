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

    # Sample the src depth at those coords (bilinear, zeros outside — the
    # reference's bilinear_sampler, fusion.py:66-67).
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    d_src = ((1 - fy) * ((1 - fx) * depth_src[y0, x0]
                         + fx * depth_src[y0, x1])
             + fy * ((1 - fx) * depth_src[y1, x0]
                     + fx * depth_src[y1, x1]))
    inb = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    d_src = jnp.where(inb, d_src, 0.0)

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


def dynamic_consistency_masks(depth_ref, pose_ref, k_ref, src_views, thre):
    """D2HC-RMVSNet dynamic consistency check (fusion.py:85-105, 229-260).

    For each source view and each strictness level i in [2, 10], a pixel is
    i-consistent when its roundtrip reprojection error is below
    (i / (10^thre * 4)) pixels AND its relative depth error is below
    (i / (10^thre * 1300)).  A pixel survives when, for some i < n (n = 1 +
    num sources), at least i sources agree at level i — a permissive
    threshold must be corroborated by more views.

    Returns (mask [H, W] bool, fused depth [H, W]) where fused depth is the
    mean of the ref depth and the strictest-level-consistent reprojections
    (fusion.py:260: (sum reproj + ref) / (count + 1)).
    """
    thre1 = 10.0**thre * 4.0
    thre2 = 10.0**thre * 1300.0
    h, w = depth_ref.shape
    y, x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    n = 1 + len(src_views)

    level_sums = [jnp.zeros((h, w), jnp.int32) for _ in range(2, 11)]
    strict_sum = jnp.zeros((h, w), jnp.int32)
    reproj_sum = jnp.zeros((h, w))
    for depth_src, pose_src, k_src in src_views:
        z2, (x2, y2) = reproject(depth_ref, pose_ref, pose_src, k_ref, k_src,
                                 depth_src)
        dist = jnp.sqrt((x2 - x) ** 2 + (y2 - y) ** 2)
        rel_err = jnp.abs(z2 - depth_ref) / jnp.maximum(depth_ref, 1e-9)
        strict = None
        for i in range(2, 11):
            ok = (dist < i / thre1) & (rel_err < i / thre2)
            level_sums[i - 2] = level_sums[i - 2] + ok.astype(jnp.int32)
            strict = ok  # i == 10 survives the loop (fusion.py:100-103)
        strict_sum = strict_sum + strict.astype(jnp.int32)
        # The reference zeroes reprojections by the LAST (i=10) per-src mask
        # before accumulating (fusion.py:103).
        reproj_sum = reproj_sum + jnp.where(strict, z2, 0.0)

    # geo_mask_sum >= n is unsatisfiable (n = n_src + 1 > n_src); kept for
    # parity with fusion.py:256 — the dynamic OR below does the real work.
    mask = strict_sum >= n
    for i in range(2, n):
        mask = mask | (level_sums[i - 2] >= i)
    mask = mask & (depth_ref > 0)
    fused = (reproj_sum + depth_ref) / (strict_sum.astype(depth_ref.dtype)
                                        + 1.0)
    return mask, fused


def adaptive_geometric_fusion(depths, poses, intrinsics, pairs, glb=0.25,
                              tot_iter=10, log_fn=None):
    """Adaptive-threshold geometric fusion (fusion.py:109-342).

    Bisects the log10 threshold over [-2, 2] for `tot_iter` rounds so the
    mean surviving-pixel fraction approaches `glb` (default 0.25,
    fusion.py:115), then returns the final masks and fused depths.

    Args:
      depths: [N, H, W] per-view depth maps (world-to-cam convention poses).
      poses: [N, 4, 4] world-to-cam extrinsics.
      intrinsics: [N, 3, 3].
      pairs: list of (ref_idx, [src_idx, ...]) view adjacency.
      glb: target mean mask fraction.

    Returns:
      dict ref_idx -> (mask [H, W] bool numpy, fused_depth [H, W] numpy,
      threshold) for the final iteration.
    """
    depths = jnp.asarray(depths)
    poses = jnp.asarray(poses)
    intrinsics = jnp.asarray(intrinsics)

    thre_left, thre_right = -2.0, 2.0
    results = {}
    for it in range(tot_iter):
        thre = (thre_left + thre_right) / 2
        fracs = []
        results = {}
        for ref, srcs in pairs:
            src_views = [(depths[s], poses[s], intrinsics[s]) for s in srcs]
            mask, fused = dynamic_consistency_masks(
                depths[ref], poses[ref], intrinsics[ref], src_views, thre)
            fracs.append(float(jnp.mean(mask.astype(jnp.float32))))
            results[ref] = (np.asarray(mask), np.asarray(fused), thre)
        mean_frac = float(np.mean(fracs))
        if log_fn is not None:
            log_fn(f"fusion iter {it}: thre=10^{thre:.3f} "
                   f"mask_frac={mean_frac:.3f}")
        # More pixels surviving than the budget -> tighten (higher thre
        # divides the tolerances down); fusion.py:303-306.
        if mean_frac >= glb:
            thre_left = thre
        else:
            thre_right = thre
    return results


def fused_point_cloud(results, images, poses, intrinsics):
    """Unproject masked fused depths to a colored world-space point cloud
    (fusion.py:285-297).

    Args:
      results: dict ref_idx -> (mask, fused_depth, thre) from
        adaptive_geometric_fusion.
      images: [N, H, W, 3] float in [0, 1].
      poses: [N, 4, 4] world-to-cam.
      intrinsics: [N, 3, 3].

    Returns:
      (xyz [M, 3] float32, rgb [M, 3] float32 in [0, 1]).
    """
    xyzs, rgbs = [], []
    for ref, (mask, fused, _) in sorted(results.items()):
        h, w = fused.shape
        yy, xx = np.nonzero(mask)
        if len(yy) == 0:
            continue
        d = fused[yy, xx]
        pix = np.stack([xx, yy, np.ones_like(xx)], 0).astype(np.float64)
        cam = np.linalg.inv(np.asarray(intrinsics[ref])) @ (pix * d)
        cam_h = np.concatenate([cam, np.ones_like(cam[:1])], 0)
        world = (np.linalg.inv(np.asarray(poses[ref])) @ cam_h)[:3]
        xyzs.append(world.T.astype(np.float32))
        rgbs.append(np.asarray(images[ref])[yy, xx].astype(np.float32))
    if not xyzs:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32))
    return np.concatenate(xyzs), np.concatenate(rgbs)
