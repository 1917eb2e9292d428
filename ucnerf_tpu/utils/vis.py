"""Visualization: depth/acc colormaps and render panels.

Functional parity with the reference's vis suite
(``/root/reference/nerf/internal/vis.py:34-246``): percentile-normalized,
curve-warped depth colormaps with border-weighted normalization, acc/distance
panels, and a ``visualize_suite`` assembling them from a rendering dict.
Matplotlib colormaps are sampled into lookup tables (no figure machinery in
the hot path).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _colormap_lut(name: str, n: int = 256) -> np.ndarray:
    import matplotlib
    return np.asarray(matplotlib.colormaps[name](np.linspace(0, 1, n)))[:, :3]


def apply_colormap(x, cmap: str = "turbo"):
    """Map x in [0, 1] -> rgb via a matplotlib colormap LUT."""
    lut = _colormap_lut(cmap)
    idx = np.clip((np.asarray(x) * (len(lut) - 1)).astype(np.int32), 0,
                  len(lut) - 1)
    return lut[idx]


def weighted_percentile(x, w, ps, assume_sorted=False):
    """Percentiles of x, weighted by w (vis.py:21-31)."""
    x = np.asarray(x).reshape(-1)
    w = np.asarray(w).reshape(-1)
    if not assume_sorted:
        order = np.argsort(x)
        x, w = x[order], w[order]
    acc_w = np.cumsum(w)
    return np.interp(np.asarray(ps) / 100 * acc_w[-1], acc_w, x)


def visualize_cmap(value, weight, colormap="turbo", lo=None, hi=None,
                   percentile=99.0, curve_fn=lambda x: -np.log(x + np.finfo(
                       np.float32).eps), matte_background=True):
    """Weight-aware, curve-warped scalar visualization (vis.py:34-91)."""
    lo_auto, hi_auto = weighted_percentile(
        value, weight, [50 - percentile / 2, 50 + percentile / 2])
    lo = lo or (lo_auto - np.finfo(np.float32).eps)
    hi = hi or (hi_auto + np.finfo(np.float32).eps)
    value, lo, hi = [curve_fn(x) for x in [value, lo, hi]]
    value = np.nan_to_num(
        np.clip((value - np.minimum(lo, hi)) / np.abs(hi - lo), 0, 1))
    if colormap:
        colorized = apply_colormap(value, colormap)
    else:
        colorized = np.stack([value] * 3, axis=-1)
    if matte_background:
        w = np.asarray(weight)[..., None]
        colorized = colorized * w + (1 - w)
    return colorized


def visualize_rays(dist, dist_range, weights, rgbs, accumulate=False,
                   renormalize=False, resolution=512, bg_color=0.8):
    """Ray-histogram strip image (vis.py:100-153).

    Each sampling level's step functions (per-ray knots `dist`, values
    `weights`/`rgbs`) are resampled onto a common `resolution`-bin axis and
    stacked into an image: one pixel row per (ray, level), color = rgb,
    alpha = weight, matted over `bg_color`.

    Args:
      dist: list per level of [n, S_l + 1] sorted knots.
      dist_range: (lo, hi) of the common axis.
      weights: list per level of [n, S_l].
      rgbs: list per level of [n, S_l, 3] (values in [0, 1]).

    Returns:
      (vis [rows, resolution, 3], alpha [rows, resolution]).
    """
    import jax.numpy as jnp

    from ucnerf_tpu.ops import stepfun

    dist_vis = np.linspace(*dist_range, resolution + 1).astype(np.float32)
    rows_rgb, rows_alpha = [], []
    n = dist[0].shape[0]
    for ray in range(n):
        for d, w, r in zip(dist, weights, rgbs):
            dd = np.asarray(d[ray], np.float32)
            ww = np.asarray(w[ray], np.float32)
            rr = np.asarray(r[ray], np.float32)
            if accumulate:
                eps = np.finfo(np.float32).eps
                w_csum = np.cumsum(ww, axis=0)
                rw_csum = np.cumsum(rr * ww[:, None], axis=0)
                rr = (rw_csum + eps) / (w_csum[:, None] + 2 * eps)
                ww = w_csum
            vis_r = np.asarray(stepfun.resample(
                jnp.asarray(dist_vis)[None], jnp.asarray(dd)[None],
                jnp.asarray(rr.T), use_avg=True)).T
            vis_w = np.asarray(stepfun.resample(
                jnp.asarray(dist_vis)[None], jnp.asarray(dd)[None],
                jnp.asarray(ww)[None], use_avg=True))[0]
            rows_rgb.append(vis_r)
            rows_alpha.append(vis_w)
        # Separator row between rays.
        rows_rgb.append(np.zeros((resolution, 3), np.float32))
        rows_alpha.append(np.zeros((resolution,), np.float32))
    vis_rgb = np.stack(rows_rgb[:-1])
    vis_alpha = np.stack(rows_alpha[:-1])
    if renormalize:
        vis_alpha = vis_alpha / max(np.finfo(np.float32).eps,
                                    vis_alpha.max())
    vis = (vis_rgb * vis_alpha[..., None]
           + bg_color * (1 - vis_alpha)[..., None])
    return vis, vis_alpha


def visualize_ray_histograms(ray_history, num_rays=64, repeat=4):
    """Assemble the two reference ray panels (vis.py:193-221) from a model's
    ray_history: per-level colors along each ray, and sqrt-weight density.

    ray_history: list per level of dicts with 'sdist' [n, S+1], 'weights'
    [n, S] and channel-major 'rgb' [3, n, S] (prop levels carry no rgb —
    white is substituted, as the reference plots ray_rgbs only for levels
    that have them).
    """
    n = min(num_rays, ray_history[0]["sdist"].shape[0])
    dist = [np.asarray(h["sdist"][:n]) for h in ray_history]
    weights = [np.asarray(h["weights"][:n]) for h in ray_history]
    rgbs = []
    for h in ray_history:
        if h.get("rgb") is not None:
            rgbs.append(np.clip(
                np.moveaxis(np.asarray(h["rgb"])[:, :n], 0, -1), 0, 1))
        else:
            rgbs.append(np.ones(weights[len(rgbs)].shape + (3,), np.float32))

    ray_colors, _ = visualize_rays(dist, (0.0, 1.0), weights, rgbs)
    sqrt_w = [np.sqrt(w) for w in weights]
    ray_density, alpha = visualize_rays(
        dist, (0.0, 1.0), [np.ones_like(w) for w in sqrt_w],
        [np.repeat(w[..., None], 3, axis=-1) for w in sqrt_w], bg_color=0.0)
    # Alpha==0 bins render red, like the reference's null_color.
    ray_density = np.where(alpha[..., None] == 0,
                           np.array([1.0, 0.0, 0.0]), ray_density)
    rep = lambda img: np.repeat(img, repeat, axis=0)
    return {"ray_colors": rep(ray_colors),
            "ray_weights": rep(ray_density)}


def visualize_suite(rendering):
    """Assemble the standard panel dict from a rendering (vis.py:156-246)."""
    out = {}
    depth = rendering.get("distance_mean", rendering.get("depth"))
    acc = rendering["acc"]
    if depth is not None:
        out["color"] = np.clip(rendering["rgb"], 0, 1)
        out["depth"] = visualize_cmap(depth, np.ones_like(acc))
        out["depth_matted"] = visualize_cmap(depth, acc)
    if "distance_median" in rendering:
        out["depth_median"] = visualize_cmap(rendering["distance_median"],
                                             np.ones_like(acc))
    out["acc"] = np.stack([np.clip(acc, 0, 1)] * 3, axis=-1)
    for k in rendering:
        if k.startswith("normals"):
            out[k] = np.asarray(rendering[k]) / 2.0 + 0.5
    return out


def save_image_u8(path, img):
    from PIL import Image
    Image.fromarray(
        (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)).save(path)
