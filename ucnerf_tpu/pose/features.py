"""Keypoint detection + description for the pose-refinement pipeline.

The reference uses a pretrained SuperPoint network
(``/root/reference/pose_refinement/stpr/scripts/mvs/superpoint.py``); its
weights file is not vendored (missing blob) and this image has no network
egress, so this module provides two interchangeable detectors:

- ``SuperPointNet``: the SuperPoint architecture in flax (VGG encoder, 65-way
  detector head with pixel-shuffle decoding, 256-d descriptor head), usable
  when a weights file is supplied.
- ``harris_keypoints`` + ``patch_descriptors``: a weights-free classical
  detector (Harris corners + normalized-patch descriptors) so the full
  spatiotemporal refinement pipeline runs end-to-end out of the box.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SuperPointNet(nn.Module):
    """SuperPoint (DeTone et al. 2018): shared VGG encoder, detector +
    descriptor heads.  NHWC; input grayscale [N, H, W, 1] in [0, 1]."""
    c: Tuple[int, ...] = (64, 64, 128, 128)
    d1: int = 256
    desc_dim: int = 256

    @nn.compact
    def __call__(self, x):
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=1, name=name)
        pool = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(self.c[0], "conv1a")(x))
        x = nn.relu(conv(self.c[0], "conv1b")(x))
        x = pool(x)
        x = nn.relu(conv(self.c[1], "conv2a")(x))
        x = nn.relu(conv(self.c[1], "conv2b")(x))
        x = pool(x)
        x = nn.relu(conv(self.c[2], "conv3a")(x))
        x = nn.relu(conv(self.c[2], "conv3b")(x))
        x = pool(x)
        x = nn.relu(conv(self.c[3], "conv4a")(x))
        x = nn.relu(conv(self.c[3], "conv4b")(x))
        # Detector head: 65 = 8x8 cells + dustbin.
        cpa = nn.relu(conv(self.d1, "convPa")(x))
        semi = nn.Conv(65, (1, 1), name="convPb")(cpa)
        # Descriptor head.
        cda = nn.relu(conv(self.d1, "convDa")(x))
        desc = nn.Conv(self.desc_dim, (1, 1), name="convDb")(cda)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        return semi, desc


def superpoint_scores(semi):
    """Decode the 65-channel cell logits into a full-res heatmap
    (pixel-shuffle of the 64 non-dustbin channels)."""
    prob = jax.nn.softmax(semi, axis=-1)[..., :64]  # [N, h, w, 64]
    n, h, w, _ = prob.shape
    prob = prob.reshape(n, h, w, 8, 8)
    prob = prob.transpose(0, 1, 3, 2, 4).reshape(n, h * 8, w * 8)
    return prob


def load_superpoint_params(path):
    """Load the npz written by tools/convert_superpoint_weights.py into the
    flax variables dict of ``SuperPointNet``."""
    data = np.load(path)
    params = {}
    for key in data.files:
        layer, kind = key.split("/")
        params.setdefault(layer, {})[kind] = jnp.asarray(data[key])
    return {"params": params}


def _max_pool_same(x, radius):
    """Max over a (2r+1)^2 window, 'same' padding (superpoint.py:8-11)."""
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        [(0, 0), (radius, radius), (radius, radius)])


def simple_nms(scores, nms_radius=4):
    """The reference's two-round suppression NMS (superpoint.py:5-21):
    keep window maxima, zero everything else."""
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _max_pool_same(scores, nms_radius)
    for _ in range(2):
        supp_mask = _max_pool_same(max_mask.astype(scores.dtype),
                                   nms_radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == _max_pool_same(supp_scores, nms_radius)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


def _sample_descriptors(keypoints_xy, desc_coarse, s=8):
    """Bilinear-sample the coarse [h, w, C] descriptor map at full-res
    keypoint (x, y) coords, L2-normalized (superpoint.py:35-46 semantics,
    align_corners=True)."""
    h, w, _ = desc_coarse.shape
    kp = np.asarray(keypoints_xy, np.float32) - s / 2 + 0.5
    gx = (kp[:, 0] / (w * s - s / 2 - 0.5)) * 2 - 1
    gy = (kp[:, 1] / (h * s - s / 2 - 0.5)) * 2 - 1
    # align_corners=True grid coords.
    fx = np.clip((gx + 1) / 2 * (w - 1), 0, w - 1)
    fy = np.clip((gy + 1) / 2 * (h - 1), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int32), 0, w - 1)
    y0 = np.clip(np.floor(fy).astype(np.int32), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    dm = np.asarray(desc_coarse)
    wx = (fx - x0)[:, None]
    wy = (fy - y0)[:, None]
    d = (dm[y0, x0] * (1 - wx) * (1 - wy) + dm[y0, x1] * wx * (1 - wy)
         + dm[y1, x0] * (1 - wx) * wy + dm[y1, x1] * wx * wy)
    n = np.linalg.norm(d, axis=-1, keepdims=True)
    return (d / np.maximum(n, 1e-8)).astype(np.float32)


def superpoint_detect_and_describe(variables, gray, max_keypoints=1024,
                                   nms_radius=4, keypoint_threshold=0.005,
                                   border=4):
    """SuperPoint keypoints + descriptors for one grayscale image [H, W] in
    [0, 1].  Returns ([K, 2] (x, y) int coords, [K, 256] unit descriptors),
    replicating the reference's decode path (superpoint.py:104-151): softmax
    heatmap, simple_nms, threshold, border removal, top-k, bilinear
    descriptor sampling."""
    gray = jnp.asarray(gray, jnp.float32)
    h_full, w_full = gray.shape
    semi, desc = SuperPointNet().apply(variables, gray[None, :, :, None])
    scores = simple_nms(superpoint_scores(semi), nms_radius)[0]
    scores = np.asarray(scores[:h_full, :w_full])
    ys, xs = np.nonzero(scores > keypoint_threshold)
    vals = scores[ys, xs]
    keep = ((xs >= border) & (xs < w_full - border)
            & (ys >= border) & (ys < h_full - border))
    xs, ys, vals = xs[keep], ys[keep], vals[keep]
    if len(vals) > max_keypoints:
        order = np.argsort(-vals)[:max_keypoints]
        xs, ys = xs[order], ys[order]
    kps = np.stack([xs, ys], -1).astype(np.int32)
    descs = _sample_descriptors(kps, np.asarray(desc[0]))
    return kps, descs


def _sobel(img):
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8
    ky = kx.T
    pad = jnp.pad(img, 1, mode="edge")
    def conv(k):
        out = jnp.zeros_like(img)
        for dy in range(3):
            for dx in range(3):
                out = out + k[dy, dx] * pad[dy:dy + img.shape[0],
                                            dx:dx + img.shape[1]]
        return out
    return conv(kx), conv(ky)


def _box_blur(img, r=2):
    out = img
    for axis in (0, 1):
        pad = [(r, r) if a == axis else (0, 0) for a in range(2)]
        p = jnp.pad(out, pad, mode="edge")
        acc = jnp.zeros_like(out)
        for d in range(2 * r + 1):
            sl = [slice(d, d + out.shape[a]) if a == axis else slice(None)
                  for a in range(2)]
            acc = acc + p[tuple(sl)]
        out = acc / (2 * r + 1)
    return out


def harris_response(gray, k=0.04):
    """Harris corner response of a grayscale image [H, W]."""
    ix, iy = _sobel(gray)
    sxx = _box_blur(ix * ix)
    syy = _box_blur(iy * iy)
    sxy = _box_blur(ix * iy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def harris_keypoints(gray, max_keypoints=1024, nms_radius=3, border=8):
    """Top-K Harris corners with local-maximum NMS.  Returns [K, 2] (x, y)."""
    resp = harris_response(jnp.asarray(gray, jnp.float32))
    h, w = resp.shape
    # NMS: keep strict local maxima over a (2r+1)^2 window.
    r = nms_radius
    p = jnp.pad(resp, r, constant_values=-jnp.inf)
    local_max = jnp.ones_like(resp, bool)
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            if dy == r and dx == r:
                continue
            local_max &= resp >= p[dy:dy + h, dx:dx + w]
    resp = jnp.where(local_max, resp, -jnp.inf)
    # Suppress borders.
    mask = jnp.zeros((h, w), bool).at[border:h - border,
                                      border:w - border].set(True)
    resp = jnp.where(mask, resp, -jnp.inf)
    flat = resp.reshape(-1)
    k = min(max_keypoints, flat.shape[0])
    scores, idx = jax.lax.top_k(flat, k)
    ys = idx // w
    xs = idx % w
    valid = scores > -jnp.inf
    return np.asarray(jnp.stack([xs, ys], -1))[np.asarray(valid)]


def patch_descriptors(gray, keypoints, patch=11):
    """Normalized image patches as descriptors: [K, patch*patch], unit norm."""
    gray = np.asarray(gray, np.float32)
    r = patch // 2
    padded = np.pad(gray, r, mode="edge")
    descs = np.empty((len(keypoints), patch * patch), np.float32)
    for i, (x, y) in enumerate(np.asarray(keypoints)):
        p = padded[y:y + patch, x:x + patch].reshape(-1)
        p = p - p.mean()
        n = np.linalg.norm(p)
        descs[i] = p / n if n > 1e-8 else p
    return descs


def detect_and_describe(gray, max_keypoints=1024):
    """Weights-free detector+descriptor used by the default pipeline."""
    kps = harris_keypoints(gray, max_keypoints=max_keypoints)
    descs = patch_descriptors(gray, kps)
    return kps, descs
