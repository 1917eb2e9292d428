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
