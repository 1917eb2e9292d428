"""LPIPS perceptual distance (VGG-16 variant) in JAX/flax.

The reference computes LPIPS with the pretrained torchvision VGG backbone +
learned linear heads (``/root/reference/nerf/internal/image.py:8,128-130``).
This image has no network egress and no vendored weights, so this module
implements the exact architecture (VGG-16 features at relu1_2 .. relu5_3,
unit-normalized channels, 1x1 linear heads, spatial mean) and loads weights
from a local .npz when available:

  npz keys: vgg/conv{i}_{j}/kernel [kh, kw, cin, cout], .../bias [cout],
            lin{k}/kernel [1, 1, c_k, 1]  (k = 0..4)

Without weights the harness reports LPIPS as None rather than a misleading
random-feature distance.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

_VGG_CFG = [  # (stage, convs, channels)
    (1, 2, 64), (2, 2, 128), (3, 3, 256), (4, 3, 512), (5, 3, 512)]
# Channel dims of the tapped activations relu1_2..relu5_3.
_TAP_DIMS = [64, 128, 256, 512, 512]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    """Callable LPIPS(img0, img1) over [H, W, 3] float images in [0, 1]."""

    def __init__(self, weights: dict):
        self.weights = weights

    @classmethod
    def from_file(cls, path: str) -> Optional["LPIPS"]:
        try:
            data = np.load(path)
        except (OSError, ValueError):
            return None
        return cls({k: np.asarray(data[k]) for k in data.files})

    def _features(self, x):
        import jax
        import jax.numpy as jnp

        feats = []
        h = x[None]  # [1, H, W, 3]
        for stage, convs, _ in _VGG_CFG:
            for j in range(1, convs + 1):
                wk = jnp.asarray(self.weights[f"vgg/conv{stage}_{j}/kernel"])
                wb = jnp.asarray(self.weights[f"vgg/conv{stage}_{j}/bias"])
                h = jax.lax.conv_general_dilated(
                    h, wk, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + wb
                h = jnp.maximum(h, 0)
            feats.append(h)
            if stage < 5:
                import flax.linen as nn
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return feats

    def __call__(self, img0, img1) -> float:
        import jax.numpy as jnp

        def prep(im):
            x = jnp.asarray(im, jnp.float32) * 2 - 1  # [-1, 1]
            return (x - _SHIFT) / _SCALE

        f0 = self._features(prep(img0))
        f1 = self._features(prep(img1))
        total = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            diff = (a - b) ** 2
            lin = jnp.asarray(self.weights[f"lin{k}/kernel"]).reshape(1, 1, -1, 1)
            d = (diff[..., None, :] @ lin[..., :, :])[..., 0, 0]
            total = total + d.mean()
        return float(total)
