"""CER-MVS feature encoder (TPU/JAX, NHWC).

Functional parity with the reference's ``BasicEncoder``
(``/root/reference/mvs/core/extractor.py:62-150``): a 7x7 stride-2 stem, two
residual stages (instance-norm or no-norm variants), optional third stage for
the 1/8-res "LR" mode, and a 1x1 projection head.  NHWC layout feeds the MXU
convolutions natively on TPU.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_out",
                                                  "truncated_normal")


class InstanceNorm(nn.Module):
    """InstanceNorm2d (affine=False, matching torch defaults): normalize over
    H, W per channel per sample."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [N, H, W, C]
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps)


def _norm(norm_fn: str):
    if norm_fn == "instance":
        return InstanceNorm()
    if norm_fn == "none":
        return lambda x: x
    raise NotImplementedError(norm_fn)


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=k // 2, name=name,
            kernel_init=kaiming_normal)
        y = conv(self.planes, 3, self.stride, "conv1")(x)
        y = _norm(self.norm_fn)(y)
        y = nn.relu(y)
        y = conv(self.planes, 3, 1, "conv2")(y)
        y = _norm(self.norm_fn)(y)
        y = nn.relu(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = conv(self.planes, 1, self.stride, "downsample")(x)
            x = _norm(self.norm_fn)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Image -> 1/4-res ("HR") or 1/8-res ("LR") feature map."""
    output_dim: int = 64
    norm_fn: str = "instance"
    encoder_type: str = "HR"
    base_dim: int = 32

    @nn.compact
    def __call__(self, x):  # [N, H, W, 3] in [-1, 1]
        d = self.base_dim
        x = nn.Conv(d, (7, 7), strides=(2, 2), padding=3, name="conv1",
                    kernel_init=kaiming_normal)(x)
        x = _norm(self.norm_fn)(x)
        x = nn.relu(x)
        x = ResidualBlock(d, self.norm_fn, 1, name="layer1_0")(x)
        x = ResidualBlock(d, self.norm_fn, 1, name="layer1_1")(x)
        x = ResidualBlock(2 * d, self.norm_fn, 2, name="layer2_0")(x)
        x = ResidualBlock(2 * d, self.norm_fn, 1, name="layer2_1")(x)
        if self.encoder_type == "LR":
            x = ResidualBlock(4 * d, self.norm_fn, 2, name="layer3_0")(x)
            x = ResidualBlock(4 * d, self.norm_fn, 1, name="layer3_1")(x)
        x = nn.Conv(self.output_dim, (1, 1), name="conv2",
                    kernel_init=kaiming_normal)(x)
        return x
