"""Layer-based color (brightness) correction — the core UC-NeRF contribution.

Each training view owns a small latent code; a shared 3-layer MLP decodes it
into a 3x4 affine color transform applied to the rendered RGB, with a second
latent set for the sky layer (reference
``/root/reference/nerf/internal/extrinsic_optimizer.py:4-48``; application at
models.py:339-363; identity regularizer at train_utils.py:159-169).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ucnerf_tpu.models.fields import _dense


def _identity_affine_bias(key, shape, dtype=jnp.float32):
    """Row-major 3x4 identity affine [I | 0] as the output-layer bias, so the
    correction starts as a no-op.  (The reference starts from torch's random
    small bias — extrinsic_optimizer.py:39 — which renders near-black until
    the identity loss pulls it in; identity init skips that transient.)"""
    del key
    return jnp.asarray(
        [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], dtype).reshape(shape)


class BrightnessMLP(nn.Module):
    """Latent [*, n_dim] -> affine params [*, 12] (extrinsic_optimizer.py:27-48)."""
    net_depth: int = 3
    net_width: int = 256

    @nn.compact
    def __call__(self, x):
        from ucnerf_tpu.models.fields import torch_bias_init
        fan_in = x.shape[-1]
        for i in range(self.net_depth):
            # torch-style random biases keep the shared MLP's activations
            # nonzero for the all-zero latents at init, so gradients reach
            # the per-view codes once the output kernel moves off zero.
            x = _dense(self.net_width, name=f"pts_linears_{i}",
                       bias_init=torch_bias_init(fan_in))(x)
            x = nn.relu(x)
            fan_in = self.net_width
        return nn.Dense(12, name="output_linear",
                        kernel_init=nn.initializers.zeros,
                        bias_init=_identity_affine_bias)(x)


class BrightnessCorrection(nn.Module):
    """Per-view latent -> 3x4 affine color transform (+ sky variant)."""
    n_views: int
    model_sky: bool = False
    n_dim: int = 4
    net_depth: int = 3
    net_width: int = 256

    def setup(self):
        self.latent_code = self.param(
            "latent_code", nn.initializers.zeros, (self.n_views, self.n_dim))
        if self.model_sky:
            self.sky_latent_code = self.param(
                "sky_latent_code", nn.initializers.zeros, (self.n_views, 4))
        self.brightness_mlp = BrightnessMLP(net_depth=self.net_depth,
                                            net_width=self.net_width)

    def __call__(self, indices):
        """indices: [N] int per-ray training-view ids -> [N, 3, 4] affines."""
        indices = indices.astype(jnp.int32)
        # mode="clip": jnp.take defaults to fill-with-NaN for out-of-range
        # indices on every backend; clip restores the reference's clamping
        # semantics.  cli/train.py validates training_views >= train views,
        # so clamping only ever fires for deliberate eval_camidx remaps.
        latent = jnp.take(self.latent_code, indices, axis=0, mode="clip")
        affine = self.brightness_mlp(latent).reshape(indices.shape[0], 3, 4)
        if self.model_sky:
            sky_latent = jnp.take(self.sky_latent_code, indices, axis=0,
                                  mode="clip")
            affine_sky = self.brightness_mlp(sky_latent).reshape(
                indices.shape[0], 3, 4)
            return affine, affine_sky
        return affine, None


def apply_affine(affine, rgb):
    """rgb' = A[:, :3] @ rgb + A[:, 3]; affine [N, 3, 4], rgb [N, 3]."""
    return jnp.einsum("nij,nj->ni", affine[:, :, :3], rgb) + affine[:, :, 3]
