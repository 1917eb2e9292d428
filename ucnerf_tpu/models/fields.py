"""Field MLPs: hash-grid density + view-dependent color (TPU/JAX/flax).

The Zip-NeRF field of the reference (``/root/reference/nerf/internal/models.py``
``MLP``, models.py:367-685), re-designed for TPU:

- Hash-grid features are gathered per hex multisample, downweighted by the
  erf anti-aliasing factor, and averaged over the 6 multisamples BEFORE the
  MLP (models.py:494-496) — so the MXU matmuls run once per (ray, sample).
- Dense layers use torch-Linear-equivalent fan-in uniform init so training
  dynamics track the reference.
- The scale-featurization path (models.py:497-506) appends per-level erf
  means scaled by the table's RMS.

All shapes are static; the module is fully jit/pjit-compatible.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.configs import MLPConfig
from ucnerf_tpu.ops import coord, hashgrid

# torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
torch_linear_init = nn.initializers.variance_scaling(
    1 / 3, "fan_in", "uniform")
# torch kaiming_uniform_(a=0): U(-sqrt(6/fan_in), sqrt(6/fan_in)), used for
# the viewdir layers (models.py:478).
kaiming_uniform_init = nn.initializers.variance_scaling(
    2.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch.nn.Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / np.sqrt(fan_in)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _dense(features, name=None, kernel_init=torch_linear_init,
           bias_init=nn.initializers.zeros):
    return nn.Dense(features, name=name, kernel_init=kernel_init,
                    bias_init=bias_init)


class ZipMLP(nn.Module):
    """Density + color field over hash-grid features.

    Call signature follows the reference MLP.forward (models.py:514-685),
    with explicit PRNG keys instead of global RNG state.
    """
    config: MLPConfig

    def setup(self):
        cfg = self.config
        self.grid_spec = hashgrid.HashGridSpec(
            input_dim=3,
            num_levels=cfg.grid_num_levels,
            level_dim=cfg.grid_level_dim,
            base_resolution=cfg.grid_base_resolution,
            desired_resolution=cfg.grid_desired_resolution,
            log2_hashmap_size=cfg.grid_log2_hashmap_size,
            init_std=cfg.grid_init_std,
        )
        self.table = self.param(
            "table",
            lambda key: hashgrid.init_table(key, self.grid_spec))
        self.density_hidden = _dense(64, name="density_hidden")
        out_width = 1 if cfg.disable_rgb else cfg.bottleneck_width
        self.density_out = _dense(out_width, name="density_out")

        if cfg.enable_pred_normals:
            self.normal_layer = _dense(3, name="normal_layer")

        if not cfg.disable_rgb:
            if cfg.num_glo_features > 0:
                glo_layers = []
                for i in range(cfg.net_depth_glo - 1):
                    glo_layers.append(_dense(cfg.net_width_glo,
                                             name=f"lin_glo_{i}"))
                glo_layers.append(_dense(cfg.bottleneck_width * 2,
                                         name=f"lin_glo_{cfg.net_depth_glo - 1}"))
                self.glo_layers = glo_layers
            view_layers = []
            for i in range(cfg.net_depth_viewdirs):
                view_layers.append(
                    _dense(cfg.net_width_viewdirs,
                           name=f"lin_second_stage_{i}",
                           kernel_init=kaiming_uniform_init))
            self.view_layers = view_layers
            self.rgb_layer = _dense(cfg.num_rgb_channels, name="rgb_layer")

    @property
    def grid_sizes(self):
        """Per-level table resolutions, as float, for the erf weighting."""
        return jnp.asarray(self.grid_spec.resolutions, jnp.float32)

    def encode_features(self, means, stds):
        """Warp, hash-encode, erf-downweight and average the multisamples.

        Args:
          means: [..., S, 3] multisample means (S = 6 hex points).
          stds:  [..., S] multisample stds.

        Returns:
          features [..., L*C (+L)], means_contract [..., 3].
        """
        cfg = self.config
        if cfg.warp_fn is not None:
            means, stds = coord.track_linearize(cfg.warp_fn, means, stds)
            # contract() maps into the radius-2 ball; normalize to [-1, 1].
            bound = 2.0
            means = means / bound
            stds = stds / bound
        feats = hashgrid.encode(means, self.table, self.grid_spec)
        # erf anti-aliasing weight per (multisample, level): features whose
        # grid cell is much smaller than the sample std are suppressed
        # (models.py:495, uses exact erf).
        weights = jax.lax.erf(
            1.0 / jnp.sqrt(8.0 * stds[..., None] ** 2 * self.grid_sizes**2))
        feats = (feats * weights[..., None]).mean(axis=-3)  # avg multisamples
        feats = feats.reshape(feats.shape[:-2] + (-1,))
        if cfg.scale_featurization:
            # [L] per-level mean squared table norm, treated as a constant.
            vl2mean = jax.lax.stop_gradient(
                hashgrid.level_sq_means(self.table, self.grid_spec))
            featurized_w = ((2 * weights.mean(axis=-2) - 1) *
                            jnp.sqrt(cfg.grid_init_std**2 + vl2mean))
            feats = jnp.concatenate([feats, featurized_w], axis=-1)
        return feats, means.mean(axis=-2)

    def predict_density(self, means, stds, key=None):
        """Features -> raw density (+ bottleneck) (models.py:485-512)."""
        cfg = self.config
        feats, means_contract = self.encode_features(means, stds)
        x = self.density_hidden(feats)
        x = nn.relu(x)
        x = self.density_out(x)
        raw_density = x[..., 0]
        if key is not None and cfg.density_noise > 0:
            raw_density += cfg.density_noise * jax.random.normal(
                key, raw_density.shape)
        return raw_density, x, means_contract

    def __call__(self, key, means, stds, viewdirs=None, glo_vec=None):
        """Evaluate the field.

        Args:
          key: PRNG key for noise injection, or None (deterministic).
          means: [..., S, 3] multisample Gaussian means.
          stds: [..., S] multisample Gaussian stds.
          viewdirs: [N, 3] per-ray view directions (broadcast over samples).
          glo_vec: optional [N, num_glo_features].

        Returns:
          dict with density [...], rgb [..., 3], coord, normals (opt).
        """
        cfg = self.config
        keys = {} if key is None else dict(zip(
            ("density", "bottleneck"), jax.random.split(key, 2)))

        if cfg.disable_density_normals:
            raw_density, x, means_contract = self.predict_density(
                means, stds, keys.get("density"))
            normals = None
        else:
            # Normals from the density gradient w.r.t. the (contracted) mean
            # positions, via forward-mode in 3 passes.  The reference
            # differentiates w.r.t. pre-contraction means with the
            # contraction itself under no_grad (models.py:551-567).
            def density_fn(m):
                return self.predict_density(m, stds, keys.get("density"))[0]
            raw_density, x, means_contract = self.predict_density(
                means, stds, keys.get("density"))
            grad = jax.grad(lambda m: density_fn(m).sum())(means)
            grad = grad.mean(axis=-2)
            normals = -_l2_normalize(grad)

        if cfg.enable_pred_normals:
            grad_pred = self.normal_layer(x)
            normals_pred = -_l2_normalize(grad_pred)
            normals_to_use = normals_pred
        else:
            grad_pred = None
            normals_pred = None
            normals_to_use = normals

        density = jax.nn.softplus(raw_density + cfg.density_bias)

        if cfg.disable_rgb:
            rgb = jnp.zeros(density.shape + (3,), density.dtype)
        else:
            bottleneck = x
            if "bottleneck" in keys and cfg.bottleneck_noise > 0:
                bottleneck += cfg.bottleneck_noise * jax.random.normal(
                    keys["bottleneck"], bottleneck.shape)
            if glo_vec is not None and cfg.num_glo_features > 0:
                g = glo_vec
                for i, layer in enumerate(self.glo_layers):
                    g = layer(g)
                    if i != len(self.glo_layers) - 1:
                        g = nn.relu(g)
                g = jnp.broadcast_to(g[..., None, :],
                                     bottleneck.shape[:-1] + g.shape[-1:])
                scale, shift = jnp.split(g, 2, axis=-1)
                bottleneck = bottleneck * jnp.exp(scale) + shift
            parts = [bottleneck]
            dir_enc = coord.pos_enc(viewdirs, min_deg=0, max_deg=cfg.deg_view,
                                    append_identity=True)
            dir_enc = jnp.broadcast_to(
                dir_enc[..., None, :],
                bottleneck.shape[:-1] + (dir_enc.shape[-1],))
            parts.append(dir_enc)
            h = jnp.concatenate(parts, axis=-1)
            inputs = h
            for i, layer in enumerate(self.view_layers):
                h = layer(h)
                h = nn.relu(h)
                if i == cfg.skip_layer_dir:
                    h = jnp.concatenate([h, inputs], axis=-1)
            rgb = nn.sigmoid(cfg.rgb_premultiplier * self.rgb_layer(h)
                             + cfg.rgb_bias)
            rgb = rgb * (1 + 2 * cfg.rgb_padding) - cfg.rgb_padding

        return dict(
            coord=means_contract,
            density=density,
            rgb=rgb,
            grad_pred=grad_pred,
            normals=normals,
            normals_pred=normals_pred,
        )


def _l2_normalize(x, eps=1e-12):
    return x / jnp.sqrt(
        jnp.maximum(jnp.sum(x**2, axis=-1, keepdims=True), eps))
