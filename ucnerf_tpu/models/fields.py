"""Field MLPs: hash-grid density + view-dependent color (TPU/JAX/flax).

The Zip-NeRF field of the reference (``/root/reference/nerf/internal/models.py``
``MLP``, models.py:367-685), re-designed for TPU with a **channel-major**
internal layout: every large activation is [features, N] with the huge point
axis minormost (the TPU lane dimension).  A reference-shaped [N, 6, L, C]
pipeline lane-pads its small trailing dims up to 128 and blows HBM by 20-40x
at training sizes; channel-major tiles cleanly and feeds the MXU directly
([out, in] x [in, N] matmuls with N on the lanes).

- Hash-grid features are gathered per hex multisample with the erf
  anti-aliasing weight and the 6-point average folded into the encoder
  (models.py:494-496), so the MLP runs once per (ray, sample).
- Dense layers store torch-Linear-layout [in, out] kernels with
  fan-in-uniform init so training dynamics track the reference.
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


class DenseCM(nn.Module):
    """Dense layer over channel-major activations: [in, N] -> [out, N].

    Stores the kernel as [in, out] (identical pytree to nn.Dense) and
    contracts the leading axis, keeping N on the TPU lanes.  With
    compute_dtype=bfloat16 the matmul runs on the MXU's bf16 path with f32
    accumulation (params stay f32)."""
    features: int
    kernel_init: any = torch_linear_init
    bias_init: any = nn.initializers.zeros
    compute_dtype: any = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[0], self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        if self.compute_dtype is not None:
            kernel = kernel.astype(self.compute_dtype)
            x = x.astype(self.compute_dtype)
        y = jnp.einsum("io,i...->o...", kernel, x,
                       preferred_element_type=jnp.float32)
        return y + bias.reshape((self.features,) + (1,) * (y.ndim - 1))


class ZipMLP(nn.Module):
    """Density + color field over hash-grid features (channel-major).

    Call signature follows the reference MLP.forward (models.py:514-685),
    with explicit PRNG keys and channel-major tensors.
    """
    config: MLPConfig

    def setup(self):
        cfg = self.config
        self._cdtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                        else None)
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
        self.density_hidden = DenseCM(64, name="density_hidden",
                              compute_dtype=self._cdtype)
        out_width = 1 if cfg.disable_rgb else cfg.bottleneck_width
        self.density_out = DenseCM(out_width, name="density_out",
                           compute_dtype=self._cdtype)

        if cfg.enable_pred_normals:
            self.normal_layer = DenseCM(3, name="normal_layer")

        if not cfg.disable_rgb:
            if cfg.num_glo_features > 0:
                glo_layers = []
                for i in range(cfg.net_depth_glo - 1):
                    glo_layers.append(DenseCM(cfg.net_width_glo,
                                              name=f"lin_glo_{i}"))
                glo_layers.append(
                    DenseCM(cfg.bottleneck_width * 2,
                            name=f"lin_glo_{cfg.net_depth_glo - 1}"))
                self.glo_layers = glo_layers
            view_layers = []
            for i in range(cfg.net_depth_viewdirs):
                view_layers.append(
                    DenseCM(cfg.net_width_viewdirs,
                            name=f"lin_second_stage_{i}",
                            kernel_init=kaiming_uniform_init,
                            compute_dtype=self._cdtype))
            self.view_layers = view_layers
            self.rgb_layer = DenseCM(cfg.num_rgb_channels, name="rgb_layer",
                         compute_dtype=self._cdtype)

    def encode_features(self, means, stds):
        """Warp, hash-encode, erf-downweight, hex-average (channel-major).

        Args:
          means: [3, 6, R, S] multisample means (6 hex points).
          stds:  [6, R, S] multisample stds.

        Returns:
          features [F, M] (M = R*S), means_contract [3, R, S].
        """
        cfg = self.config
        _, _, r, s = means.shape
        m = r * s
        if cfg.warp_fn is not None:
            means, stds = coord.track_linearize_cm(
                cfg.warp_fn, means, stds,
                stop_grads=not cfg.contract_grads)
            bound = 2.0  # contract() maps into the radius-2 ball.
            means = means / bound
            stds = stds / bound
        x01 = (means.reshape(3, 6, m) + 1.0) / 2.0
        if cfg.hex_single_query:
            x01 = x01.mean(axis=1, keepdims=True)  # [3, 1, M]
        feats, wmeans = hashgrid.encode_hex_cm(
            x01, stds.reshape(6, m), self.table, self.grid_spec,
            gather_dtype=jnp.bfloat16 if cfg.grid_bf16_gather else None,
            bwd_dense_sample=cfg.grid_bwd_dense_sample,
            bwd_value_dtype=cfg.grid_bwd_value_dtype)
        if cfg.scale_featurization:
            vl2mean = jax.lax.stop_gradient(
                hashgrid.level_sq_means(self.table, self.grid_spec))
            featurized_w = ((2 * wmeans - 1)
                            * jnp.sqrt(cfg.grid_init_std**2
                                       + vl2mean)[:, None])
            feats = jnp.concatenate([feats, featurized_w], axis=0)
        return feats, means.mean(axis=1)

    def predict_density(self, means, stds, key=None):
        """Features -> raw density (+ bottleneck) (models.py:485-512).

        Returns raw_density [R, S], bottleneck x [W, M], means_contract."""
        cfg = self.config
        _, _, r, s = means.shape
        feats, means_contract = self.encode_features(means, stds)
        x = self.density_hidden(feats)
        x = nn.relu(x)
        x = self.density_out(x)
        raw_density = x[0].reshape(r, s)
        if key is not None and cfg.density_noise > 0:
            raw_density += cfg.density_noise * jax.random.normal(
                key, raw_density.shape)
        return raw_density, x, means_contract

    def __call__(self, key, means, stds, viewdirs=None, glo_vec=None):
        """Evaluate the field.

        Args:
          key: PRNG key for noise injection, or None (deterministic).
          means: [3, 6, R, S] multisample Gaussian means (channel-major).
          stds: [6, R, S] multisample Gaussian stds.
          viewdirs: [R, 3] per-ray view directions (broadcast over samples).
          glo_vec: optional [R, num_glo_features].

        Returns:
          dict with density [R, S], rgb [3, R, S], coord [3, R, S],
          normals/normals_pred [3, R, S] or None.
        """
        cfg = self.config
        _, _, r, s = means.shape
        m = r * s
        keys = {} if key is None else dict(zip(
            ("density", "bottleneck"), jax.random.split(key, 2)))

        if cfg.disable_density_normals:
            raw_density, x, means_contract = self.predict_density(
                means, stds, keys.get("density"))
            normals = None
        else:
            # Normals = -normalize(d raw_density / d means), averaged over
            # the hex points.  The reference differentiates w.r.t.
            # pre-contraction means with the contraction under no_grad
            # (models.py:551-567); grad w.r.t. `means` here matches because
            # track_linearize stops gradients inside.  (With the
            # contract_grads deviation on, this grad additionally includes
            # the contraction Jacobian — world-space rather than
            # contracted-space normals.)
            def density_sum(mn):
                return self.predict_density(mn, stds,
                                            keys.get("density"))[0].sum()
            raw_density, x, means_contract = self.predict_density(
                means, stds, keys.get("density"))
            grad = jax.grad(density_sum)(means)  # [3, 6, R, S]
            grad = grad.mean(axis=1)  # [3, R, S]
            normals = -_l2_normalize_cm(grad)

        if cfg.enable_pred_normals:
            grad_pred = self.normal_layer(x).reshape(3, r, s)
            normals_pred = -_l2_normalize_cm(grad_pred)
        else:
            grad_pred = None
            normals_pred = None

        density = jax.nn.softplus(raw_density + cfg.density_bias)

        if cfg.disable_rgb:
            rgb = jnp.zeros((3, r, s), density.dtype)
        else:
            bottleneck = x  # [W, M]
            if "bottleneck" in keys and cfg.bottleneck_noise > 0:
                bottleneck += cfg.bottleneck_noise * jax.random.normal(
                    keys["bottleneck"], bottleneck.shape)
            if glo_vec is not None and cfg.num_glo_features > 0:
                g = glo_vec.T  # [G, R]
                for i, layer in enumerate(self.glo_layers):
                    g = layer(g)
                    if i != len(self.glo_layers) - 1:
                        g = nn.relu(g)
                scale, shift = jnp.split(g, 2, axis=0)  # [W, R] each
                b3 = bottleneck.reshape(-1, r, s)
                b3 = b3 * jnp.exp(scale)[:, :, None] + shift[:, :, None]
                bottleneck = b3.reshape(-1, m)
            # View direction encoding, per ray then broadcast over samples.
            dir_enc = coord.pos_enc(viewdirs, min_deg=0, max_deg=cfg.deg_view,
                                    append_identity=True)  # [R, D]
            dir_enc_cm = jnp.broadcast_to(
                dir_enc.T[:, :, None], (dir_enc.shape[1], r, s)
            ).reshape(-1, m)
            h = jnp.concatenate([bottleneck, dir_enc_cm], axis=0)
            inputs = h
            for i, layer in enumerate(self.view_layers):
                h = layer(h)
                h = nn.relu(h)
                if i == cfg.skip_layer_dir:
                    h = jnp.concatenate([h, inputs], axis=0)
            rgb = nn.sigmoid(cfg.rgb_premultiplier * self.rgb_layer(h)
                             + cfg.rgb_bias)
            rgb = rgb * (1 + 2 * cfg.rgb_padding) - cfg.rgb_padding
            rgb = rgb.reshape(3, r, s)

        return dict(
            coord=means_contract,
            density=density,
            rgb=rgb,
            grad_pred=grad_pred,
            normals=normals,
            normals_pred=normals_pred,
        )


def _l2_normalize_cm(x, eps=1e-12):
    """Normalize over the leading (channel) axis."""
    return x / jnp.sqrt(
        jnp.maximum(jnp.sum(x**2, axis=0, keepdims=True), eps))
