"""Sky model: a vanilla view-dependent NeRF raymarched beyond the far plane.

UC-NeRF renders sky pixels with a separate small NeRF (D=8, W=256, view
positional encoding of degree 4) whose samples lie between the scene far
plane and 1.5x far, composited behind the main model with (1 - acc) opacity
(reference models.py:84-92,326-337,743-904).  Channel-major layout throughout
([C, R, S] activations) — see fields.py for why.

Deviation from the reference, documented on purpose: the reference's sky
raymarcher inherits nerf-pytorch's ``z_vals = near*(1-t) + 1/far * t``
(models.py:872), which for near=far_plane produces *decreasing* z values and
negative inter-sample distances.  Here samples run linearly from far to
sky_far_mult*far — the evident intent — which keeps distances positive and
the compositing numerically sane.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ucnerf_tpu.ops import coord
from ucnerf_tpu.models.fields import DenseCM


class SkyNeRF(nn.Module):
    """Vanilla NeRF MLP (models.py:743-820): positions raw, views posenc'd.

    Channel-major: pts [3, ...], views_enc [V, ...] -> (alpha [1, ...],
    rgb [3, ...])."""
    net_depth: int = 8
    net_width: int = 256
    deg_view: int = 4
    skips: tuple = (4,)

    @nn.compact
    def __call__(self, pts, views_enc):
        h = pts
        for i in range(self.net_depth):
            h = DenseCM(self.net_width, name=f"pts_linears_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pts, h], axis=0)
        alpha = DenseCM(1, name="alpha_linear")(h)
        feature = DenseCM(self.net_width, name="feature_linear")(h)
        h = jnp.concatenate([feature, views_enc], axis=0)
        h = DenseCM(self.net_width // 2, name="views_linears_0")(h)
        h = nn.relu(h)
        rgb = DenseCM(3, name="rgb_linear")(h)
        return alpha, rgb


def render_sky(sky_model, origins, directions, near, far, num_samples,
               viewdirs=None, key=None):
    """One-level raymarch of the sky NeRF (models.py:852-904).

    Args:
      sky_model: a bound SkyNeRF module.
      origins/directions: [R, 3] (directions not normalized, as in the ref).
      near: [R, 1] per-ray start distance (the scene far plane).
      far:  [R, 1] per-ray end distance (sky_far_mult * far plane).
      num_samples: static sample count (reference: 120).
      viewdirs: [R, 3] input to the view branch.  The reference feeds the
        *camera* forward axis here, not the per-ray direction (the ray batch
        is packed [origins, dirs, bounds, cam_dirs] and render_rays takes the
        last 3 channels as viewdirs, models.py:331,866) — per-ray variation
        enters through the sample positions instead.
      key: optional PRNG key for stratified jitter (reference uses perturb=0).

    Returns:
      dict with rgb_map [R, 3], depth_map [R], acc_map [R].
    """
    r = origins.shape[0]
    s = num_samples
    if viewdirs is None:
        viewdirs = directions
    t_vals = jnp.linspace(0.0, 1.0, s)
    z_vals = near * (1.0 - t_vals) + far * t_vals  # [R, S]
    if key is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        z_vals = lower + (upper - lower) * jax.random.uniform(
            key, z_vals.shape)

    # pts [3, R, S] channel-major.
    pts = (origins.T[:, :, None] + directions.T[:, :, None] * z_vals[None])
    views_enc = coord.pos_enc(viewdirs, 0, sky_model.deg_view,
                              append_identity=True)  # [R, V]
    views_cm = jnp.broadcast_to(views_enc.T[:, :, None],
                                (views_enc.shape[1], r, s))
    alpha_raw, rgb_raw = sky_model(pts, views_cm)

    # raw2outputs (models.py:822-850): relu density, 1e10 terminal interval.
    dists = jnp.diff(z_vals, axis=-1)
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(directions, axis=-1, keepdims=True)
    rgb = nn.sigmoid(rgb_raw)  # [3, R, S]
    alpha = 1.0 - jnp.exp(-nn.relu(alpha_raw[0]) * dists)  # [R, S]
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((r, 1)), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.einsum("rs,crs->rc", weights, rgb)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    return dict(rgb_map=rgb_map, depth_map=depth_map, acc_map=acc_map)
