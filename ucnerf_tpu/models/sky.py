"""Sky model: a vanilla view-dependent NeRF raymarched beyond the far plane.

UC-NeRF renders sky pixels with a separate small NeRF (D=8, W=256, view
positional encoding of degree 4) whose samples lie between the scene far
plane and 1.5x far, composited behind the main model with (1 - acc) opacity
(reference models.py:84-92,326-337,743-904).

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

from ucnerf_tpu.configs import ModelConfig
from ucnerf_tpu.ops import coord
from ucnerf_tpu.models.fields import _dense


class SkyNeRF(nn.Module):
    """Vanilla NeRF MLP (models.py:743-820): positions raw, views posenc'd."""
    net_depth: int = 8
    net_width: int = 256
    deg_view: int = 4
    skips: tuple = (4,)

    @nn.compact
    def __call__(self, pts, viewdirs):
        """pts: [..., 3]; viewdirs: [..., 3] -> (alpha [..., 1], rgb [..., 3])."""
        views = coord.pos_enc(viewdirs, 0, self.deg_view, append_identity=True)
        h = pts
        for i in range(self.net_depth):
            h = _dense(self.net_width, name=f"pts_linears_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pts, h], axis=-1)
        alpha = _dense(1, name="alpha_linear")(h)
        feature = _dense(self.net_width, name="feature_linear")(h)
        h = jnp.concatenate([feature, views], axis=-1)
        h = _dense(self.net_width // 2, name="views_linears_0")(h)
        h = nn.relu(h)
        rgb = _dense(3, name="rgb_linear")(h)
        return alpha, rgb


def render_sky(sky_model, origins, directions, near, far, num_samples,
               viewdirs=None, key=None):
    """One-level raymarch of the sky NeRF (models.py:852-904).

    Args:
      sky_model: a bound SkyNeRF module.
      origins/directions: [N, 3] (directions not normalized, as in the ref).
      near: [N, 1] per-ray start distance (the scene far plane).
      far:  [N, 1] per-ray end distance (sky_far_mult * far plane).
      num_samples: static sample count (reference: 120).
      viewdirs: [N, 3] input to the view branch.  The reference feeds the
        *camera* forward axis here, not the per-ray direction (the ray batch
        is packed [origins, dirs, bounds, cam_dirs] and render_rays takes the
        last 3 channels as viewdirs, models.py:331,866) — per-ray variation
        enters through the sample positions instead.
      key: optional PRNG key for stratified jitter (reference uses perturb=0).

    Returns:
      dict with rgb_map [N, 3], depth_map [N], acc_map [N].
    """
    n = origins.shape[0]
    if viewdirs is None:
        viewdirs = directions
    t_vals = jnp.linspace(0.0, 1.0, num_samples)
    z_vals = near * (1.0 - t_vals) + far * t_vals  # [N, S]
    if key is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        z_vals = lower + (upper - lower) * jax.random.uniform(
            key, z_vals.shape)

    pts = origins[..., None, :] + directions[..., None, :] * z_vals[..., None]
    views = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
    alpha_raw, rgb_raw = sky_model(pts, views)

    # raw2outputs (models.py:822-850): relu density, 1e10 terminal interval.
    dists = jnp.diff(z_vals, axis=-1)
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(directions[..., None, :], axis=-1)
    rgb = nn.sigmoid(rgb_raw)
    alpha = 1.0 - jnp.exp(-nn.relu(alpha_raw[..., 0]) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((n, 1)), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1)[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    return dict(rgb_map=rgb_map, depth_map=depth_map, acc_map=acc_map)
