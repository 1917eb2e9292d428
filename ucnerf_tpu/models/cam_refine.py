"""In-graph differentiable per-camera extrinsic refinement.

The reference freezes camera poses at data-load time (numpy ray-gen,
``/root/reference/nerf/internal/camera_utils.py:448-608``); under-calibrated
rigs are corrected only by the OFFLINE pose-refinement pipeline.  This module
adds the north-star capability the reference lacks: a per-physical-camera
se(3) delta, applied to rays INSIDE the jitted train step, so residual
miscalibration is optimized jointly with the radiance field by the same Adam
step (SURVEY.md §7.7).

Equivalence to device-side ray regeneration: ``pixels_to_rays`` produces
``origins = c2w[:3, 3]`` and ``directions = R_c2w @ K^{-1} @ pix``
(data/cameras.py:61-76).  Left-composing a rigid delta onto the camera pose,
``c2w' = Exp(xi) @ c2w``, therefore transforms every ray as
``o' = R o + t, d' = R d`` — which is exactly what this module applies.  No
per-sample re-projection is needed; the transform is 1 small matmul per ray,
fully fused by XLA into the ray-preprocessing epilogue.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def so3_exp(w):
    """Rodrigues' formula: rotation vectors [..., 3] -> matrices [..., 3, 3].

    Uses the numerically-stable small-angle forms of sin(t)/t and
    (1-cos(t))/t^2 so gradients are exact at w = 0 (the init point — every
    delta starts at identity, so this matters).
    """
    theta_sq = jnp.sum(w**2, axis=-1)[..., None, None]
    small = theta_sq < 1e-8
    # Safe-where: evaluate the trig branch at theta=1 where small, so the
    # untaken branch never divides by ~0 (f32 1/1e-24 overflows to inf and
    # poisons gradients with inf * 0 = nan).
    safe_sq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(safe_sq)
    # sin(t)/t and (1-cos t)/t^2 with quadratic Taylor fallbacks near 0.
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / safe_sq)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    hat = jnp.stack([
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3), hat.shape)
    return eye + a * hat + b * (hat @ hat)


def se3_apply(deltas, phys_cam_idx, origins, directions, cam_dirs):
    """Apply per-camera rigid deltas [C, 6] (rotvec | translation) to rays.

    Args:
      deltas: [C, 6] se(3) parameters per physical camera.
      phys_cam_idx: [N] int, which physical camera each ray belongs to.
      origins/directions/cam_dirs: [N, 3].

    Returns:
      (origins', directions', cam_dirs') with c2w' = Exp(delta) @ c2w
      semantics: o' = R o + t, d' = R d.
    """
    rot = so3_exp(deltas[:, :3])  # [C, 3, 3]
    trans = deltas[:, 3:]  # [C, 3]
    r = jnp.take(rot, phys_cam_idx, axis=0)  # [N, 3, 3]
    t = jnp.take(trans, phys_cam_idx, axis=0)  # [N, 3]
    apply_r = lambda v: jnp.einsum("nij,nj->ni", r, v)
    return apply_r(origins) + t, apply_r(directions), apply_r(cam_dirs)


class CameraRefinement(nn.Module):
    """Per-physical-camera se(3) delta parameters, identity at init."""

    num_cams: int

    @nn.compact
    def __call__(self, phys_cam_idx, origins, directions, cam_dirs):
        deltas = self.param("se3_deltas", nn.initializers.zeros,
                            (self.num_cams, 6))
        return se3_apply(deltas, phys_cam_idx, origins, directions, cam_dirs)
