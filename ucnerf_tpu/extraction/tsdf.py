"""TSDF fusion of rendered depth maps (TPU/JAX).

Functional parity with the reference's TSDF extractor
(``/root/reference/nerf/tsdf.py:31-222``): a voxel grid over the scene is
updated by projecting voxel centers into each rendered depth map, computing a
truncated signed distance along the camera ray, and averaging with per-voxel
weights; the zero level set is meshed afterwards (meshing.py).

The integration is one fused jit per view — voxel coordinates are generated
on device, and the grid can be sharded along z across the mesh like the
reference shards its grid across ranks (tsdf.py:41-43).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


class TSDFGrid(flax.struct.PyTreeNode):
    """Axis-aligned TSDF volume (a pytree: jit-compatible)."""
    resolution: int = flax.struct.field(pytree_node=False)
    radius: float = flax.struct.field(pytree_node=False)
    truncation: float = flax.struct.field(pytree_node=False)
    tsdf: jnp.ndarray  # [R, R, R]
    weight: jnp.ndarray  # [R, R, R]
    color: Optional[jnp.ndarray] = None  # [R, R, R, 3]

    @classmethod
    def create(cls, resolution: int, radius: float, truncation_margin=5.0,
               with_color=True):
        voxel_size = 2 * radius / resolution
        truncation = truncation_margin * voxel_size
        shape = (resolution,) * 3
        return cls(
            resolution=resolution, radius=radius, truncation=truncation,
            tsdf=jnp.ones(shape), weight=jnp.zeros(shape),
            color=jnp.zeros(shape + (3,)) if with_color else None)

    @property
    def voxel_size(self):
        return 2 * self.radius / self.resolution

    def voxel_centers(self):
        """[R, R, R, 3] world coordinates of voxel centers."""
        r = self.resolution
        idx = (jnp.arange(r) + 0.5) * self.voxel_size - self.radius
        x, y, z = jnp.meshgrid(idx, idx, idx, indexing="ij")
        return jnp.stack([x, y, z], axis=-1)


def integrate(grid: TSDFGrid, depth, pose_cv, intrinsic, rgb=None):
    """Fuse one rendered depth map into the grid.

    Args:
      grid: current TSDFGrid.
      depth: [H, W] z-depth (0/inf = invalid).
      pose_cv: [4, 4] camera-to-world in OpenCV convention.
      intrinsic: [3, 3].
      rgb: optional [H, W, 3].

    Returns:
      Updated TSDFGrid.
    """
    h, w = depth.shape
    r = grid.resolution
    centers = grid.voxel_centers().reshape(-1, 3)

    w2c = jnp.linalg.inv(pose_cv)
    cam = centers @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    pix = cam @ intrinsic.T
    px = pix[:, 0] / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    py = pix[:, 1] / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)

    xi = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)
    inb = (px >= 0) & (px < w) & (py >= 0) & (py < h) & (z > 0)
    d = depth[yi, xi]
    valid = inb & (d > 0) & jnp.isfinite(d)

    sdf = d - z
    tsdf_new = jnp.clip(sdf / grid.truncation, -1.0, 1.0)
    upd = valid & (sdf > -grid.truncation)

    w_old = grid.weight.reshape(-1)
    t_old = grid.tsdf.reshape(-1)
    w_new = w_old + upd
    t_fused = jnp.where(
        upd, (t_old * w_old + tsdf_new) / jnp.maximum(w_new, 1.0), t_old)

    out = dataclasses.replace(
        grid, tsdf=t_fused.reshape(r, r, r), weight=w_new.reshape(r, r, r))
    if grid.color is not None and rgb is not None:
        c_old = grid.color.reshape(-1, 3)
        c_obs = rgb[yi, xi]
        c_fused = jnp.where(
            upd[:, None],
            (c_old * w_old[:, None] + c_obs) / jnp.maximum(w_new, 1.0)[:, None],
            c_old)
        out = dataclasses.replace(out, color=c_fused.reshape(r, r, r, 3))
    return out


integrate_jit = jax.jit(integrate)
