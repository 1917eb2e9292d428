import os

import numpy as np
import pytest

from ucnerf_tpu.extraction import meshing, tsdf


def _sphere_sdf(n=32, r=0.6):
    idx = (np.arange(n) + 0.5) / n * 2 - 1
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - r


def test_surface_nets_sphere():
    n, r = 48, 0.6
    sdf = _sphere_sdf(n, r)
    verts, faces = meshing.surface_nets(sdf, origin=(-1 + 1 / n,) * 3,
                                        voxel_size=2 / n)
    assert len(verts) > 500 and len(faces) > 500
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii.mean(), r, atol=0.02)
    assert radii.std() < 0.02
    # Faces index valid vertices.
    assert faces.min() >= 0 and faces.max() < len(verts)
    # Mesh area close to sphere area 4 pi r^2.
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * r**2, rtol=0.1)


def test_surface_nets_empty():
    sdf = np.ones((8, 8, 8))
    verts, faces = meshing.surface_nets(sdf)
    assert len(verts) == 0 and len(faces) == 0


def test_write_ply_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    path = tmp_path / "tri.ply"
    meshing.write_ply(path, verts, faces, colors)
    data = open(path, "rb").read()
    assert b"element vertex 3" in data
    assert b"element face 1" in data
    assert b"end_header" in data


def test_tsdf_integration_sphere():
    """Integrate synthetic depth maps of a sphere; the fused zero level set
    should reconstruct the sphere surface."""
    import jax.numpy as jnp

    n_views = 8
    h, w, f = 48, 64, 60.0
    k = jnp.asarray([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]])
    grid = tsdf.TSDFGrid.create(resolution=48, radius=1.0,
                                truncation_margin=3.0, with_color=False)
    r_sph = 0.5
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        # OpenCV camera at radius 2 looking at the origin.
        pos = np.array([2 * np.sin(ang), 0.0, 2 * np.cos(ang)])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, pos
        # Render an analytic depth map of the sphere.
        y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        dirs_cam = np.stack([(x + 0.5 - w / 2) / f, (y + 0.5 - h / 2) / f,
                             np.ones_like(x, np.float64)], -1)
        dirs = dirs_cam @ c2w[:3, :3].T
        dn = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        b = 2 * (dn @ pos)
        cc = pos @ pos - r_sph**2
        disc = b**2 - 4 * cc
        t_hit = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2,
                         0.0)
        z_depth = t_hit * (dn @ fwd)
        depth = np.where(t_hit > 0, z_depth, 0.0)
        grid = tsdf.integrate(grid, jnp.asarray(depth), jnp.asarray(c2w), k)

    verts, faces, _ = meshing.mesh_from_tsdf(grid, min_weight=1.0)
    assert len(verts) > 200
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(np.median(radii), r_sph, atol=0.06)
