"""Descriptor matching: mutual-nearest-neighbor with ratio test (TPU/JAX).

Functional parity with the reference's matchers
(``/root/reference/pose_refinement/stpr/scripts/mvs/matchers.py:37-56``):
cosine-similarity nearest neighbors, descriptor distance sqrt(2 - 2 sim),
Lowe ratio test in both directions, and mutual-NN consistency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mutual_nn_ratio_match(desc1, desc2, ratio=0.8):
    """Match unit-norm descriptors [N1, D] x [N2, D] -> [M, 2] index pairs."""
    d1 = jnp.asarray(desc1)
    d2 = jnp.asarray(desc2)
    sim = d1 @ d2.T

    def nn_ratio(s):
        top2, nns = jax.lax.top_k(s, 2)
        dist = jnp.sqrt(jnp.maximum(2 - 2 * top2, 0.0))
        ratios = dist[:, 0] / (dist[:, 1] + 1e-8)
        return nns[:, 0], ratios

    nn12, ratios12 = nn_ratio(sim)
    nn21, ratios21 = nn_ratio(sim.T)
    ids1 = jnp.arange(sim.shape[0])
    mask = ((ids1 == nn21[nn12])
            & (ratios12 <= ratio)
            & (ratios21[nn12] <= ratio))
    m = np.asarray(mask)
    return np.stack([np.asarray(ids1)[m], np.asarray(nn12)[m]], axis=-1)


def epipolar_filter(kps1, kps2, matches, k1, k2, pose1_w2c, pose2_w2c,
                    threshold=4.0):
    """Keep matches consistent with the known relative geometry.

    Replaces the reference's F/H RANSAC verification
    (prepare_all_data_for_mvs.py:195-218) with a direct epipolar check —
    initial poses exist in this pipeline, so no hypothesis sampling is
    needed.  threshold is in pixels (symmetric epipolar distance).
    """
    if len(matches) == 0:
        return matches
    rel = pose2_w2c @ np.linalg.inv(pose1_w2c)
    r, t = rel[:3, :3], rel[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    e = tx @ r
    f = np.linalg.inv(k2).T @ e @ np.linalg.inv(k1)

    p1 = np.concatenate([kps1[matches[:, 0]], np.ones((len(matches), 1))], 1)
    p2 = np.concatenate([kps2[matches[:, 1]], np.ones((len(matches), 1))], 1)
    fp1 = p1 @ f.T
    ftp2 = p2 @ f
    d = np.abs(np.sum(p2 * fp1, axis=1))
    denom = np.sqrt(fp1[:, 0] ** 2 + fp1[:, 1] ** 2 + 1e-12) + np.sqrt(
        ftp2[:, 0] ** 2 + ftp2[:, 1] ** 2 + 1e-12)
    sym_dist = 2 * d / denom
    return matches[sym_dist < threshold]


class UnionFind:
    """Track builder: merges matched keypoints into 3D point tracks."""

    def __init__(self):
        self.parent = {}

    def find(self, a):
        while self.parent.setdefault(a, a) != a:
            self.parent[a] = self.parent[self.parent[a]]
            a = self.parent[a]
        return a

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(all_matches, min_track_len=2):
    """Merge pairwise matches into tracks.

    Args:
      all_matches: dict {(img_i, img_j): [M, 2] keypoint index pairs}.

    Returns:
      list of tracks, each a list of (img_idx, kp_idx); tracks with
      conflicting observations (two kps of one image) are dropped.
    """
    uf = UnionFind()
    for (i, j), m in all_matches.items():
        for a, b in np.asarray(m):
            uf.union((i, int(a)), (j, int(b)))
    groups = {}
    for node in list(uf.parent):
        groups.setdefault(uf.find(node), []).append(node)
    tracks = []
    for members in groups.values():
        if len(members) < min_track_len:
            continue
        imgs = [m[0] for m in members]
        if len(set(imgs)) != len(imgs):
            continue  # conflicting track
        tracks.append(sorted(members))
    return tracks
