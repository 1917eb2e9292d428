"""Visualization suite (utils/vis.py): colormaps, panels, ray histograms."""

import numpy as np

from ucnerf_tpu.utils import vis


def test_visualize_cmap_range(rng):
    depth = rng.uniform(1, 10, (16, 24)).astype(np.float32)
    acc = rng.uniform(0, 1, (16, 24)).astype(np.float32)
    img = vis.visualize_cmap(depth, acc)
    assert img.shape == (16, 24, 3)
    assert img.min() >= 0 and img.max() <= 1


def test_visualize_suite_keys(rng):
    rendering = {
        "rgb": rng.uniform(0, 1, (8, 12, 3)).astype(np.float32),
        "acc": rng.uniform(0, 1, (8, 12)).astype(np.float32),
        "depth": rng.uniform(1, 5, (8, 12)).astype(np.float32),
        "distance_median": rng.uniform(1, 5, (8, 12)).astype(np.float32),
        "normals": rng.normal(0, 1, (8, 12, 3)).astype(np.float32),
    }
    panels = vis.visualize_suite(rendering)
    assert {"color", "depth", "depth_matted", "depth_median", "acc",
            "normals"} <= set(panels)


def _fake_history(rng, n=6):
    history = []
    for ns in (16, 8):  # two levels, prop + nerf
        deltas = rng.uniform(0.01, 0.1, (n, ns)).astype(np.float32)
        sdist = np.concatenate([np.zeros((n, 1), np.float32),
                                np.cumsum(deltas, -1)], -1)
        sdist /= sdist.max()
        weights = rng.dirichlet(np.ones(ns), n).astype(np.float32)
        rgb = rng.uniform(0, 1, (3, n, ns)).astype(np.float32)
        history.append({"sdist": sdist, "weights": weights, "rgb": rgb})
    return history


def test_visualize_rays_shapes(rng):
    history = _fake_history(rng)
    dist = [h["sdist"] for h in history]
    weights = [h["weights"] for h in history]
    rgbs = [np.moveaxis(h["rgb"], 0, -1) for h in history]
    img, alpha = vis.visualize_rays(dist, (0.0, 1.0), weights, rgbs,
                                    resolution=64)
    n_rays, n_levels = dist[0].shape[0], len(dist)
    # Per ray: one row per level + separator, minus the trailing separator.
    assert img.shape == (n_rays * (n_levels + 1) - 1, 64, 3)
    assert alpha.shape == img.shape[:2]
    assert np.isfinite(img).all()
    assert img.min() >= 0 and img.max() <= 1 + 1e-6


def test_visualize_ray_histograms_panels(rng):
    history = _fake_history(rng)
    panels = vis.visualize_ray_histograms(history, num_rays=4, repeat=2)
    assert set(panels) == {"ray_colors", "ray_weights"}
    for img in panels.values():
        assert img.ndim == 3 and img.shape[-1] == 3
        assert np.isfinite(img).all()
    # Empty bins in the weights panel use the red null color.
    rw = panels["ray_weights"]
    reds = (rw[..., 0] == 1.0) & (rw[..., 1] == 0.0) & (rw[..., 2] == 0.0)
    assert reds.any()
