"""The channel-major TPU hot path must agree with the reference-shaped ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.ops import coord, hashgrid, rendering


def _rays(r=4, s=8, seed=0):
    rng = np.random.default_rng(seed)
    tdist = np.sort(rng.uniform(0.1, 4.0, (r, s + 1)), axis=-1).astype(
        np.float32)
    origins = rng.normal(size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    radii = rng.uniform(0.005, 0.02, (r, 1)).astype(np.float32)
    return (jnp.asarray(tdist), jnp.asarray(origins), jnp.asarray(d),
            jnp.asarray(radii))


def test_cast_rays_cm_matches_reference_layout():
    tdist, origins, dirs, radii = _rays()
    means, stds, ts = rendering.cast_rays(None, tdist, origins, dirs, dirs,
                                          radii)
    means_cm, stds_cm, ts_cm = rendering.cast_rays_cm(
        None, tdist, origins, dirs, dirs, radii)
    # [R, S, 6, 3] -> [3, 6, R, S]
    np.testing.assert_allclose(np.asarray(means_cm),
                               np.moveaxis(np.asarray(means), (2, 3), (1, 0)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(stds_cm),
                               np.moveaxis(np.asarray(stds), 2, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts_cm),
                               np.moveaxis(np.asarray(ts), 2, 0), atol=1e-6)


def test_cast_rays_cm_matches_reference_layout_random_key():
    tdist, origins, dirs, radii = _rays(seed=3)
    key = jax.random.PRNGKey(7)
    means, stds, ts = rendering.cast_rays(key, tdist, origins, dirs, dirs,
                                          radii)
    means_cm, stds_cm, ts_cm = rendering.cast_rays_cm(
        key, tdist, origins, dirs, dirs, radii)
    np.testing.assert_allclose(np.asarray(means_cm),
                               np.moveaxis(np.asarray(means), (2, 3), (1, 0)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts_cm),
                               np.moveaxis(np.asarray(ts), 2, 0), atol=1e-5)


def test_contract_cm_matches():
    rng = np.random.default_rng(1)
    x = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    std = rng.uniform(0.01, 1.0, 64).astype(np.float32)
    z_ref, s_ref = coord.contract_mean_std(jnp.asarray(x), jnp.asarray(std))
    z_cm, s_cm = coord.contract_mean_std_cm(jnp.asarray(x.T),
                                            jnp.asarray(std))
    np.testing.assert_allclose(np.asarray(z_cm), np.asarray(z_ref).T,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_cm), np.asarray(s_ref), atol=1e-5)


def test_encode_hex_cm_matches_composition(rng):
    """encode_hex_cm == encode() + erf weighting + hex mean."""
    spec = hashgrid.HashGridSpec(num_levels=4, level_dim=4,
                                 base_resolution=4, desired_resolution=64,
                                 log2_hashmap_size=8)
    table = hashgrid.init_table(jax.random.PRNGKey(0), spec)
    m = 32
    x = rng.uniform(-1, 1, (6, m, 3)).astype(np.float32)  # [6, M, 3]
    stds = rng.uniform(0.001, 0.5, (6, m)).astype(np.float32)
    grid_sizes = np.asarray(spec.resolutions, np.float32)

    # Reference composition (models.py:494-496): encode each hex point,
    # weight by erf, mean over hex.
    feats = hashgrid.encode(jnp.asarray(x), table, spec)  # [6, M, L, C]
    w = jax.lax.erf(1.0 / jnp.sqrt(
        8.0 * jnp.asarray(stds)[..., None] ** 2 * grid_sizes**2))  # [6,M,L]
    ref = np.asarray((feats * w[..., None]).mean(axis=0))  # [M, L, C]
    ref = ref.reshape(m, -1).T  # [L*C, M]

    x01 = (np.moveaxis(x, 2, 0) + 1) / 2  # [3, 6, M]
    out, wmeans = hashgrid.encode_hex_cm(
        jnp.asarray(x01), jnp.asarray(stds), table, spec)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(wmeans),
                               np.asarray(w.mean(axis=0)).T, atol=1e-5)


def test_encode_hex_cm_oob_zero():
    spec = hashgrid.HashGridSpec(num_levels=2, level_dim=4,
                                 base_resolution=4, desired_resolution=16,
                                 log2_hashmap_size=8)
    table = hashgrid.init_table(jax.random.PRNGKey(1), spec)
    x01 = jnp.full((3, 6, 4), 1.7)  # out of bounds
    stds = jnp.full((6, 4), 0.01)
    out, _ = hashgrid.encode_hex_cm(x01, stds, table, spec)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_encode_hex_cm_grad_finite(rng):
    spec = hashgrid.HashGridSpec(num_levels=3, level_dim=4,
                                 base_resolution=4, desired_resolution=32,
                                 log2_hashmap_size=8)
    table = hashgrid.init_table(jax.random.PRNGKey(2), spec)
    x01 = jnp.asarray(rng.uniform(0.05, 0.95, (3, 6, 16)).astype(np.float32))
    stds = jnp.asarray(rng.uniform(0.01, 0.3, (6, 16)).astype(np.float32))

    def f(tb, xx):
        out, _ = hashgrid.encode_hex_cm(xx, stds, tb, spec)
        return (out**2).sum()

    gt, gx = jax.grad(f, argnums=(0, 1))(table, x01)
    assert np.all(np.isfinite(np.asarray(gt)))
    assert np.all(np.isfinite(np.asarray(gx)))
    assert np.abs(np.asarray(gt)).sum() > 0
    assert np.abs(np.asarray(gx)).sum() > 0


def test_volumetric_rendering_cm_matches():
    rng = np.random.default_rng(5)
    r, s = 6, 8
    tdist = np.sort(rng.uniform(0, 4, (r, s + 1)), axis=-1).astype(np.float32)
    w = rng.uniform(0, 0.2, (r, s)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (r, s, 3)).astype(np.float32)
    t_far = np.full((r, 1), 4.0, np.float32)
    ref = rendering.volumetric_rendering(
        jnp.asarray(rgbs), jnp.asarray(w), jnp.asarray(tdist), 1.0,
        jnp.asarray(t_far), True)
    cm = rendering.volumetric_rendering_cm(
        jnp.asarray(np.moveaxis(rgbs, 2, 0)), jnp.asarray(w),
        jnp.asarray(tdist), 1.0, jnp.asarray(t_far), True)
    for k in ref:
        np.testing.assert_allclose(np.asarray(cm[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)
