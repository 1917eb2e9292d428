import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.ops import geopoly, ref_utils


def test_reflect():
    v = jnp.array([[0.0, 0.0, 1.0]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(ref_utils.reflect(v, n)),
                               [[0, 0, 1.0]], atol=1e-6)
    # 45-degree bounce off the z plane.
    v2 = jnp.array([[1.0, 0.0, 1.0]]) / np.sqrt(2)
    r = np.asarray(ref_utils.reflect(v2, n))
    np.testing.assert_allclose(r, [[-1 / np.sqrt(2), 0, 1 / np.sqrt(2)]],
                               atol=1e-6)


def test_l2_normalize():
    x = jnp.array([[3.0, 4.0, 0.0]])
    np.testing.assert_allclose(np.asarray(ref_utils.l2_normalize(x)),
                               [[0.6, 0.8, 0.0]], atol=1e-6)


def test_ide_shapes_and_zero_kappa():
    for deg in (1, 2, 4):
        fn = ref_utils.generate_ide_fn(deg)
        n_harm = ref_utils.get_ml_array(deg).shape[1]
        xyz = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        out = fn(xyz, jnp.zeros((2, 1)))
        assert out.shape == (2, 2 * n_harm)
        assert np.all(np.isfinite(np.asarray(out)))


def test_ide_matches_known_sh():
    """For z-axis input, m>0 harmonics vanish and Y_l^0(z=1) =
    sqrt((2l+1)/4pi)."""
    fn = ref_utils.generate_ide_fn(2)
    ml = ref_utils.get_ml_array(2)
    out = np.asarray(fn(jnp.array([[0.0, 0.0, 1.0]]), jnp.zeros((1, 1))))[0]
    n = ml.shape[1]
    for i, (m, l) in enumerate(ml.T):
        expect = np.sqrt((2 * l + 1) / (4 * np.pi)) if m == 0 else 0.0
        np.testing.assert_allclose(out[i], expect, atol=1e-5)
        np.testing.assert_allclose(out[n + i], 0.0, atol=1e-6)  # imag


def test_ide_attenuates_with_roughness():
    fn = ref_utils.generate_ide_fn(3)
    xyz = jnp.array([[0.5, 0.5, 0.70710678]])
    sharp = np.abs(np.asarray(fn(xyz, jnp.zeros((1, 1)))))
    rough = np.abs(np.asarray(fn(xyz, jnp.full((1, 1), 10.0))))
    assert np.all(rough <= sharp + 1e-7)


def test_generate_basis_icosahedron():
    basis = geopoly.generate_basis("icosahedron", 2)
    assert basis.shape[1] == 3
    norms = np.linalg.norm(basis, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    # No two rows are reflections of each other.
    d = geopoly.compute_sq_dist(basis.T, -basis.T)
    assert (d < 1e-4).sum() == 0


def test_generate_basis_octahedron():
    basis = geopoly.generate_basis("octahedron", 2)
    assert basis.shape[1] == 3
    np.testing.assert_allclose(np.linalg.norm(basis, axis=1), 1.0, atol=1e-6)


def test_weighted_mae():
    n = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    gt = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    w = jnp.array([1.0, 1.0])
    mae = float(ref_utils.compute_weighted_mae(w, n, gt))
    # The eps clamp inside arccos costs ~0.02 degrees.
    np.testing.assert_allclose(mae, 45.0, atol=0.1)
