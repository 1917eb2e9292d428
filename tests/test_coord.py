import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.ops import coord


def test_contract_identity_inside_unit_ball(rng):
    x = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
    z = np.asarray(coord.contract(jnp.asarray(x)))
    np.testing.assert_allclose(z, x, atol=1e-6)


def test_contract_bounded_by_two(rng):
    x = rng.uniform(-100, 100, (256, 3)).astype(np.float32)
    z = np.asarray(coord.contract(jnp.asarray(x)))
    assert np.all(np.linalg.norm(z, axis=-1) <= 2.0 + 1e-5)


def test_contract_roundtrip(rng):
    x = rng.uniform(-20, 20, (128, 3)).astype(np.float32)
    z = coord.contract(jnp.asarray(x))
    x2 = np.asarray(coord.inv_contract(z))
    np.testing.assert_allclose(x2, x, rtol=1e-3, atol=1e-3)


def test_contract_mean_std_det_matches_jacobian(rng):
    """std scaling must equal det(J_contract)^(1/3) at the mean."""
    x = rng.uniform(1.1, 5.0, (16, 3)).astype(np.float32)
    std = np.ones(16, np.float32)
    _, std_out = coord.contract_mean_std(jnp.asarray(x), jnp.asarray(std))
    jac = jax.vmap(jax.jacfwd(coord.contract))(jnp.asarray(x))
    det13 = np.abs(np.linalg.det(np.asarray(jac))) ** (1 / 3)
    np.testing.assert_allclose(np.asarray(std_out), det13, rtol=1e-3)


def test_contract_mean_std_identity_inside(rng):
    x = rng.uniform(-0.4, 0.4, (8, 3)).astype(np.float32)
    std = rng.uniform(0.1, 1.0, 8).astype(np.float32)
    z, s = coord.contract_mean_std(jnp.asarray(x), jnp.asarray(std))
    np.testing.assert_allclose(np.asarray(z), x, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), std, atol=1e-6)


def test_ray_warp_roundtrip_identity():
    t_to_s, s_to_t = coord.construct_ray_warps(None, jnp.float32(0.0),
                                               jnp.float32(8.0))
    t = jnp.linspace(0.0, 8.0, 33)
    np.testing.assert_allclose(np.asarray(s_to_t(t_to_s(t))), np.asarray(t),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_to_s(jnp.float32(8.0))), 1.0)


def test_ray_warp_roundtrip_power():
    t_to_s, s_to_t = coord.construct_ray_warps(
        "power_transformation", jnp.float32(0.1), jnp.float32(100.0),
        lam=-1.5)
    t = jnp.linspace(0.1, 100.0, 65)
    np.testing.assert_allclose(np.asarray(s_to_t(t_to_s(t))), np.asarray(t),
                               rtol=2e-3)


def test_ray_warp_piecewise():
    t_to_s, s_to_t = coord.construct_ray_warps("piecewise", jnp.float32(0.0),
                                               jnp.float32(100.0))
    t = jnp.linspace(0.0, 100.0, 65)
    np.testing.assert_allclose(np.asarray(s_to_t(t_to_s(t))), np.asarray(t),
                               rtol=1e-3, atol=1e-3)


def test_pos_enc_shapes_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    enc = coord.pos_enc(x, 0, 4, append_identity=True)
    assert enc.shape == (1, 3 + 3 * 2 * 4)
    np.testing.assert_allclose(np.asarray(enc[:, :3]), np.asarray(x))
    # First sin block is sin(x).
    np.testing.assert_allclose(np.asarray(enc[0, 3:6]), np.sin([0.5, -0.25, 1.0]),
                               rtol=1e-6)


def test_integrated_pos_enc_attenuates_with_var():
    mean = jnp.array([[0.3, 0.7, -0.2]])
    small = coord.integrated_pos_enc(mean, jnp.full((1, 3), 1e-6), 0, 4)
    large = coord.integrated_pos_enc(mean, jnp.full((1, 3), 10.0), 0, 4)
    assert np.all(np.abs(np.asarray(large)) <= np.abs(np.asarray(small)) + 1e-6)


def test_expected_sin():
    np.testing.assert_allclose(
        np.asarray(coord.expected_sin(jnp.float32(0.5), jnp.float32(0.0))),
        np.sin(0.5), rtol=1e-6)
