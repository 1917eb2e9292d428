"""In-graph per-camera extrinsic refinement (models/cam_refine.py).

Covers: Rodrigues exp-map correctness vs scipy, exact identity at init,
equivalence of the per-ray rigid transform to regenerating rays from
``Exp(xi) @ c2w`` via ``pixels_to_rays``, gradient flow through the full
UCNeRF model, and the north-star convergence property — a deliberately
perturbed camera is recovered (>5x pose-error reduction) by photometric
optimization on synthetic data (SURVEY.md §7.7 / VERDICT round-1 item 6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.spatial.transform import Rotation

from ucnerf_tpu.data import cameras as camlib
from ucnerf_tpu.data import datasets
from ucnerf_tpu.models import cam_refine


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(0, 1.0, (32, 3)).astype(np.float32)
    w[0] = 0  # exact identity
    w[1] = [1e-6, 0, 0]  # small-angle branch
    got = np.asarray(cam_refine.so3_exp(jnp.asarray(w)))
    want = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_array_equal(got[0], np.eye(3, dtype=np.float32))


def test_so3_exp_gradient_finite_at_zero():
    g = jax.grad(lambda w: cam_refine.so3_exp(w).sum())(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_identity_at_init(rng):
    o = rng.normal(0, 1, (16, 3)).astype(np.float32)
    d = rng.normal(0, 1, (16, 3)).astype(np.float32)
    cd = rng.normal(0, 1, (16, 3)).astype(np.float32)
    idx = rng.integers(0, 3, 16).astype(np.int32)
    o2, d2, cd2 = cam_refine.se3_apply(
        jnp.zeros((3, 6)), jnp.asarray(idx), jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(cd))
    np.testing.assert_array_equal(np.asarray(o2), o)
    np.testing.assert_array_equal(np.asarray(d2), d)
    np.testing.assert_array_equal(np.asarray(cd2), cd)


def test_equivalent_to_pose_composition(rng):
    """o' = R o + t, d' = R d  ==  rays cast from Exp(xi) @ c2w."""
    xi = 0.2 * rng.normal(0, 1, 6).astype(np.float32)
    c2w = np.eye(4, dtype=np.float64)
    c2w[:3, :3] = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    c2w[:3, 3] = [1.0, -2.0, 0.7]

    k = np.array([[80.0, 0, 48], [0, 80.0, 32], [0, 0, 1]])
    pixtocam = np.linalg.inv(k)
    x, y = np.meshgrid(np.arange(0, 96, 13), np.arange(0, 64, 9))
    x, y = x.reshape(-1), y.reshape(-1)

    origins, directions, _, _, _ = camlib.pixels_to_rays(
        x, y, pixtocam[None], c2w[None, :3, :])
    cam_dirs = np.broadcast_to(-c2w[:3, 2], directions.shape)

    delta = np.eye(4)
    delta[:3, :3] = Rotation.from_rotvec(xi[:3]).as_matrix()
    delta[:3, 3] = xi[3:]
    c2w_ref = delta @ c2w
    o_ref, d_ref, _, _, _ = camlib.pixels_to_rays(
        x, y, pixtocam[None], c2w_ref[None, :3, :])

    deltas = jnp.zeros((2, 6)).at[1].set(jnp.asarray(xi))
    idx = jnp.ones(len(x), jnp.int32)
    o2, d2, cd2 = cam_refine.se3_apply(
        deltas, idx, jnp.asarray(origins, jnp.float32),
        jnp.asarray(directions, jnp.float32),
        jnp.asarray(cam_dirs, jnp.float32))
    np.testing.assert_allclose(np.asarray(o2), o_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), d_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cd2),
                               np.broadcast_to(-c2w_ref[:3, 2], d_ref.shape),
                               atol=1e-5)


def _plane_color_jnp(origins, dn):
    """Differentiable analytic renderer for the pose-recovery test: an
    infinite textured ground plane (y = -1) with multi-scale smooth texture.
    Smooth everywhere, so the photometric objective has a wide basin — the
    sphere/checker synthetic scene's hard region boundaries contribute no
    pose gradient and trap photometric alignment in local minima (verified),
    which tests the optimizer's luck, not this module."""
    o, d = origins, dn
    t = (-1.0 - o[..., 1]) / jnp.where(jnp.abs(d[..., 1]) > 1e-6,
                                       d[..., 1], 1e-6)
    p = o + d * t[..., None]
    u, v = p[..., 0], p[..., 2]

    def tex(u, v):
        return (0.6 * jnp.sin(0.9 * u) * jnp.sin(0.7 * v)
                + 0.3 * jnp.sin(2.3 * u + 1.0) * jnp.sin(1.9 * v + 0.5)
                + 0.15 * jnp.sin(5.1 * u + 2.0) * jnp.sin(4.3 * v + 1.2))

    return jnp.stack([0.5 + 0.4 * tex(u, v),
                      0.5 + 0.4 * tex(u + 3, v + 1),
                      0.5 + 0.4 * tex(u - 2, v + 4)], axis=-1)


def test_perturbed_camera_recovers():
    """North-star: photometric optimization through the renderer shrinks a
    deliberate miscalibration by >5x in both rotation and translation."""
    # True camera looking down at the plane.
    c2w = np.eye(4)
    c2w[:3, :3] = Rotation.from_euler("xyz", [-0.5, 0.3, 0.0]).as_matrix()
    c2w[:3, 3] = [0.5, 1.5, 2.0]
    k = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    pixtocam = np.linalg.inv(k)
    x, y = np.meshgrid(np.arange(128), np.arange(96))
    x, y = x.reshape(-1), y.reshape(-1)

    # Ground-truth pixels from the TRUE pose.
    o_true, d_true, _, _, _ = camlib.pixels_to_rays(
        x, y, pixtocam[None], c2w[None, :3, :])
    dn_true = d_true / np.linalg.norm(d_true, axis=-1, keepdims=True)
    target = _plane_color_jnp(jnp.asarray(o_true, jnp.float32),
                              jnp.asarray(dn_true, jnp.float32))

    # Rays generated from a PERTURBED pose (what an under-calibrated rig
    # would feed the renderer).
    xi_true = np.array([0.03, -0.05, 0.02, 0.08, -0.06, 0.04], np.float32)
    delta = np.eye(4)
    delta[:3, :3] = Rotation.from_rotvec(xi_true[:3]).as_matrix()
    delta[:3, 3] = xi_true[3:]
    c2w_bad = delta @ c2w
    o_bad, d_bad, _, _, _ = camlib.pixels_to_rays(
        x, y, pixtocam[None], c2w_bad[None, :3, :])
    o_bad = jnp.asarray(o_bad, jnp.float32)
    d_bad = jnp.asarray(d_bad, jnp.float32)
    cd_bad = jnp.broadcast_to(jnp.asarray(-c2w_bad[:3, 2], jnp.float32),
                              d_bad.shape)
    idx = jnp.zeros(len(x), jnp.int32)

    def pose_error(deltas):
        """Residual rigid error of Exp(delta) @ c2w_bad vs c2w."""
        rot = np.asarray(cam_refine.so3_exp(jnp.asarray(deltas[0, :3])))
        fix = np.eye(4)
        fix[:3, :3] = rot
        fix[:3, 3] = np.asarray(deltas[0, 3:])
        resid = np.linalg.inv(c2w) @ fix @ c2w_bad
        ang = np.linalg.norm(Rotation.from_matrix(
            resid[:3, :3]).as_rotvec())
        return ang, np.linalg.norm(resid[:3, 3])

    def loss_fn(deltas):
        o2, d2, _ = cam_refine.se3_apply(deltas, idx, o_bad, d_bad, cd_bad)
        dn = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
        pred = _plane_color_jnp(o2, dn)
        return jnp.mean((pred - target) ** 2)

    deltas = jnp.zeros((1, 6))
    err0_rot, err0_tr = pose_error(np.asarray(deltas))
    tx = optax.adam(3e-3)
    opt_state = tx.init(deltas)
    step = jax.jit(lambda dl, st: _adam_step(loss_fn, tx, dl, st))
    for _ in range(300):
        deltas, opt_state = step(deltas, opt_state)
    err_rot, err_tr = pose_error(np.asarray(deltas))

    # Empirically the residual is ~1e-5; require a 5x reduction minimum.
    assert err0_rot / max(err_rot, 1e-9) > 5, (err0_rot, err_rot)
    assert err0_tr / max(err_tr, 1e-9) > 5, (err0_tr, err_tr)


def _adam_step(loss_fn, tx, deltas, opt_state):
    loss, g = jax.value_and_grad(loss_fn)(deltas)
    updates, opt_state = tx.update(g, opt_state, deltas)
    return optax.apply_updates(deltas, updates), opt_state


def test_model_integration_gradients():
    """With optimize_cameras on, the full model exposes cam_refine params and
    the training loss produces nonzero gradients for them."""
    from ucnerf_tpu import configs
    from ucnerf_tpu.train import losses as losses_lib
    from ucnerf_tpu.train import step as step_lib

    cfg = configs.tiny(optimize_cameras=True, num_phys_cams=2,
                       max_steps=5)
    ds = datasets.load_dataset("train", cfg)
    batch = ds.sample_batch(np.random.default_rng(0), 32)
    assert "phys_cam_idx" in batch
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0), batch)
    assert "cam_refine" in params

    def loss(p):
        renderings, ray_history = model.apply(
            {"params": p}, jax.random.PRNGKey(1),
            jax.tree.map(jnp.asarray, batch), 0.5, train=True)
        total, _, _ = losses_lib.compute_all_losses(
            jax.tree.map(jnp.asarray, batch), renderings, ray_history, cfg)
        return total

    g = jax.grad(loss)(params)
    gd = np.asarray(g["cam_refine"]["se3_deltas"])
    assert np.isfinite(gd).all()
    assert np.abs(gd).max() > 0


def test_contract_origin_grads_unlocks_translation():
    """Reference parity: the no-grad contraction blocks all photometric
    gradient to ray ORIGINS, so the translation half of the se(3) deltas gets
    exactly zero gradient (QUALITY_r03).  The contract_origin_grads deviation
    opens it; rotation gradient must be nonzero in both modes."""
    from ucnerf_tpu import configs
    from ucnerf_tpu.train import losses as losses_lib
    from ucnerf_tpu.train import step as step_lib

    def trans_rot_grads(contract_origin_grads):
        cfg = configs.tiny(optimize_cameras=True, num_phys_cams=2,
                           max_steps=5, model_sky=False,
                           contract_origin_grads=contract_origin_grads)
        ds = datasets.load_dataset("train", cfg)
        batch = ds.sample_batch(np.random.default_rng(0), 32)
        model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0),
                                            batch)

        def loss(p):
            renderings, ray_history = model.apply(
                {"params": p}, jax.random.PRNGKey(1),
                jax.tree.map(jnp.asarray, batch), 0.5, train=True)
            total, _, _ = losses_lib.compute_all_losses(
                jax.tree.map(jnp.asarray, batch), renderings, ray_history,
                cfg)
            return total

        gd = np.asarray(jax.grad(loss)(params)["cam_refine"]["se3_deltas"])
        assert np.isfinite(gd).all()
        return np.abs(gd[:, 3:]).max(), np.abs(gd[:, :3]).max()

    t_off, r_off = trans_rot_grads(False)
    t_on, r_on = trans_rot_grads(True)
    assert t_off == 0.0, t_off  # reference semantics: origins get no grad
    assert t_on > 0.0, t_on     # deviation: translation learnable
    assert r_off > 0.0 and r_on > 0.0


def test_cam_lr_mult_scales_only_camera_updates():
    """The optimizer applies cam_lr_mult to the se(3) deltas and leaves
    every other parameter group at the field LR (train/state.py)."""
    import optax
    from ucnerf_tpu import configs
    from ucnerf_tpu.train import state as state_lib

    params = {
        "cam_refine": {"se3_deltas": jnp.ones((3, 6))},
        "nerf_mlp": {"kernel": jnp.ones((4, 4))},
    }
    grads = jax.tree.map(jnp.ones_like, params)

    def updates_for(cfg):
        tx = state_lib.create_optimizer(cfg)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        return upd

    base = configs.tiny(optimize_cameras=True, cam_lr_mult=1.0)
    scaled = configs.tiny(optimize_cameras=True, cam_lr_mult=0.02)

    u1 = updates_for(base)
    u2 = updates_for(scaled)
    # Field updates identical; camera updates scaled by exactly the mult.
    np.testing.assert_allclose(np.asarray(u2["nerf_mlp"]["kernel"]),
                               np.asarray(u1["nerf_mlp"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(u2["cam_refine"]["se3_deltas"]),
        np.asarray(u1["cam_refine"]["se3_deltas"]) * 0.02, rtol=1e-6)
