import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu import configs
from ucnerf_tpu.train import losses as losses_lib
from ucnerf_tpu.train import state as state_lib
from ucnerf_tpu.train import step as step_lib


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = configs.tiny()
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    return cfg, model, params


def _batch(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    b = step_lib.dummy_batch(cfg, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    b["directions"] = d
    b["viewdirs"] = d
    b["cam_dirs"] = d
    b["rgb"] = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    b["cam_idx"] = rng.integers(0, cfg.training_views, n).astype(np.int32)
    b["sky_segs"] = (rng.uniform(size=n) < 0.3).astype(np.float32)
    return jax.tree.map(jnp.asarray, b)


def test_forward_shapes_and_outputs(tiny_setup):
    cfg, model, params = tiny_setup
    batch = _batch(cfg, 8)
    renderings, ray_history = model.apply({"params": params}, None, batch,
                                          0.5, train=True)
    assert len(renderings) == cfg.model.num_levels
    assert len(ray_history) == cfg.model.num_levels
    final = renderings[-1]
    assert final["rgb"].shape == (8, 3)
    assert final["depth"].shape == (8,)
    assert final["acc"].shape == (8,)
    assert final["weights"].shape == (8, cfg.model.num_nerf_samples)
    assert ray_history[0]["weights"].shape == (8, cfg.model.num_prop_samples)
    assert "affine_trans" in final and final["affine_trans"].shape == (8, 3, 4)
    assert "loss_hash_decay" in ray_history[0]
    for r in renderings:
        assert np.all(np.isfinite(np.asarray(r["rgb"])))


def test_forward_deterministic_without_key(tiny_setup):
    cfg, model, params = tiny_setup
    batch = _batch(cfg, 8)
    r1, _ = model.apply({"params": params}, None, batch, 0.5, train=False)
    r2, _ = model.apply({"params": params}, None, batch, 0.5, train=False)
    np.testing.assert_array_equal(np.asarray(r1[-1]["rgb"]),
                                  np.asarray(r2[-1]["rgb"]))


def test_brightness_starts_as_identity(tiny_setup):
    """Zero latents + identity-bias output layer => affine == [I|0] at init."""
    cfg, model, params = tiny_setup
    batch = _batch(cfg, 8)
    renderings, _ = model.apply({"params": params}, None, batch, 0.5,
                                train=False)
    affine = np.asarray(renderings[-1]["affine_trans"])
    eye = np.tile(np.eye(4)[None, :3, :], (8, 1, 1))
    np.testing.assert_allclose(affine, eye, atol=1e-6)


def test_eval_camidx_overrides_view(tiny_setup):
    """eval_camidx must select which per-view brightness latent is applied.

    At init latents and the output kernel are zero, so all views render
    identically and a shape check cannot discriminate; perturb the latents
    and the decoder's output kernel first so views produce distinct affines.
    """
    cfg, model, params = tiny_setup
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    bumped = False
    for path in list(flat):
        if path[-1] == "latent_code":
            rng = np.random.default_rng(hash(path) % (2**32))
            flat[path] = jnp.asarray(
                rng.normal(0, 1.0, flat[path].shape), jnp.float32)
            bumped = True
        if "output_linear" in path and path[-1] == "kernel":
            rng = np.random.default_rng(7)
            flat[path] = jnp.asarray(
                rng.normal(0, 0.3, flat[path].shape), jnp.float32)
    assert bumped, "no brightness latent_code found in params"
    params = flax.traverse_util.unflatten_dict(flat)

    batch = _batch(cfg, 8)
    r_a, _ = model.apply({"params": params}, None, batch, 0.5, train=False,
                         eval_camidx=0)
    r_b, _ = model.apply({"params": params}, None, batch, 0.5, train=False,
                         eval_camidx=1)
    rgb_a = np.asarray(r_a[-1]["rgb"])
    rgb_b = np.asarray(r_b[-1]["rgb"])
    assert rgb_a.shape == (8, 3)
    # Different latents -> different affine -> renders must differ.
    assert np.max(np.abs(rgb_a - rgb_b)) > 1e-5
    # And the override must be honored: rendering with the same camidx
    # twice must agree exactly.
    r_a2, _ = model.apply({"params": params}, None, batch, 0.5, train=False,
                          eval_camidx=0)
    np.testing.assert_array_equal(rgb_a, np.asarray(r_a2[-1]["rgb"]))


def test_all_losses_finite(tiny_setup):
    cfg, model, params = tiny_setup
    batch = _batch(cfg, 16)
    renderings, ray_history = model.apply(
        {"params": params}, jax.random.PRNGKey(1), batch, 0.5, train=True)
    total, losses, stats = losses_lib.compute_all_losses(
        batch, renderings, ray_history, cfg)
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    expected = {"data", "sky_segments", "identity", "anti_interlevel",
                "distortion", "hash_decay"}
    assert expected == set(losses.keys())


def test_train_step_learns_constant_image(tiny_setup):
    cfg, model, _ = tiny_setup
    _, params = step_lib.init_model(cfg, jax.random.PRNGKey(7))
    state = state_lib.create_train_state(cfg, params)
    train_step = step_lib.make_train_step(model, cfg)
    batch = _batch(cfg, cfg.batch_size, seed=3)
    losses = []
    for i in range(20):
        state, stats = train_step(state, batch, jax.random.PRNGKey(i),
                                  jnp.float32(i / cfg.max_steps))
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 20


def test_train_step_multidevice_matches_single():
    """The pjit-sharded step must agree with the single-device step."""
    from ucnerf_tpu.parallel import mesh as meshlib
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg = configs.tiny()
    model, params0 = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg, 64, seed=5)

    # The train step donates its state, so each run needs its own copy.
    copy = lambda t: jax.tree.map(jnp.array, t)
    params = copy(params0)
    state1 = state_lib.create_train_state(cfg, copy(params0))
    step1 = step_lib.make_train_step(model, cfg)
    state1, stats1 = step1(state1, batch, jax.random.PRNGKey(9),
                           jnp.float32(0.1))

    mesh = meshlib.create_mesh()
    state2 = state_lib.create_train_state(cfg, copy(params0))
    step8 = step_lib.make_train_step(model, cfg, mesh=mesh)
    sharded = meshlib.shard_batch(batch, mesh)
    state2, stats2 = step8(state2, sharded, jax.random.PRNGKey(9),
                           jnp.float32(0.1))

    np.testing.assert_allclose(float(stats1["loss"]), float(stats2["loss"]),
                               rtol=1e-5)
    l1 = jax.tree.leaves(state1.params)
    l2 = jax.tree.leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_render_image_shape(tiny_setup):
    cfg, model, params = tiny_setup
    h, w = 6, 8
    flatb = _batch(cfg, h * w)
    img_batch = {k: np.asarray(v).reshape((h, w) + v.shape[1:])
                 for k, v in flatb.items()}
    eval_step = step_lib.make_eval_step(model, cfg)
    out = step_lib.render_image(eval_step, params, img_batch, cfg,
                                eval_camidx=0)
    assert out["rgb"].shape == (h, w, 3)
    assert out["depth"].shape == (h, w)
    assert out["distance_median"].shape == (h, w)
    assert np.all(np.isfinite(out["rgb"]))


def test_grad_scaler():
    from ucnerf_tpu.ops import grad_scaler

    def f(rgb, density, dist):
        r, d = grad_scaler.scale_gradients_by_distance(rgb, density, dist)
        return (r.sum() + d.sum())

    rgb = jnp.ones((3, 4, 2))  # channel-major [3, R, S]
    density = jnp.ones((4, 2))
    dist = jnp.array([[0.1, 0.5], [1.0, 2.0], [0.0, 0.7], [3.0, 0.2]])
    g_rgb, g_density = jax.grad(f, argnums=(0, 1))(rgb, density, dist)
    expect = np.clip(np.asarray(dist) ** 2, 0, 1)
    np.testing.assert_allclose(np.asarray(g_density), expect, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_rgb),
                               np.tile(expect[None], (3, 1, 1)),
                               rtol=1e-6)


def test_zipmlp_glo_path():
    """GLO vectors modulate the bottleneck (models.py:607-615), channel-major."""
    import dataclasses as dc
    cfg = dc.replace(configs.tiny().nerf_mlp, num_glo_features=4)
    from ucnerf_tpu.models.fields import ZipMLP
    mlp = ZipMLP(cfg)
    means = jnp.zeros((3, 6, 8, 4))
    stds = jnp.full((6, 8, 4), 0.05)
    vd = jnp.ones((8, 3))
    glo = jnp.ones((8, 4))
    params = mlp.init(jax.random.PRNGKey(0), None, means, stds, viewdirs=vd,
                      glo_vec=glo)
    out1 = mlp.apply(params, None, means, stds, viewdirs=vd, glo_vec=glo)
    out2 = mlp.apply(params, None, means, stds, viewdirs=vd,
                     glo_vec=2.0 * glo)
    assert out1["rgb"].shape == (3, 8, 4)
    assert np.all(np.isfinite(np.asarray(out1["rgb"])))
    # Different GLO vectors change the output.
    assert np.abs(np.asarray(out1["rgb"]) - np.asarray(out2["rgb"])).max() > 0


def test_zipmlp_pred_normals_path():
    """enable_pred_normals emits unit normals (models.py:569-578)."""
    import dataclasses as dc
    cfg = dc.replace(configs.tiny().nerf_mlp, enable_pred_normals=True)
    from ucnerf_tpu.models.fields import ZipMLP
    mlp = ZipMLP(cfg)
    means = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 8, 4))
    stds = jnp.full((6, 8, 4), 0.05)
    vd = jnp.ones((8, 3))
    params = mlp.init(jax.random.PRNGKey(0), None, means, stds, viewdirs=vd)
    out = mlp.apply(params, None, means, stds, viewdirs=vd)
    n = np.asarray(out["normals_pred"])
    assert n.shape == (3, 8, 4)
    norms = np.linalg.norm(n, axis=0)
    # Unit length up to the eps clamp (near-zero predictions normalize short).
    assert np.all(norms <= 1 + 1e-4)
    assert np.median(norms) > 0.99


def test_scan_equals_host_microbatches():
    """The in-graph lax.scan accumulation (flagship default since round 4,
    configs.waymo_tpu host_microbatches=False) and the host-driven
    microbatch loop split keys, reshape rays, accumulate, and scale
    identically — one step from the same state/batch/key must produce the
    same params and loss (up to compiler reassociation)."""
    import dataclasses

    cfg = dataclasses.replace(configs.tiny(), batch_size=64, microbatches=2,
                              host_microbatches=False,
                              donate_train_state=False)
    cfg_host = dataclasses.replace(cfg, host_microbatches=True)
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg, 64, seed=7)
    key = jax.random.PRNGKey(3)

    outs = []
    for c in (cfg, cfg_host):
        state = state_lib.create_train_state(c, params)
        new_state, stats = step_lib.make_train_step(model, c)(
            state, batch, key, jnp.float32(0.5))
        outs.append((new_state, stats))

    (s_scan, st_scan), (s_host, st_host) = outs
    np.testing.assert_allclose(float(st_scan["loss"]),
                               float(st_host["loss"]), rtol=1e-6)
    flat_a = jax.tree.leaves(s_scan.params)
    flat_b = jax.tree.leaves(s_host.params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
