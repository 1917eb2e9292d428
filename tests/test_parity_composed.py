"""Composed whole-model parity vs the reference ``Model.forward``.

The 54-test unit harness (test_parity_torch.py) proves every piece matches;
this module runs the reference's COMPOSED model — proposal loop + dilation +
anneal + resample + hex casting + MLP + alpha compositing + volumetric
rendering (+ GradientScaler + brightness correction) as one unit
(``/root/reference/nerf/internal/models.py:97-365``) — against
``ucnerf_tpu.models.model.UCNeRFModel``, deterministically (rand=False), and
compares renderings AND input gradients.

The CUDA GridEncoder is replaced on BOTH sides by one shared deterministic
mock (a smooth sin-of-projections feature field computed from the same numpy
tables), so the only untested carve-outs are the hash table itself (bit-exact
oracle tests in test_hashgrid.py) and the sky NeRF (documented z-sampling
deviation, excluded as in the unit harness).

Weights are copied torch -> flax layer by layer (DenseCM stores [in, out] =
torch Linear weight transposed).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests import torch_oracle  # noqa: E402
from ucnerf_tpu import configs  # noqa: E402
from ucnerf_tpu.models.model import UCNeRFModel  # noqa: E402
from ucnerf_tpu.ops import hashgrid  # noqa: E402

# ---------------------------------------------------------------------------
# The shared deterministic mock encoder.

_MOCK_TABLES = {}


def _mock_tables(num_levels, level_dim):
    """Per-(L, C) projection dirs / phases / freqs, shared by both sides."""
    key = (num_levels, level_dim)
    if key not in _MOCK_TABLES:
        rng = np.random.default_rng(42 + 1000 * num_levels + level_dim)
        _MOCK_TABLES[key] = dict(
            dirs=rng.normal(size=(num_levels, level_dim, 3)).astype(
                np.float32),
            phases=rng.uniform(0, 2 * np.pi,
                               (num_levels, level_dim)).astype(np.float32),
            freqs=(1.5 + np.arange(num_levels)).astype(np.float32),
        )
    return _MOCK_TABLES[key]


class MockGridEncoder(torch.nn.Module):
    """Drop-in for the CUDA GridEncoder (grid.py:97-174): deterministic
    smooth features f[l,c](u) = 0.5 sin(freq_l (u . d_lc) + p_lc) over the
    unit cube u = (x + bound) / 2 bound."""

    def __init__(self, input_dim=3, num_levels=10, level_dim=4,
                 base_resolution=16, desired_resolution=8192,
                 log2_hashmap_size=21, gridtype="hash", align_corners=False,
                 **kwargs):
        super().__init__()
        self.input_dim = input_dim
        self.num_levels = num_levels
        self.level_dim = level_dim
        self.output_dim = num_levels * level_dim
        self.init_std = 1e-4
        spec = hashgrid.HashGridSpec(
            input_dim=input_dim, num_levels=num_levels, level_dim=level_dim,
            base_resolution=base_resolution,
            desired_resolution=desired_resolution,
            log2_hashmap_size=log2_hashmap_size)
        self.register_buffer(
            "grid_sizes",
            torch.tensor(spec.resolutions, dtype=torch.float32))
        # Tiny embeddings/idx so the hash-decay path stays importable.
        self.embeddings = torch.nn.Parameter(
            torch.zeros(num_levels * 8, level_dim))
        self.register_buffer(
            "idx", torch.repeat_interleave(torch.arange(num_levels), 8))
        t = _mock_tables(num_levels, level_dim)
        self.register_buffer("mock_dirs", torch.from_numpy(t["dirs"]))
        self.register_buffer("mock_phases", torch.from_numpy(t["phases"]))
        self.register_buffer("mock_freqs", torch.from_numpy(t["freqs"]))

    def forward(self, x, bound=1):
        u = (x + bound) / (2 * bound)
        proj = torch.einsum("...d,lcd->...lc", u, self.mock_dirs)
        feats = 0.5 * torch.sin(
            self.mock_freqs[:, None] * proj + self.mock_phases)
        return feats.flatten(-2, -1)


def mock_encode_hex_cm(x01, stds, table, spec, grid_sizes=None,
                       accum_dtype=jnp.float32, gather_dtype=None,
                       bwd_dense_sample=False, bwd_value_dtype=None):
    """jax twin of MockGridEncoder composed with the erf weighting + hex mean
    exactly as ops/hashgrid.encode_hex_cm contracts (models.py:494-496)."""
    del table, accum_dtype, gather_dtype, bwd_dense_sample, bwd_value_dtype
    if grid_sizes is None:
        grid_sizes = np.asarray(spec.resolutions, np.float32)
    t = _mock_tables(spec.num_levels, spec.level_dim)
    m = x01.shape[-1]
    hex_n = x01.shape[1]
    # [3, H, M] x [L, C, 3] -> [L, C, H, M]
    proj = jnp.einsum("dhm,lcd->lchm", x01, jnp.asarray(t["dirs"]))
    feats_pt = 0.5 * jnp.sin(
        jnp.asarray(t["freqs"])[:, None, None, None] * proj
        + jnp.asarray(t["phases"])[:, :, None, None])
    w_erf = jax.lax.erf(
        1.0 / jnp.sqrt(8.0 * stds[None] ** 2
                       * jnp.asarray(grid_sizes)[:, None, None] ** 2))
    feats = (feats_pt * w_erf[:, None]).mean(axis=2)  # [L, C, M]
    wmeans = w_erf.mean(axis=1)  # [L, M]
    assert hex_n == 6, "composed parity runs the exact 6-point hex path"
    return feats.reshape(spec.num_levels * spec.level_dim, m), wmeans


# ---------------------------------------------------------------------------
# Batch + model construction.

N_RAYS = 6
TRAINING_VIEWS = 4


def make_batch(n=N_RAYS, near=0.0, far=8.0):
    rng = np.random.default_rng(7)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
    return {
        "origins": o,
        "directions": d.copy(),
        "viewdirs": d.copy(),
        "cam_dirs": d.copy(),
        "radii": np.full((n, 1), 2e-3, np.float32),
        "near": np.full((n, 1), near, np.float32),
        "far": np.full((n, 1), far, np.float32),
        "cam_idx": rng.integers(0, TRAINING_VIEWS, n).astype(np.int32),
        "lossmult": np.ones((n, 1), np.float32),
        "rgb": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "sky_segs": np.zeros((n,), np.float32),
    }


def torch_batch(batch):
    tb = {k: torch.from_numpy(np.asarray(v)) for k, v in batch.items()}
    tb["cam_idx"] = tb["cam_idx"][:, None]  # reference indexes [..., 0]
    return tb


def build_ref_model(brightness):
    ref_models = torch_oracle.load_models(MockGridEncoder)
    # waymo.gin's MLP class bindings (gin is stubbed, so set the class
    # attributes the way gin would).
    ref_models.PropMLP.disable_rgb = True
    ref_models.PropMLP.disable_density_normals = True
    ref_models.NerfMLP.disable_density_normals = True
    ns = types.SimpleNamespace(
        model_sky=False, brightness_correction=brightness,
        training_views=TRAINING_VIEWS, zero_glo=True, vis_num_rays=4)
    model = ref_models.Model(config=ns, num_levels=2, num_prop_samples=128,
                             num_nerf_samples=32)
    model.eval()
    return model


def build_our_model(brightness):
    cfg = configs.Config(
        near=0.0, far=8.0, brightness_correction=brightness,
        training_views=TRAINING_VIEWS, remat_fields=False,
        model=configs.ModelConfig(num_levels=2, num_prop_samples=128,
                                  num_nerf_samples=32),
        nerf_mlp=configs.MLPConfig(disable_density_normals=True),
        prop_mlp=configs.MLPConfig(disable_rgb=True,
                                   disable_density_normals=True),
    )
    model = UCNeRFModel(cfg)
    batch = jax.tree.map(jnp.asarray, make_batch())
    params = model.init(jax.random.PRNGKey(0), None, batch, 0.5,
                        train=False)["params"]
    return model, params


def _copy_linear(params, path, torch_linear):
    """torch Linear -> DenseCM/Dense params in-place ([out,in] -> [in,out])."""
    node = params
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = {
        "kernel": jnp.asarray(
            torch_linear.weight.detach().numpy().T.copy()),
        "bias": jnp.asarray(torch_linear.bias.detach().numpy().copy()),
    }


def copy_weights(ref_model, params, brightness):
    """Copy every learnable weight of the reference model into our pytree."""
    import flax
    params = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else \
        jax.tree.map(lambda x: x, params)

    def copy_mlp(ours_name, theirs):
        _copy_linear(params, (ours_name, "density_hidden"),
                     theirs.density_layer[0])
        _copy_linear(params, (ours_name, "density_out"),
                     theirs.density_layer[2])
        if not theirs.disable_rgb:
            for i in range(theirs.net_depth_viewdirs):
                _copy_linear(
                    params, (ours_name, f"lin_second_stage_{i}"),
                    theirs.get_submodule(f"lin_second_stage_{i}"))
            _copy_linear(params, (ours_name, "rgb_layer"), theirs.rgb_layer)

    copy_mlp("nerf_mlp", ref_model.nerf_mlp)
    copy_mlp("prop_mlp_0", ref_model.get_submodule("prop_mlp_0"))
    if brightness:
        bc = ref_model.brightness_corr
        params["brightness_corr"]["latent_code"] = jnp.asarray(
            bc.latent_code.detach().numpy().copy())
        bmlp = params["brightness_corr"]["brightness_mlp"]
        for i, lin in enumerate(bc.brightness_MLP.pts_linears):
            bmlp[f"pts_linears_{i}"] = {
                "kernel": jnp.asarray(lin.weight.detach().numpy().T.copy()),
                "bias": jnp.asarray(lin.bias.detach().numpy().copy()),
            }
        bmlp["output_linear"] = {
            "kernel": jnp.asarray(
                bc.brightness_MLP.output_linear.weight.detach().numpy().T
                .copy()),
            "bias": jnp.asarray(
                bc.brightness_MLP.output_linear.bias.detach().numpy().copy()),
        }
    return params


# ---------------------------------------------------------------------------
# Tests.

@pytest.fixture(params=[False, True], ids=["plain", "brightness"])
def setups(request, monkeypatch):
    brightness = request.param
    monkeypatch.setattr(hashgrid, "encode_hex_cm", mock_encode_hex_cm)
    ref_model = build_ref_model(brightness)
    # Randomize the brightness latents/MLP so the affine is NOT identity
    # (zeros-latent + shared MLP yields one global affine otherwise).
    if brightness:
        g = torch.Generator().manual_seed(3)
        with torch.no_grad():
            ref_model.brightness_corr.latent_code.normal_(
                0, 0.3, generator=g)
            for lin in ref_model.brightness_corr.brightness_MLP.pts_linears:
                lin.weight.normal_(0, 0.05, generator=g)
            out = ref_model.brightness_corr.brightness_MLP.output_linear
            out.weight.normal_(0, 0.05, generator=g)
    our_model, params = build_our_model(brightness)
    params = copy_weights(ref_model, params, brightness)
    return brightness, ref_model, our_model, params


def _run_ref(ref_model, batch, grad=False):
    tb = torch_batch(batch)
    if grad:
        tb["origins"].requires_grad_(True)
        tb["directions"].requires_grad_(True)
    renderings, history = ref_model(False, tb, 0.5, compute_extras=False)
    return tb, renderings, history


def _run_ours(our_model, params, batch):
    jb = jax.tree.map(jnp.asarray, batch)
    return our_model.apply({"params": params}, None, jb, 0.5,
                           compute_extras=False, train=False)


def test_composed_forward_matches(setups):
    brightness, ref_model, our_model, params = setups
    batch = make_batch()
    _, ref_r, ref_h = _run_ref(ref_model, batch)
    our_r, our_h = _run_ours(our_model, params, batch)

    assert len(ref_r) == len(our_r) == 2
    for lvl, (rr, ro) in enumerate(zip(ref_r, our_r)):
        np.testing.assert_allclose(
            np.asarray(our_r[lvl]["rgb"]).reshape(-1, 3),
            rr["rgb"].detach().numpy().reshape(-1, 3),
            atol=2e-4, rtol=1e-4,
            err_msg=f"rgb level {lvl} (brightness={brightness})")
        np.testing.assert_allclose(
            np.asarray(our_r[lvl]["acc"]).reshape(-1),
            rr["acc"].detach().numpy().reshape(-1), atol=2e-4, rtol=1e-4,
            err_msg=f"acc level {lvl}")
        np.testing.assert_allclose(
            np.asarray(our_r[lvl]["depth"]).reshape(-1),
            rr["depth"].detach().numpy().reshape(-1), atol=5e-3, rtol=1e-3,
            err_msg=f"depth level {lvl}")

    # The level-loop bookkeeping: resampled sdist and alpha weights per
    # level (this is what "level-loop wiring is validated" means).
    for lvl, (hr, ho) in enumerate(zip(ref_h, our_h)):
        np.testing.assert_allclose(
            np.asarray(ho["sdist"]), hr["sdist"].detach().numpy(),
            atol=1e-5, rtol=1e-5, err_msg=f"sdist level {lvl}")
        np.testing.assert_allclose(
            np.asarray(ho["weights"]), hr["weights"].detach().numpy(),
            atol=2e-4, rtol=1e-4, err_msg=f"weights level {lvl}")


def test_composed_input_gradients_match(setups):
    """d loss / d directions and d loss / d viewdirs agree.  NOTE on
    origins: the reference's contraction is wrapped in @torch.no_grad()
    (coord.py:75 track_linearize), so NEITHER side propagates gradients
    from the field back to ray origins — torch reports grad None, we report
    exact zeros; asserted equivalent below.  Directions still receive
    gradients via compute_alpha_weights' |directions| and the viewdir
    branch."""
    brightness, ref_model, our_model, params = setups
    batch = make_batch()

    tb = torch_batch(batch)
    for k in ("origins", "directions", "viewdirs"):
        tb[k].requires_grad_(True)
    ref_r, _ = ref_model(False, tb, 0.5, compute_extras=False)
    loss_t = sum(r["rgb"].reshape(-1, 3).sum() for r in ref_r)
    loss_t.backward()
    assert tb["origins"].grad is None  # the documented contraction carve-out
    g_dirs_t = tb["directions"].grad.numpy()
    g_view_t = tb["viewdirs"].grad.numpy()

    def loss_fn(origins, directions, viewdirs):
        jb = jax.tree.map(jnp.asarray, batch)
        jb = dict(jb, origins=origins, directions=directions,
                  viewdirs=viewdirs)
        renderings, _ = our_model.apply(
            {"params": params}, None, jb, 0.5, compute_extras=False,
            train=False)
        return sum(r["rgb"].reshape(-1, 3).sum() for r in renderings)

    g_origins, g_dirs, g_view = jax.grad(loss_fn, argnums=(0, 1, 2))(
        jnp.asarray(batch["origins"]), jnp.asarray(batch["directions"]),
        jnp.asarray(batch["viewdirs"]))

    np.testing.assert_array_equal(np.asarray(g_origins), 0.0)
    scale = max(np.abs(g_dirs_t).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(g_dirs) / scale,
                               g_dirs_t / scale, atol=5e-3,
                               err_msg="d loss / d directions")
    scale = max(np.abs(g_view_t).max(), 1e-3)
    np.testing.assert_allclose(np.asarray(g_view) / scale,
                               g_view_t / scale, atol=5e-3,
                               err_msg="d loss / d viewdirs")


def test_composed_param_gradients_match(setups):
    """Gradients reaching the learnable weights (density layers + rgb head)
    agree — the training signal, not just the forward values."""
    brightness, ref_model, our_model, params = setups
    batch = make_batch()

    tb, ref_r, _ = _run_ref(ref_model, batch)
    loss_t = sum(r["rgb"].reshape(-1, 3).sum() for r in ref_r)
    ref_model.zero_grad()
    loss_t.backward()

    def loss_fn(p):
        renderings, _ = our_model.apply(
            {"params": p}, None, jax.tree.map(jnp.asarray, batch), 0.5,
            compute_extras=False, train=False)
        return sum(r["rgb"].reshape(-1, 3).sum() for r in renderings)

    grads = jax.grad(loss_fn)(params)

    pairs = [
        (("nerf_mlp", "density_hidden"), ref_model.nerf_mlp.density_layer[0]),
        (("nerf_mlp", "rgb_layer"), ref_model.nerf_mlp.rgb_layer),
        (("prop_mlp_0", "density_hidden"),
         ref_model.get_submodule("prop_mlp_0").density_layer[0]),
    ]
    if brightness:
        pairs.append((("brightness_corr", "latent_code"),
                      ref_model.brightness_corr.latent_code))
    for path, tparam in pairs:
        node = grads
        for p in path:
            node = node[p]
        ours = np.asarray(node["kernel"]).T if isinstance(node, dict) \
            else np.asarray(node)
        theirs = (tparam.weight.grad if hasattr(tparam, "weight")
                  else tparam.grad).numpy()
        scale = max(np.abs(theirs).max(), 1e-4)
        np.testing.assert_allclose(ours / scale, theirs / scale, atol=1e-2,
                                   err_msg=f"param grad {path}")
