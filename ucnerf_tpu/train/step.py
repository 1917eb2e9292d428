"""Jitted train/eval steps and the distributed image renderer.

The reference's train loop body (``train.py:142-230``) — forward, ten loss
terms, backward, clip, Adam — compiles here into ONE XLA program, sharded over
the ray axis of a device mesh.  Gradients are all-reduced by the psum pjit
inserts for replicated params; there is no explicit collective code
(SURVEY.md §2.4 TPU-native mapping).

``render_image`` replaces the reference's chunked multi-process renderer
(models.py:907-1007): rays are chunked on host, each chunk is rendered by the
same sharded jit program, and results concatenate on host.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.configs import Config
from ucnerf_tpu.models.model import UCNeRFModel
from ucnerf_tpu.parallel import mesh as meshlib
from ucnerf_tpu.train import losses as losses_lib
from ucnerf_tpu.train import state as state_lib


def init_model(config: Config, key, example_batch=None):
    """Construct the model and initialize parameters.

    The init is jitted: unjitted flax init dispatches thousands of tiny eager
    ops, which is pathologically slow through a remote TPU tunnel.
    """
    model = UCNeRFModel(config)
    if example_batch is None:
        example_batch = dummy_batch(config, 4)
    example_batch = jax.tree.map(jnp.asarray, example_batch)
    init_fn = jax.jit(
        lambda k, b: model.init(k, None, b, 1.0, train=False))
    params = init_fn(key, example_batch)["params"]
    return model, params


def dummy_batch(config: Config, n: int) -> Dict[str, jnp.ndarray]:
    """A synthetic ray batch with the canonical layout.

    Rays are spatially diverse (random directions from a few camera
    positions), matching real training batches: a degenerate all-identical
    batch would concentrate every hash-table access on a handful of rows and
    misrepresent gather/scatter costs on hardware.
    """
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    origins = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    return {
        "origins": origins,
        "directions": d.copy(),
        "viewdirs": d.copy(),
        "cam_dirs": d.copy(),
        "radii": np.full((n, 1), 1e-3, np.float32),
        "near": np.full((n, 1), config.near, np.float32),
        "far": np.full((n, 1), config.far, np.float32),
        "cam_idx": (rng.integers(0, max(config.training_views, 1), n)
                    .astype(np.int32)),
        "phys_cam_idx": (rng.integers(0, max(config.num_phys_cams, 1), n)
                         .astype(np.int32)),
        "lossmult": np.ones((n, 1), np.float32),
        "rgb": np.full((n, 3), 0.5, np.float32),
        "sky_segs": np.zeros((n,), np.float32),
    }


def make_train_step(model: UCNeRFModel, config: Config, mesh=None):
    """Build the jitted train step: (state, batch, key, train_frac) -> ...

    With a mesh, the batch is sharded along rays and the state replicated;
    XLA inserts the gradient all-reduce.
    """
    tx = state_lib.create_optimizer(config)

    def loss_fn(params, batch, key, train_frac):
        renderings, ray_history = model.apply(
            {"params": params}, key, batch, train_frac,
            compute_extras=False, train=True)
        total, losses, stats = losses_lib.compute_all_losses(
            batch, renderings, ray_history, config)
        return total, (losses, stats)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    num_micro = max(config.microbatches, 1)

    def compute_grads(params, batch, key, train_frac):
        if num_micro == 1:
            (total, (losses, stats)), grads = grad_fn(params, batch, key,
                                                      train_frac)
            return total, losses, stats, grads

        # Microbatch gradient accumulation: reshape the ray axis to
        # [num_micro, -1] and scan; since every loss term is a mean over
        # rays (or independent of them), the averaged gradient equals the
        # full-batch gradient exactly.
        micro = jax.tree.map(
            lambda x: x.reshape((num_micro, x.shape[0] // num_micro)
                                + x.shape[1:]), batch)
        keys = jax.random.split(key, num_micro)

        def body(carry, xs):
            acc_grads, acc_total, acc_losses, acc_stats = carry
            mb, k = xs
            (total, (losses, stats)), grads = grad_fn(params, mb, k,
                                                      train_frac)
            acc = jax.tree.map(jnp.add, acc_grads, grads)
            return (acc, acc_total + total,
                    jax.tree.map(jnp.add, acc_losses, losses),
                    jax.tree.map(jnp.add, acc_stats, stats)), None

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        mb0 = jax.tree.map(lambda x: x[0], micro)
        # Structure-only evaluation for the loss/stat accumulators.
        (_, (losses_s, stats_s)), _ = jax.eval_shape(
            grad_fn, params, mb0, keys[0], train_frac)
        zeros = lambda t: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), t)
        (grads, total, losses, stats), _ = jax.lax.scan(
            body, (zero_grads, jnp.zeros(()), zeros(losses_s),
                   zeros(stats_s)), (micro, keys))
        inv = 1.0 / num_micro
        scale = lambda t: jax.tree.map(lambda x: x * inv, t)
        return total * inv, scale(losses), scale(stats), scale(grads)

    def train_step(state, batch, key, train_frac):
        total, losses, stats, grads = compute_grads(
            state.params, batch, key, train_frac)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state_lib.TrainState(
            step=state.step + 1, params=params, opt_state=opt_state)
        stats = dict(stats, loss=total, losses=losses)
        return new_state, stats

    if config.host_microbatches and num_micro > 1:
        return _make_host_microbatch_step(config, grad_fn, tx, mesh,
                                          num_micro)

    if mesh is None:
        return jax.jit(train_step,
                       donate_argnums=(0,) if config.donate_train_state else ())
    repl = meshlib.replicated_sharding(mesh)
    data = meshlib.batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if config.donate_train_state else ())


def _make_host_microbatch_step(config: Config, grad_fn, tx, mesh, num_micro):
    """Microbatch accumulation driven from host: one short device program per
    microbatch plus one update program, instead of a single long scan.

    Semantically identical to the scanned path (each loss is a ray-mean);
    used when a single fused step would exceed per-program runtime limits of
    the execution environment.
    """
    repl = meshlib.replicated_sharding(mesh) if mesh is not None else None
    data = meshlib.batch_sharding(mesh) if mesh is not None else None

    def micro_fn(params, acc, mb, k, train_frac):
        (total, (losses, stats)), grads = grad_fn(params, mb, k, train_frac)
        acc = jax.tree.map(jnp.add, acc, grads)
        return acc, total, losses, stats

    def update_fn(state, grads, totals, losses, stats):
        inv = 1.0 / num_micro
        grads = jax.tree.map(lambda g: g * inv, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state_lib.TrainState(
            step=state.step + 1, params=params, opt_state=opt_state)
        mean = lambda t: jax.tree.map(lambda x: x * inv, t)
        out_stats = dict(mean(stats), loss=totals * inv,
                         losses=mean(losses))
        return new_state, out_stats

    # Donate either the state (params/mu/nu alias the new state's buffers)
    # or, when the state must be kept, the grads (they can alias the new
    # params instead).  Donating BOTH leaves the grads with no output to
    # alias — XLA then warns "some donated buffers were not usable" for the
    # whole param-shaped tree every step.
    update_donate = (0,) if config.donate_train_state else (1,)
    if mesh is None:
        micro_jit = jax.jit(micro_fn, donate_argnums=(1,))
        update_jit = jax.jit(update_fn, donate_argnums=update_donate)
    else:
        micro_jit = jax.jit(micro_fn,
                            in_shardings=(repl, repl, data, repl, repl),
                            donate_argnums=(1,))
        update_jit = jax.jit(update_fn, donate_argnums=update_donate)

    def train_step(state, batch, key, train_frac):
        micro = jax.tree.map(
            lambda x: x.reshape((num_micro, x.shape[0] // num_micro)
                                + x.shape[1:]), batch)
        keys = jax.random.split(key, num_micro)
        acc = jax.tree.map(jnp.zeros_like, state.params)
        totals = jnp.zeros(())
        losses_acc = None
        stats_acc = None
        for i in range(num_micro):
            mb = jax.tree.map(lambda x: x[i], micro)
            acc, total, losses, stats = micro_jit(state.params, acc, mb,
                                                  keys[i], train_frac)
            totals = totals + total
            if losses_acc is None:
                losses_acc, stats_acc = losses, stats
            else:
                losses_acc = jax.tree.map(jnp.add, losses_acc, losses)
                stats_acc = jax.tree.map(jnp.add, stats_acc, stats)
        return update_jit(state, acc, totals, losses_acc, stats_acc)

    return train_step


def make_eval_step(model: UCNeRFModel, config: Config, mesh=None,
                   compute_extras=True):
    """Build the jitted eval render step over one ray chunk.

    eval_camidx is a TRACED int32 scalar, not a static argument: the eval
    CLI remaps every test image to a different training latent
    (cli/eval._eval_camidx), and a static camidx forced one full XLA
    recompile per test image (~minutes each on the canonical architecture).
    """
    # Eval never differentiates, so the grid BACKWARD knobs only change the
    # forward graph's shape — and the round-5 fused gather+wsum boundary's
    # primal renders ~14% slower than the plain per-level path (17510 vs
    # 15019 rays/s flagship, measured).  Rebuild the model with the knobs
    # off: the parameter tree and forward values are identical.
    mlpcfgs = (config.nerf_mlp, config.prop_mlp)
    if any(c.grid_bwd_dense_sample or c.grid_bwd_value_dtype
           for c in mlpcfgs):
        import dataclasses
        off = dict(grid_bwd_dense_sample=False, grid_bwd_value_dtype=None)
        config = dataclasses.replace(
            config,
            nerf_mlp=dataclasses.replace(config.nerf_mlp, **off),
            prop_mlp=dataclasses.replace(config.prop_mlp, **off))
        model = UCNeRFModel(config)

    def eval_one(params, batch, train_frac, eval_camidx):
        renderings, ray_history = model.apply(
            {"params": params}, None, batch, train_frac,
            compute_extras=compute_extras, train=False,
            eval_camidx=jnp.asarray(eval_camidx, jnp.int32))
        out = dict(renderings[-1])
        out.pop("weights", None)
        out.pop("sky_rgbs", None)
        out.pop("affine_trans", None)
        out.pop("affine_trans_sky", None)
        return out

    sub = max(config.render_subchunks, 1)

    def eval_step(params, batch, train_frac, eval_camidx):
        if sub == 1:
            return eval_one(params, batch, train_frac, eval_camidx)
        # In-graph sub-chunk scan: activation peak is one sub-chunk's, but
        # the whole chunk renders in ONE device program (Config
        # docstring; round-3 verdict item 4b).
        n = batch["origins"].shape[0]
        micro = jax.tree.map(
            lambda x: x.reshape((sub, n // sub) + x.shape[1:]), batch)
        out = jax.lax.map(
            lambda mb: eval_one(params, mb, train_frac, eval_camidx), micro)
        return jax.tree.map(
            lambda x: x.reshape((n,) + x.shape[2:]), out)

    if mesh is None:
        return jax.jit(eval_step)
    repl = meshlib.replicated_sharding(mesh)
    data = meshlib.batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(repl, data, repl, repl),
                   out_shardings=repl)


def render_image(eval_step, params, batch, config: Config, train_frac=1.0,
                 eval_camidx=0, mesh=None):
    """Render all rays of an image by chunking through the jitted eval step.

    Args:
      eval_step: from make_eval_step.
      batch: dict of [H, W, ...] ray arrays (host numpy).
      eval_camidx: brightness-correction view id for this render.

    Returns:
      dict of [H, W, ...] numpy arrays.
    """
    height, width = batch["origins"].shape[:2]
    num_rays = height * width
    flat = {k: np.asarray(v).reshape((num_rays,) + v.shape[2:])
            for k, v in batch.items() if v is not None}

    chunk = config.render_chunk_size
    mesh_size = mesh.devices.size if mesh is not None else 1
    # Chunks must split evenly into the in-graph sub-chunk scan too.
    pad_multiple = mesh_size * max(config.render_subchunks, 1)
    outs = []
    for i0 in range(0, num_rays, chunk):
        chunk_batch = {k: v[i0:i0 + chunk] for k, v in flat.items()}
        chunk_batch, pad = meshlib.pad_rays_to_multiple(chunk_batch,
                                                        pad_multiple)
        if mesh is not None:
            chunk_batch = meshlib.shard_batch(chunk_batch, mesh)
        out = eval_step(params, chunk_batch, train_frac, eval_camidx)
        # Eval reassembly: valid on every process whether outputs come back
        # replicated or sharded (parallel/mesh.fetch_to_host).
        out = jax.tree.map(meshlib.fetch_to_host, out)
        if pad:
            out = jax.tree.map(lambda x: x[:-pad], out)
        outs.append(out)

    rendering = {}
    for k in outs[0]:
        z = np.concatenate([o[k] for o in outs], axis=0)
        rendering[k] = z.reshape((height, width) + z.shape[1:])
    return rendering
