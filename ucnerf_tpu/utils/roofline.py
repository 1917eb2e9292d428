"""Roofline accounting: FLOPs / HBM bytes per train or render step, and the
derived MFU + bandwidth-utilization scoreboard.

Two byte models (PERF_NOTES.md):
- XLA cost analysis of the compiled programs — counts each operand/output
  once per op at ideal granularity, an OPTIMISTIC floor for irregular
  gathers.
- A hand model of the hash-encode gather traffic: lookups/step from the
  config's sampling geometry, at ideal row bytes AND at the native-gather
  granularity (one (8,128) f32 tile = 4 KiB per index, what XLA's gather on
  a [C, rows] table actually reads — tools/probe_gather.py measured 84% of
  HBM peak at exactly that granularity).

Peaks are TPU v5e: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

from __future__ import annotations

PEAK_FLOPS = 197e12
PEAK_BW = 819e9
GATHER_TILE_BYTES = 8 * 128 * 4


def sum_cost(compiled):
    """(flops, bytes accessed) from a jax compiled object."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def gather_model(cfg, batch_size=None):
    """Hash-encode lookup count + bytes per train step from the config."""
    batch_size = batch_size or cfg.batch_size
    mcfg = cfg.model
    lookups = 0
    ideal = 0
    for level in range(mcfg.num_levels):
        is_prop = level < mcfg.num_levels - 1
        n_samples = (mcfg.num_prop_samples if is_prop
                     else mcfg.num_nerf_samples)
        mlp = cfg.prop_mlp if is_prop else cfg.nerf_mlp
        if is_prop:
            mlp = mlp.with_grid(mcfg.prop_desired_grid_size[level])
        hex_n = 1 if mlp.hex_single_query else 6
        n = batch_size * n_samples * hex_n * mlp.grid_num_levels * 8
        lookups += n
        ideal += n * mlp.grid_level_dim * 4
    return dict(lookups=lookups, ideal_bytes=ideal,
                tile_bytes=lookups * GATHER_TILE_BYTES)


def train_step_cost(cfg, model, params, state, batch):
    """(flops, bytes) of one full train step, compiled at the microbatch
    granularity both presets execute (grad program x num_micro + update)."""
    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.train import losses as losses_lib
    from ucnerf_tpu.train import state as state_lib

    def loss_fn(params, mb, key, train_frac):
        renderings, ray_history = model.apply(
            {"params": params}, key, mb, train_frac,
            compute_extras=False, train=True)
        total, losses, stats = losses_lib.compute_all_losses(
            mb, renderings, ray_history, cfg)
        return total, (losses, stats)

    num_micro = max(cfg.microbatches, 1)
    mb = jax.tree.map(lambda x: x[:x.shape[0] // num_micro], batch)
    grad_jit = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    g_flops, g_bytes = sum_cost(
        grad_jit.lower(params, mb, jax.random.PRNGKey(1),
                       jnp.float32(0.5)).compile())

    tx = state_lib.create_optimizer(cfg)

    def update_fn(state, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state_lib.TrainState(step=state.step + 1, params=new_params,
                                    opt_state=opt_state)

    grads_like = jax.tree.map(jnp.zeros_like, params)
    u_flops, u_bytes = sum_cost(
        jax.jit(update_fn).lower(state, grads_like).compile())
    return g_flops * num_micro + u_flops, g_bytes * num_micro + u_bytes


def metrics(dt, flops, bytes_, gm=None):
    """Scoreboard dict for one measured step time."""
    out = {
        "mfu": round(flops / dt / PEAK_FLOPS, 4),
        "hbm_util_xla": round(bytes_ / dt / PEAK_BW, 4),
    }
    if gm is not None:
        out["hbm_util_gather_tile"] = round(
            gm["tile_bytes"] / dt / PEAK_BW, 4)
        out["gather_lookups_per_step"] = gm["lookups"]
    return out
