"""Roofline scoreboard: MFU + HBM-bandwidth utilization per train/render step.

Round-2 verdict: "No MFU / roofline number anywhere ... without it, nobody
can say whether 7.7k rays/s is 80% of speed-of-light or 8%."  This tool
produces those numbers from two independent sources:

1. **XLA cost analysis** of the compiled programs (flops + bytes accessed,
   summed over the microbatch-gradient program x num_micro + the update
   program, or the render program).  XLA's byte model counts each operand /
   output once per op at ideal granularity — it under-counts the real HBM
   traffic of random-access gathers, so it is an OPTIMISTIC bytes floor.
2. **A hand model of the hash-table gather/scatter traffic** (the dominant
   irregular op): lookups/step derived from the config's sampling geometry,
   at two granularities — ideal row bytes (level_dim x 4B) and TPU
   gather-tile bytes ((8, 128) f32 tile per index = 4 KiB), which is what a
   native XLA gather on a [C, rows] table actually reads per lookup.

Wall time per step (measured, dispatch-overlapped) then gives
    MFU     = flops / dt / PEAK_FLOPS
    BW-util = bytes / dt / PEAK_BW
for each source.  TPU v5e peaks: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage:  python tools/roofline.py [--preset flagship|exact|both]
            [--batch-size 15000] [--steps 10]
Emits a markdown table + one JSON line for PERF_NOTES / BENCH extras.
"""

from __future__ import annotations

import argparse
import json
import time

PEAK_FLOPS = 197e12      # v5e bf16 MXU
PEAK_BW = 819e9          # v5e HBM bytes/s
GATHER_TILE_BYTES = 8 * 128 * 4   # one (8,128) f32 tile per gathered index


def _sum_cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def gather_model(cfg):
    """Hash-encode lookups per train step from the sampling geometry."""
    mcfg = cfg.model
    lookups = 0
    levels = []
    for level in range(mcfg.num_levels):
        is_prop = level < mcfg.num_levels - 1
        n_samples = (mcfg.num_prop_samples if is_prop
                     else mcfg.num_nerf_samples)
        mlp = cfg.prop_mlp if is_prop else cfg.nerf_mlp
        hex_n = 1 if mlp.hex_single_query else 6
        n = (cfg.batch_size * n_samples * hex_n
             * mlp.grid_num_levels * 8)
        lookups += n
        levels.append(dict(level=level, samples=n_samples, hex=hex_n,
                           grid_levels=mlp.grid_num_levels, lookups=n,
                           level_dim=mlp.grid_level_dim))
    # Per level_dim ideal bytes; use the nerf MLP's level_dim for the
    # aggregate (prop/nerf may differ -- sum per level instead).
    ideal = sum(l["lookups"] * l["level_dim"] * 4 for l in levels)
    tile = lookups * GATHER_TILE_BYTES
    # Backward: the scatter writes each gradient-table tile once (one pass
    # over the table) + streams the sorted updates (idx 4B + C x 4B values,
    # x2 for the sort's read+write, roughly).
    return dict(lookups=lookups, ideal_bytes=ideal, tile_bytes=tile,
                levels=levels)


def build_programs(cfg):
    """Compile the microbatch-grad + update programs (host-microbatch
    decomposition — the shape both presets actually run) and return
    (train_step_callable, per-step (flops, bytes), state, batch, misc)."""
    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib
    from ucnerf_tpu.train import losses as losses_lib

    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(cfg, params)
    train_step = step_lib.make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray,
                         step_lib.dummy_batch(cfg, cfg.batch_size))

    # Mirror of make_train_step's grad_fn for cost analysis at microbatch
    # granularity (the compiled unit of the host-microbatch step).
    def loss_fn(params, mb, key, train_frac):
        renderings, ray_history = model.apply(
            {"params": params}, key, mb, train_frac,
            compute_extras=False, train=True)
        total, losses, stats = losses_lib.compute_all_losses(
            mb, renderings, ray_history, cfg)
        return total, (losses, stats)

    num_micro = max(cfg.microbatches, 1)
    mb = jax.tree.map(
        lambda x: x[:x.shape[0] // num_micro], batch)
    grad_jit = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    compiled = grad_jit.lower(params, mb, jax.random.PRNGKey(1),
                              jnp.float32(0.5)).compile()
    g_flops, g_bytes = _sum_cost(compiled)

    # Update program: Adam over the param tree (flops ~ O(params), bytes ~
    # 3 passes over params+mu+nu); measured from a compiled replica.
    tx = state_lib.create_optimizer(cfg)

    def update_fn(state, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state_lib.TrainState(step=state.step + 1, params=params,
                                    opt_state=opt_state)

    grads_like = jax.tree.map(jnp.zeros_like, params)
    u_compiled = jax.jit(update_fn).lower(state, grads_like).compile()
    u_flops, u_bytes = _sum_cost(u_compiled)

    step_flops = g_flops * num_micro + u_flops
    step_bytes = g_bytes * num_micro + u_bytes
    return train_step, (step_flops, step_bytes), state, batch


def measure_train(cfg, steps, warmup):
    import jax
    import jax.numpy as jnp
    import numpy as np

    train_step, (flops, bytes_), state, batch = build_programs(cfg)
    key = jax.random.PRNGKey(1)
    for i in range(warmup):
        state, stats = train_step(state, batch, jax.random.fold_in(key, i),
                                  jnp.float32(0.5))
    float(stats["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, stats = train_step(state, batch,
                                  jax.random.fold_in(key, 100 + i),
                                  jnp.float32(0.5))
    loss = float(stats["loss"])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(loss)
    return dt, flops, bytes_


def measure_render(cfg, chunks, warmup):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucnerf_tpu.train import step as step_lib

    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    eval_step = step_lib.make_eval_step(model, cfg)
    n = cfg.render_chunk_size
    batch = jax.tree.map(jnp.asarray, step_lib.dummy_batch(cfg, n))
    compiled = eval_step.lower(params, batch, 1.0, 0).compile()
    flops, bytes_ = _sum_cost(compiled)

    for _ in range(warmup):
        out = eval_step(params, batch, 1.0, 0)
    float(jnp.sum(out["rgb"]))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(chunks):
        out = eval_step(params, batch, 1.0, 0)
        acc = acc + out["rgb"]
    total = float(jnp.sum(acc))
    dt = (time.perf_counter() - t0) / chunks
    assert np.isfinite(total)
    return dt, flops, bytes_


def report(name, dt, flops, bytes_, rays, gm=None):
    row = {
        "name": name,
        "rays_per_sec": round(rays / dt, 1),
        "step_ms": round(dt * 1e3, 1),
        "xla_flops_per_step": flops,
        "xla_bytes_per_step": bytes_,
        "mfu": round(flops / dt / PEAK_FLOPS, 4),
        "hbm_util_xla": round(bytes_ / dt / PEAK_BW, 4),
    }
    if gm is not None:
        row["gather_lookups"] = gm["lookups"]
        row["gather_ideal_gb"] = round(gm["ideal_bytes"] / 1e9, 3)
        row["gather_tile_gb"] = round(gm["tile_bytes"] / 1e9, 3)
        row["hbm_util_gather_tile"] = round(
            gm["tile_bytes"] / dt / PEAK_BW, 4)
    return row


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="both",
                        choices=["flagship", "exact", "both"])
    parser.add_argument("--batch-size", type=int, default=15000)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--chunks", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--skip-render", action="store_true")
    parser.add_argument("--binding", "-b", action="append", default=[])
    args = parser.parse_args()

    from ucnerf_tpu import configs

    presets = {}
    if args.preset in ("flagship", "both"):
        presets["flagship"] = configs.parse_bindings(
            configs.waymo_tpu(batch_size=args.batch_size), args.binding)
    if args.preset in ("exact", "both"):
        presets["exact"] = configs.parse_bindings(
            configs.waymo(batch_size=args.batch_size, host_microbatches=True,
                          render_chunk_size=2500), args.binding)

    rows = []
    for name, cfg in presets.items():
        gm = gather_model(cfg)
        dt, flops, bytes_ = measure_train(cfg, args.steps, args.warmup)
        rows.append(report(f"train_{name}", dt, flops, bytes_,
                           cfg.batch_size, gm))
        if not args.skip_render:
            dt, flops, bytes_ = measure_render(cfg, args.chunks, args.warmup)
            rows.append(report(f"render_{name}", dt, flops, bytes_,
                               cfg.render_chunk_size))

    hdr = ["name", "rays_per_sec", "step_ms", "mfu", "hbm_util_xla",
           "hbm_util_gather_tile"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| " + " | ".join(str(r.get(k, "")) for k in hdr) + " |")
    print(json.dumps({"roofline": rows}))


if __name__ == "__main__":
    main()
