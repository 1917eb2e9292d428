"""Benchmark: training throughput (rays/s) of the canonical Waymo config.

Runs the full jitted UC-NeRF train step (forward + all losses + backward +
Adam) on the canonical Waymo-100613 architecture — batch 15000 rays, 2 levels
(128 prop + 32 nerf samples), hash grids 512/8192, sky model + brightness
correction — on the available accelerator, and prints ONE JSON line.

The reference repo publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported as the ratio to the north-star bookkeeping value of 1.0 until a
measured PyTorch/GPU baseline lands in BASELINE.json.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=15000)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--binding", "-b", action="append", default=[],
                        help="config override, e.g. 'Config.microbatches = 4'")
    parser.add_argument("--preset", default="waymo_tpu",
                        help="waymo_tpu (flagship, default) | waymo "
                             "(reference-exact hex encoding)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucnerf_tpu import configs
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib

    cfg = configs._PRESETS[args.preset](batch_size=args.batch_size)
    cfg = configs.parse_bindings(cfg, args.binding)
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(cfg, params)
    train_step = step_lib.make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray, step_lib.dummy_batch(cfg, cfg.batch_size))

    key = jax.random.PRNGKey(1)
    for i in range(args.warmup):
        state, stats = train_step(state, batch, jax.random.fold_in(key, i),
                                  jnp.float32(0.5))
    # Force completion with a host fetch: block_until_ready is not reliable
    # through remote-execution tunnels.
    float(stats["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, stats = train_step(state, batch,
                                  jax.random.fold_in(key, 100 + i),
                                  jnp.float32(0.5))
    # The state threads through every step, so fetching the final loss
    # forces the whole chain.
    final_loss = float(stats["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), final_loss

    steps_per_sec = args.steps / dt
    rays_per_sec = cfg.batch_size * steps_per_sec
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 1.0, 1),
    }))


if __name__ == "__main__":
    main()
