"""Roofline scoreboard CLI: MFU + HBM-bandwidth utilization per train/render
step for the flagship and reference-exact presets (core accounting lives in
ucnerf_tpu/utils/roofline.py; bench.py emits the same numbers in its extras).

Usage:  python tools/roofline.py [--preset flagship|exact|both]
            [--batch-size 15000] [--steps 10]
Emits a markdown table + one JSON line for PERF_NOTES.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def measure_train(cfg, steps, warmup):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib
    from ucnerf_tpu.utils import roofline

    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(cfg, params)
    train_step = step_lib.make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray,
                         step_lib.dummy_batch(cfg, cfg.batch_size))
    flops, bytes_ = roofline.train_step_cost(cfg, model, params, state, batch)

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
    from ucnerf_tpu.utils import roofline

    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    eval_step = step_lib.make_eval_step(model, cfg)
    n = cfg.render_chunk_size
    batch = jax.tree.map(jnp.asarray, step_lib.dummy_batch(cfg, n))
    flops, bytes_ = roofline.sum_cost(
        eval_step.lower(params, batch, 1.0, 0).compile())

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
    from ucnerf_tpu.utils import roofline

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
        gm = roofline.gather_model(cfg)
        dt, flops, bytes_ = measure_train(cfg, args.steps, args.warmup)
        rows.append(dict(
            name=f"train_{name}",
            rays_per_sec=round(cfg.batch_size / dt, 1),
            step_ms=round(dt * 1e3, 1),
            xla_flops=flops, xla_bytes=bytes_,
            **roofline.metrics(dt, flops, bytes_, gm)))
        if not args.skip_render:
            dt, flops, bytes_ = measure_render(cfg, args.chunks, args.warmup)
            gm_r = roofline.gather_model(cfg,
                                         batch_size=cfg.render_chunk_size)
            rows.append(dict(
                name=f"render_{name}",
                rays_per_sec=round(cfg.render_chunk_size / dt, 1),
                step_ms=round(dt * 1e3, 1),
                xla_flops=flops, xla_bytes=bytes_,
                **roofline.metrics(dt, flops, bytes_, gm_r)))

    hdr = ["name", "rays_per_sec", "step_ms", "mfu", "hbm_util_xla",
           "hbm_util_gather_tile"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    for r in rows:
        print("| " + " | ".join(str(r.get(k, "")) for k in hdr) + " |")
    print(json.dumps({"roofline": rows}))


if __name__ == "__main__":
    main()
