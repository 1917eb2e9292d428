"""Benchmark: train + render throughput (rays/s) of the canonical Waymo
architecture, in both encoding modes.

Measures four numbers on the available accelerator and prints ONE JSON line:

  - train rays/s, ``waymo_tpu`` preset (flagship: single-query hex encoding)
  - train rays/s, ``waymo`` preset (reference-exact 6-point hex encoding)
  - render rays/s for both presets (the north star is train AND render,
    BASELINE.md)

Both train steps run the full pipeline (forward + all losses + backward +
Adam) at batch 15000 rays, 2 levels (128 prop + 32 nerf samples), hash grids
512/8192, sky model + brightness correction.  The exact-hex preset is run
with host microbatches: a monolithic program at this size crashes the v5e
backend compiler (regalloc RET_CHECK — see configs.synthetic_quality).

The primary metric is the flagship train rays/s; ``vs_baseline`` is the
ratio to round 1's recorded 8138.2 rays/s (BENCH_r01.json) on the same
preset/chip.  The remaining measurements ride along in ``extra``.
"""

from __future__ import annotations

import argparse
import json
import time

BASELINE_R01_TRAIN_RAYS_PER_SEC = 8138.2


def _measure_train(cfg, steps, warmup, roofline_out=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib

    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(cfg, params)
    train_step = step_lib.make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray,
                         step_lib.dummy_batch(cfg, cfg.batch_size))

    key = jax.random.PRNGKey(1)
    for i in range(warmup):
        state, stats = train_step(state, batch, jax.random.fold_in(key, i),
                                  jnp.float32(0.5))
    # Force completion with a host fetch: block_until_ready is not reliable
    # through remote-execution tunnels.
    float(stats["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, stats = train_step(state, batch,
                                  jax.random.fold_in(key, 100 + i),
                                  jnp.float32(0.5))
    # The state threads through every step, so fetching the final loss
    # forces the whole chain.
    final_loss = float(stats["loss"])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(final_loss), final_loss

    if roofline_out is not None:
        # MFU / HBM-utilization scoreboard (utils/roofline.py); compiling
        # the cost-analysis replicas must not lose the rays/s number.
        try:
            from ucnerf_tpu.utils import roofline
            flops, bytes_ = roofline.train_step_cost(cfg, model, params,
                                                     state, batch)
            roofline_out.update(roofline.metrics(
                dt, flops, bytes_, roofline.gather_model(cfg)))
        except Exception:  # pragma: no cover - backend-dependent
            import traceback
            traceback.print_exc()
    return cfg.batch_size / dt


def _measure_render(cfg, chunks, warmup):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucnerf_tpu.train import step as step_lib

    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    eval_step = step_lib.make_eval_step(model, cfg)
    n = cfg.render_chunk_size
    batch = jax.tree.map(jnp.asarray, step_lib.dummy_batch(cfg, n))

    for _ in range(warmup):
        out = eval_step(params, batch, 1.0, 0)
    float(jnp.sum(out["rgb"]))

    # Median of 3 timed repeats: single-window render timings on the
    # tunneled chip swing up to +/-1.5x (PERF_NOTES round 3) from host-side
    # dispatch hiccups, so one block mis-states the round.  Each repeat
    # times max(4, chunks // 2) renders; the median is reported.
    per_repeat = max(4, chunks // 2)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(per_repeat):
            out = eval_step(params, batch, 1.0, 0)
            acc = acc + out["rgb"]
        total = float(jnp.sum(acc))
        dt = time.perf_counter() - t0
        assert np.isfinite(total), total
        rates.append(n * per_repeat / dt)
    return float(np.median(rates))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=15000)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--chunks", type=int, default=20,
                        help="render chunk budget; each timed repeat renders "
                             "max(4, chunks // 2) chunks (floor, min 4)")
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--binding", "-b", action="append", default=[],
                        help="config override, e.g. 'Config.microbatches=4'")
    parser.add_argument("--only", default=None,
                        choices=[None, "flagship", "exact"],
                        help="limit to one preset (debugging)")
    args = parser.parse_args()

    from ucnerf_tpu import configs

    flagship = configs.parse_bindings(
        configs.waymo_tpu(batch_size=args.batch_size), args.binding)
    # Reference-exact hex encoding; host microbatches so the train program
    # compiles (see module docstring).  The render measures the CANONICAL
    # 15000-ray chunk (reference models.py:943) via the in-graph sub-chunk
    # scan: the monolithic 6-hex forward at chunk 15000 needs ~23 GB of
    # activations (HBM OOM on one 16 GB v5e, PERF_NOTES round 3);
    # render_subchunks=6 bounds the activation peak at 2500-ray scale while
    # rendering the full chunk in ONE device program.
    # microbatches=15 / subchunks=12: the 10-microbatch exact train step
    # landed 46 MB over the 15.75 GB HBM budget after the per-level-gather
    # change; 1250-ray programs (m=12) fit with margin, and the round-4
    # scan-length sweep then measured 1000-ray programs 9% faster still
    # (m=12 1457, m=15 1589+/-0.2 over two runs, m=20 1584 rays/s).
    exact = configs.parse_bindings(
        configs.waymo(batch_size=args.batch_size, host_microbatches=True,
                      microbatches=15, render_chunk_size=15000,
                      render_subchunks=12),
        args.binding)

    extra = {}

    def record(key, fn, *fn_args, **fn_kwargs):
        # A single measurement failing (e.g. a backend-compiler limit on one
        # program shape) must not lose the other numbers.
        import traceback
        try:
            extra[key] = round(fn(*fn_args, **fn_kwargs), 1)
        except Exception as exc:  # pragma: no cover - hardware-dependent
            traceback.print_exc()
            extra[key + "_error"] = f"{type(exc).__name__}"

    if args.only != "exact":
        rf = {}
        record("train_rays_per_sec_flagship", _measure_train, flagship,
               args.steps, args.warmup, roofline_out=rf)
        extra.update({f"flagship_{k}": v for k, v in rf.items()})
        record("render_rays_per_sec_flagship", _measure_render, flagship,
               args.chunks, args.warmup)
    if args.only != "flagship":
        rf = {}
        record("train_rays_per_sec_exact_hex", _measure_train, exact,
               args.steps, args.warmup, roofline_out=rf)
        extra.update({f"exact_{k}": v for k, v in rf.items()})
        record("render_rays_per_sec_exact_hex", _measure_render, exact,
               args.chunks, args.warmup)

    primary = extra.get("train_rays_per_sec_flagship",
                        extra.get("train_rays_per_sec_exact_hex", 0.0))
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": primary,
        "unit": "rays/s",
        "vs_baseline": round(primary / BASELINE_R01_TRAIN_RAYS_PER_SEC, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
