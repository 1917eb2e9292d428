"""Weak-scaling harness: sharded-train-step throughput vs mesh size.

The north star (BASELINE.md) asks for >90% scaling efficiency from 1 chip to
a 2-host v5e slice.  Real multi-chip hardware is not present in this
environment, so this tool provides the MEASUREMENT MACHINERY: it runs the
production sharded train step (ucnerf_tpu.train.step.make_train_step with a
data-parallel mesh — the same program `__graft_entry__.dryrun_multichip`
validates) at a sweep of mesh sizes with a CONSTANT PER-DEVICE batch, and
reports rays/s plus weak-scaling efficiency vs the 1-device run.

On the virtual CPU mesh (default here) the numbers validate wiring and
collective overhead ONLY — CPU "devices" share one socket's cores, so
efficiency percentages are not hardware claims.  Pointed at a real TPU
slice (run under a multi-chip runtime), the same command produces the
north-star number.

Reference counterpart: the reference scales via accelerate/DDP
(train.py:44,95) and reports train_rays_per_sec (train.py:278); it ships no
scaling harness at all.

Usage:
  python tools/scaling_bench.py --devices 1,2,4,8 --per-device-batch 256
  python tools/scaling_bench.py --preset waymo --steps 3   # canonical arch
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_devices(n: int):
    import re
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
    if m is None:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    elif int(m.group(1)) < n:
        # Override an existing smaller value (ADVICE r4: relying on
        # clear_backends() to re-read a stale flag is not guaranteed).
        os.environ["XLA_FLAGS"] = flags.replace(
            m.group(0), f"--xla_force_host_platform_device_count={n}")
    import jax
    if len(jax.devices()) < n:
        from jax.extend.backend import clear_backends
        clear_backends()
        jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= n, (
        f"need {n} devices, have {len(jax.devices())}; if a jax backend was "
        f"already initialized elsewhere, set XLA_FLAGS="
        f"--xla_force_host_platform_device_count={n} before launching")


def measure(n_devices: int, per_device_batch: int, steps: int,
            preset: str, bindings) -> float:
    """rays/s of the sharded train step on the first n_devices devices."""
    import jax
    import jax.numpy as jnp

    from ucnerf_tpu import configs
    from ucnerf_tpu.parallel import mesh as meshlib
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib

    make = getattr(configs, preset)
    cfg = configs.parse_bindings(
        make(batch_size=per_device_batch * n_devices), bindings)
    # The gradient-accumulation reshape needs batch % microbatches == 0
    # (train/step.py); the presets' microbatch counts assume batch 15000, so
    # adjust to the largest compatible divisor for this sweep's batch
    # (ADVICE r4: the default --per-device-batch crashed preset waymo).
    if cfg.microbatches > 1 and cfg.batch_size % cfg.microbatches:
        import dataclasses
        mb = next(d for d in range(min(cfg.microbatches, cfg.batch_size),
                                   0, -1) if cfg.batch_size % d == 0)
        print(f"  [mesh={n_devices}] microbatches {cfg.microbatches} does "
              f"not divide batch {cfg.batch_size}; using {mb}",
              file=sys.stderr)
        cfg = dataclasses.replace(cfg, microbatches=mb)
    mesh = meshlib.create_mesh(jax.devices()[:n_devices])

    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(cfg, params)
    train_step = step_lib.make_train_step(model, cfg, mesh=mesh)
    batch = meshlib.shard_batch(step_lib.dummy_batch(cfg, cfg.batch_size),
                                mesh)

    key = jax.random.PRNGKey(1)
    state, stats = train_step(state, batch, key, jnp.float32(0.5))
    float(stats["loss"])  # force warmup completion through the tunnel

    t0 = time.perf_counter()
    for i in range(steps):
        state, stats = train_step(state, batch, jax.random.fold_in(key, i),
                                  jnp.float32(0.5))
    assert jnp.isfinite(float(stats["loss"]))
    dt = (time.perf_counter() - t0) / steps
    return cfg.batch_size / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="1,2,4,8",
                   help="comma-separated mesh sizes to sweep")
    p.add_argument("--per-device-batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--preset", default="tiny",
                   choices=["tiny", "waymo", "waymo_tpu"])
    p.add_argument("--binding", "-b", action="append", default=[])
    args = p.parse_args()

    sizes = [int(s) for s in args.devices.split(",")]
    _ensure_devices(max(sizes))

    import jax
    backend = jax.default_backend()

    rows = []
    base = None
    for n in sizes:
        rps = measure(n, args.per_device_batch, args.steps, args.preset,
                      args.binding)
        if base is None:
            base = rps / n  # per-device rays/s at the smallest mesh
        eff = rps / (n * base)
        rows.append({"devices": n, "rays_per_sec": round(rps, 1),
                     "weak_scaling_efficiency": round(eff, 3)})
        print(f"  mesh={n:2d}  {rps:10.1f} rays/s  efficiency {eff:6.1%}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": rows[-1]["weak_scaling_efficiency"],
        "unit": f"fraction of linear, {sizes[0]}->{sizes[-1]} devices",
        "backend": backend,
        "per_device_batch": args.per_device_batch,
        "preset": args.preset,
        "sweep": rows,
    }))


if __name__ == "__main__":
    main()
