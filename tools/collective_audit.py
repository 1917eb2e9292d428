"""Audit the collectives in the compiled sharded train step (SCALING_r05).

Compiles the production sharded train step over an N-device virtual CPU
mesh and reports every cross-device collective in the optimized HLO with
its payload bytes.  This verifies the analytical DP all-reduce model
(SCALING_r05.md (a)) against what XLA actually emits: the gradient
all-reduce should dominate and match the parameter-tree bytes; everything
else (loss-stat psums) should be noise.

A CPU-time "psum share" would not transfer to TPU, so the recorded artifact
is the BYTE inventory (hardware-independent) plus the model's time
projection at ICI/DCN bandwidths.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/collective_audit.py [--devices 8] [--preset waymo]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "s32": 4,
                "u64": 8, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def shape_bytes(sig: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(sig):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--preset", default="waymo")
    ap.add_argument("--per-device-batch", type=int, default=128)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
            f"{args.devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp

    from ucnerf_tpu import configs
    from ucnerf_tpu.parallel import mesh as meshlib
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib

    cfg = getattr(configs, args.preset)(
        batch_size=args.per_device_batch * args.devices)
    if cfg.microbatches > 1 and cfg.batch_size % cfg.microbatches:
        cfg = dataclasses.replace(cfg, microbatches=1)
    mesh = meshlib.create_mesh(jax.devices()[:args.devices])
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    state = state_lib.create_train_state(cfg, params)
    train_step = step_lib.make_train_step(model, cfg, mesh=mesh)
    batch = meshlib.shard_batch(step_lib.dummy_batch(cfg, cfg.batch_size),
                                mesh)

    lowered = train_step.lower(state, batch, jax.random.PRNGKey(1),
                               jnp.float32(0.5))
    compiled = lowered.compile()
    hlo = compiled.as_text()

    per_op = collections.Counter()
    per_op_bytes = collections.Counter()
    for line in hlo.splitlines():
        stripped = line.strip()
        for coll in _COLLECTIVES:
            # Match the op on the RHS (e.g. "x = f32[...] all-reduce(...)").
            if re.search(rf"= [^=]*\b{coll}\(", stripped):
                lhs = stripped.split("=", 1)[0]
                rhs_sig = stripped.split("=", 1)[1].split(coll)[0]
                b = shape_bytes(rhs_sig) or shape_bytes(lhs)
                per_op[coll] += 1
                per_op_bytes[coll] += b

    grad_bytes = sum(
        int(jnp.size(l)) * 4 for l in jax.tree.leaves(params))
    report = {
        "devices": args.devices,
        "preset": args.preset,
        "param_grad_bytes": grad_bytes,
        "collectives": {
            k: {"count": per_op[k], "bytes": per_op_bytes[k]}
            for k in per_op
        },
    }
    print(json.dumps(report, indent=2))
    total_ar = per_op_bytes.get("all-reduce", 0)
    print(f"\nall-reduce payload {total_ar / 1e6:.1f} MB vs param grads "
          f"{grad_bytes / 1e6:.1f} MB "
          f"(ratio {total_ar / max(grad_bytes, 1):.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
