"""Chase the v5e backend-compiler RET_CHECK (round-2 verdict item 6).

A monolithic train-step program at canonical sizes (8192+ rays x 160
samples x full loss set) crashes the v5e backend compiler after ~14 min:

    RET_CHECK failure ... live_range_finder.cc:29 interval.start() <= limit
    (opcode=scalar-address-calculation, memory_space=vmem)

in register allocation (lsrav2), for both hex modes — program-size related.
This probe (a) bisects the failing batch size, (b) tries compile-shaping
levers on the failing size, and records what compiles:

  - in-graph lax.scan microbatch accumulation at several microbatch counts
    (shorter live ranges inside a compiled-once body)
  - remat ON/OFF (cfg.remat_fields changes live-range structure)
  - splitting the value_and_grad program from the Adam update (the
    host-microbatch decomposition's other half)
  - XLA flag experiments via --xla-flags

Every compile runs in a fresh subprocess with a hard timeout so a 14-minute
compiler crash cannot take the probe down; results are printed as they
complete and summarized as JSON.

Usage:
  python tools/retcheck_probe.py --mode bisect         # find the floor
  python tools/retcheck_probe.py --mode levers --batch 8192
  python tools/retcheck_probe.py --mode child --batch 4096 --micro 1 ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(batch, micro, remat, hex_exact, grad_only, xla_flags):
    """Compile ONE program shape; print COMPILED/seconds or crash."""
    if xla_flags:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " " + xla_flags)
    import jax
    import jax.numpy as jnp

    from ucnerf_tpu import configs
    from ucnerf_tpu.train import state as state_lib
    from ucnerf_tpu.train import step as step_lib
    from ucnerf_tpu.train import losses as losses_lib

    maker = configs.waymo if hex_exact else configs.waymo_tpu
    cfg = maker(batch_size=batch, microbatches=micro,
                host_microbatches=False, remat_fields=remat)
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    batch_arr = jax.tree.map(jnp.asarray,
                             step_lib.dummy_batch(cfg, cfg.batch_size))
    t0 = time.time()
    if grad_only:
        def loss_fn(params, mb, key, train_frac):
            renderings, ray_history = model.apply(
                {"params": params}, key, mb, train_frac,
                compute_extras=False, train=True)
            total, losses, stats = losses_lib.compute_all_losses(
                mb, renderings, ray_history, cfg)
            return total, (losses, stats)
        grad_jit = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        grad_jit.lower(params, batch_arr, jax.random.PRNGKey(1),
                       jnp.float32(0.5)).compile()
    else:
        state = state_lib.create_train_state(cfg, params)
        train_step = step_lib.make_train_step(model, cfg)
        train_step.lower(state, batch_arr, jax.random.PRNGKey(1),
                         jnp.float32(0.5)).compile()
    print(f"COMPILED in {time.time() - t0:.0f}s", flush=True)


def run_child(batch, micro=1, remat=True, hex_exact=False, grad_only=False,
              xla_flags="", timeout=1500):
    args = [sys.executable, os.path.abspath(__file__), "--mode", "child",
            "--batch", str(batch), "--micro", str(micro)]
    if not remat:
        args.append("--no-remat")
    if hex_exact:
        args.append("--hex-exact")
    if grad_only:
        args.append("--grad-only")
    if xla_flags:
        args += ["--xla-flags", xla_flags]
    t0 = time.time()
    try:
        proc = subprocess.run(args, capture_output=True, timeout=timeout,
                              cwd=REPO, text=True)
        ok = proc.returncode == 0 and "COMPILED" in proc.stdout
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
        return dict(ok=ok, seconds=round(time.time() - t0),
                    returncode=proc.returncode, tail=tail)
    except subprocess.TimeoutExpired:
        return dict(ok=False, seconds=timeout, returncode="timeout",
                    tail=["compile timeout"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="bisect",
                        choices=["bisect", "levers", "child"])
    parser.add_argument("--batch", type=int, default=15000)
    parser.add_argument("--micro", type=int, default=1)
    parser.add_argument("--no-remat", action="store_true")
    parser.add_argument("--hex-exact", action="store_true")
    parser.add_argument("--grad-only", action="store_true")
    parser.add_argument("--xla-flags", default="")
    parser.add_argument("--timeout", type=int, default=1500)
    args = parser.parse_args()

    if args.mode == "child":
        child(args.batch, args.micro, not args.no_remat, args.hex_exact,
              args.grad_only, args.xla_flags)
        return

    results = {}

    def probe(name, **kw):
        print(f"--- {name}", flush=True)
        r = run_child(timeout=args.timeout, **kw)
        results[name] = dict(r, **kw)
        print(json.dumps(results[name]), flush=True)

    if args.mode == "bisect":
        # Monolithic flagship step, rising batch: find the floor.
        for b in (1500, 3000, 4500, 6000, 8192, 12000, 15000):
            probe(f"mono_b{b}", batch=b)
            if not results[f"mono_b{b}"]["ok"]:
                break
    else:
        b = args.batch
        probe(f"mono_b{b}", batch=b)
        probe(f"mono_b{b}_noremat", batch=b, remat=False)
        probe(f"mono_b{b}_gradonly", batch=b, grad_only=True)
        for micro in (2, 5, 10):
            probe(f"scan_b{b}_m{micro}", batch=b, micro=micro)
        for flags in (
                "--xla_tpu_enable_latency_hiding_scheduler=false",
                "--xla_tpu_scoped_vmem_limit_kib=65536",
                "--xla_tpu_aggressive_opt_barrier_removal=disabled",
        ):
            probe(f"mono_b{b}_flags[{flags}]", batch=b, xla_flags=flags)

    print(json.dumps({"retcheck_probe": results}))


if __name__ == "__main__":
    main()
