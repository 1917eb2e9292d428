"""Probe: does clamping a fraction of gather indices to a constant row make
XLA's TPU gather cheaper?  (Round-4 erf-gated-gather lever.)

The flagship step spends 976 ms/step (54%) in the two forward hash-table
gathers (tools/profile_step.py, PERF_NOTES round 4).  Zip-NeRF's erf
multisample weighting multiplies each (level, sample) feature by
w = erf(1/(sqrt(8)*std*res)) AFTER the gather; for fine levels at realistic
Waymo cone widths w is <= a few percent for most samples.  If gathers whose
results are about to be multiplied by ~0 are redirected to one constant row,
the tile stream gains massive reuse — IF the hardware gather benefits from
repeated addresses.  This probe measures that directly, plus the table-size
effect seen in the step trace (nerf gather runs 10.8 ns/lookup vs the 6.0
measured on the 6.6M-row table).

Run on the v5e:  python tools/probe_gather_gating.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def bench(table, idx, rows):
    # Chain ITERS data-dependent iterations in ONE jitted program and force
    # completion with a host scalar fetch: block_until_ready is not reliable
    # through the remote-execution tunnel (see bench.py), and making each
    # iteration's indices depend on the previous output (a shift mod rows —
    # preserves both the randomness and the repeated-constant structure)
    # stops XLA from CSE-ing the iterations into one gather.
    def loop(table, idx):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            shifted = jax.lax.rem(idx + acc.astype(jnp.int32) % 64,
                                  jnp.int32(rows))
            out = jnp.take(table, shifted, axis=1)
            acc = acc + out[0, 0] + out[0, -1]
        return acc

    jl = jax.jit(loop)
    float(jl(table, idx))  # compile + warm
    t0 = time.perf_counter()
    float(jl(table, idx))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)

    def run(m, rows, label):
        table = jnp.asarray(rng.normal(size=(4, rows)).astype(np.float32))
        idx_rand = rng.integers(0, rows, m).astype(np.int32)
        print(f"\n[{label}] M={m/1e6:.2f}M rows={rows/1e6:.2f}M "
              f"(table {4*rows*4/1e6:.0f} MB)")
        base = None
        for frac in (0.0, 0.25, 0.5, 0.75, 0.9, 1.0):
            mask = rng.random(m) < frac
            idx = np.where(mask, 0, idx_rand).astype(np.int32)
            ms = bench(table, jnp.asarray(idx), rows)
            if base is None:
                base = ms
            print(f"  const-frac {frac:4.2f}: {ms:7.2f} ms  "
                  f"({ms/m*1e6:.2f} ns/lookup, {base/ms:.2f}x)")
        # Constant clamped per level-slice (what gating would produce: each
        # level's gated lookups point at that level's first row).
        level_base = (np.arange(m) // (m // 8) * (rows // 8)).astype(np.int32)
        mask = rng.random(m) < 0.5
        idx = np.where(mask, level_base, idx_rand).astype(np.int32)
        ms = bench(table, jnp.asarray(idx), rows)
        print(f"  per-level-const 0.50: {ms:7.2f} ms")

    # Prop-gather shape (the 561 ms/step op).
    run(9_216_000, 6_606_952, "prop-shape")
    # Nerf-gather shape (the 415 ms/step op; 10.8 ns/lookup anomaly).
    run(3_840_000, 14_995_560, "nerf-shape")


if __name__ == "__main__":
    main()
