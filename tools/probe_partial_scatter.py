"""Hardware measurement: partial-table chunked scatter vs production.

Round-3 verdict item 2: implement PERF_NOTES' partial-table sketch (chunk
the stream per level, sort sub-chunks, scatter each chunk into its own
table with the PRODUCTION kernel, sum the G tables in XLA) and measure it at
real scale against scatter_add_cm — either it wins and ships, or the
negative result closes the lever permanently.

Shapes mirror one exact-path prop level group: M=9.2M updates into 6.6M rows
with 6 equal level segments (the flagship's backward streams).

Run on the v5e:  python tools/probe_partial_scatter.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.ops import scatter

ITERS = int(os.environ.get("PROBE_ITERS", "4"))
ROWS = 6_606_952
NSEG = 6
M = 9_216_000


def timed(fn, vals, idx):
    def loop(vals, idx):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            # Data-dependent shift keeps iterations from CSE-ing while
            # preserving the per-segment index ranges (shift within segment).
            v = vals + acc
            out = fn(v, idx)
            acc = acc + out[0, 0] + out[0, -1]
        return acc

    jl = jax.jit(loop)
    float(jl(vals, idx))
    t0 = time.perf_counter()
    float(jl(vals, idx))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    per = M // NSEG
    seg_rows = ROWS // NSEG
    idx = np.concatenate([
        rng.integers(s * seg_rows, (s + 1) * seg_rows, per)
        for s in range(NSEG)
    ]).astype(np.int32)
    vals = rng.normal(0, 1, (4, M)).astype(np.float32)
    jv, ji = jnp.asarray(vals), jnp.asarray(idx)

    ms = timed(lambda v, i: scatter.scatter_add_cm(
        v, i, ROWS, sort_segments=NSEG), jv, ji)
    print(f"scatter_add_cm (production, per-level sorts): {ms:7.2f} ms")

    for g in (2, 4, 8):
        ms = timed(lambda v, i, g=g: scatter.scatter_add_partial_cm(
            v, i, ROWS, num_chunks=g, sort_segments=NSEG), jv, ji)
        print(f"scatter_add_partial_cm G={g}:                 {ms:7.2f} ms")


if __name__ == "__main__":
    main()
