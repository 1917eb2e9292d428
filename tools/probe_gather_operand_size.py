"""Decisive A/B: does the gather OPERAND's extent (not the addresses touched)
change TPU gather cost?

probe_gather_split.py showed per-level sliced gathers beating the monolithic
packed-table gather 1.4-2.2x at flagship shapes — but the physical addresses
touched are IDENTICAL (each level's indices only ever span its own slice), so
tile granularity and DRAM locality cannot explain it.  This probe pins the
variable: the same 7 x 384K lookups into seven 2^21-row regions, issued as
  (a) ONE take over the 14.7M-row concatenation (packed indices),
  (b) 7 takes, each over its own 2^21-row slice (local indices),
  (c) ONE take over a 2^21-row table with the 7 streams' LOCAL indices
      concatenated (collapses the footprint 7x — upper bound from locality),
each measured 3x interleaved to separate real effects from tunnel variance.

Run on the v5e:  python tools/probe_gather_operand_size.py
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
CAP = 1 << 21
L = 7
M = 384_000


def timed(jl, *args):
    float(jl(*args))
    t0 = time.perf_counter()
    float(jl(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)
    total = L * CAP
    table = jnp.asarray(rng.normal(size=(4, total)).astype(np.float32))
    local = [rng.integers(0, CAP, M).astype(np.int32) for _ in range(L)]
    packed = np.concatenate([li + i * CAP for i, li in enumerate(local)])
    jpacked = jnp.asarray(packed)
    jlocal = [jnp.asarray(li) for li in local]
    jlocal_cat = jnp.asarray(np.concatenate(local))

    def mono(table, idx):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            shifted = jax.lax.rem(idx + acc.astype(jnp.int32) % 64,
                                  jnp.int32(total))
            out = jnp.take(table, shifted, axis=1)
            acc = acc + out[0, 0] + out[0, -1]
        return acc

    def split(table, *idxs):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            for i, li in enumerate(idxs):
                shifted = jax.lax.rem(li + acc.astype(jnp.int32) % 64,
                                      jnp.int32(CAP))
                sl = jax.lax.slice_in_dim(table, i * CAP, (i + 1) * CAP,
                                          axis=1)
                out = jnp.take(sl, shifted, axis=1)
                acc = acc + out[0, 0] + out[0, -1]
        return acc

    def folded(table, idx):
        acc = jnp.zeros((), jnp.float32)
        sl = jax.lax.slice_in_dim(table, 0, CAP, axis=1)
        for _ in range(ITERS):
            shifted = jax.lax.rem(idx + acc.astype(jnp.int32) % 64,
                                  jnp.int32(CAP))
            out = jnp.take(sl, shifted, axis=1)
            acc = acc + out[0, 0] + out[0, -1]
        return acc

    jits = {"mono  (1 take, 14.7M rows)": (jax.jit(mono), (table, jpacked)),
            "split (7 takes, 2M rows ea)": (jax.jit(split),
                                            (table, *jlocal)),
            "folded(1 take, 2M rows)  ": (jax.jit(folded),
                                          (table, jlocal_cat))}
    results = {k: [] for k in jits}
    for rep in range(3):
        for k, (jl, args) in jits.items():
            results[k].append(timed(jl, *args))
    m_total = L * M
    for k, ms in results.items():
        best = min(ms)
        print(f"{k}: {' '.join(f'{v:6.2f}' for v in ms)} ms "
              f"| best {best:6.2f} ({best/m_total*1e6:.2f} ns/lookup)")


if __name__ == "__main__":
    main()
