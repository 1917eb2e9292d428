"""Probe: per-level sliced gathers vs one monolithic packed-table gather.

The gating probe (tools/probe_gather_gating.py) found per-lookup cost rises
with the gathered table's footprint: 6.5 ns/lookup over a 106 MB table but
11.5 ns over 240 MB — DRAM row/page locality, not tile granularity, is the
marginal cost.  The production forward batches all L*8 corner lookups into
ONE gather over the packed [C, total_rows] table; this probe measures
whether L separate gathers over the per-level SLICES (each level's indices
only span its own rows: 16 KB - 32 MB footprints) beat the monolith at the
exact flagship shapes.

Run on the v5e:  python tools/probe_gather_split.py
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


def timed(jl, *args):
    float(jl(*args))
    t0 = time.perf_counter()
    float(jl(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.default_rng(0)

    def run(label, level_rows, m_per_level):
        offsets = np.concatenate([[0], np.cumsum(level_rows)])
        total = int(offsets[-1])
        table = jnp.asarray(rng.normal(size=(4, total)).astype(np.float32))
        local = [rng.integers(0, r, m_per_level).astype(np.int32)
                 for r in level_rows]
        packed = np.concatenate(
            [li + off for li, off in zip(local, offsets[:-1])])
        jpacked = jnp.asarray(packed)
        jlocal = [jnp.asarray(li) for li in local]
        m_total = len(packed)
        print(f"\n[{label}] levels={len(level_rows)} "
              f"M={m_total/1e6:.2f}M total_rows={total/1e6:.2f}M")

        def mono(table, idx):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(ITERS):
                shifted = jax.lax.rem(idx + acc.astype(jnp.int32) % 64,
                                      jnp.int32(total))
                out = jnp.take(table, shifted, axis=1)
                acc = acc + out[0, 0] + out[0, -1]
            return acc

        ms = timed(jax.jit(mono), table, jpacked)
        print(f"  monolithic packed take: {ms:7.2f} ms "
              f"({ms/m_total*1e6:.2f} ns/lookup)")

        def split(table, *idxs):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(ITERS):
                for li, (lo, r) in zip(idxs, zip(offsets[:-1], level_rows)):
                    shifted = jax.lax.rem(
                        li + acc.astype(jnp.int32) % 64, jnp.int32(r))
                    sl = jax.lax.slice_in_dim(table, int(lo), int(lo + r),
                                              axis=1)
                    out = jnp.take(sl, shifted, axis=1)
                    acc = acc + out[0, 0] + out[0, -1]
            return acc

        ms = timed(jax.jit(split), table, *jlocal)
        print(f"  per-level slice takes:  {ms:7.2f} ms "
              f"({ms/m_total*1e6:.2f} ns/lookup)")

        # Middle ground: one take over the small levels packed together +
        # one per big level.
        big = [i for i, r in enumerate(level_rows) if r > 1 << 19]
        small = [i for i in range(len(level_rows)) if i not in big]
        if big and small:
            small_hi = int(offsets[small[-1] + 1])

            def grouped(table, packed_small, *big_idxs):
                acc = jnp.zeros((), jnp.float32)
                for _ in range(ITERS):
                    sl = jax.lax.slice_in_dim(table, 0, small_hi, axis=1)
                    shifted = jax.lax.rem(
                        packed_small + acc.astype(jnp.int32) % 64,
                        jnp.int32(small_hi))
                    out = jnp.take(sl, shifted, axis=1)
                    acc = acc + out[0, 0] + out[0, -1]
                    for li, i in zip(big_idxs, big):
                        lo, r = int(offsets[i]), int(level_rows[i])
                        shifted = jax.lax.rem(
                            li + acc.astype(jnp.int32) % 64, jnp.int32(r))
                        sl = jax.lax.slice_in_dim(table, lo, lo + r, axis=1)
                        out = jnp.take(sl, shifted, axis=1)
                        acc = acc + out[0, 0] + out[0, -1]
                return acc

            packed_small = np.concatenate(
                [local[i] + offsets[i] for i in small]).astype(np.int32)
            ms = timed(jax.jit(grouped), table, jnp.asarray(packed_small),
                       *[jlocal[i] for i in big])
            print(f"  grouped small+big:      {ms:7.2f} ms "
                  f"({ms/m_total*1e6:.2f} ns/lookup)")

    cap = 1 << 21
    # Prop shape: 6 levels, res 16..512 (stride res+2 cubed, capped).
    prop_rows = [min((r + 2) ** 3 // 8 * 8 + 8, cap)
                 for r in (16, 26, 41, 64, 102, 161)]
    # True prop level sizes from the spec are close to [4096+, ..., 2^21].
    prop_rows = [5832, 21952, 79512, 287496, 1124864, cap]
    run("prop-shape", prop_rows, 1_536_000)
    # Nerf shape: 10 levels, 4 dense + 6 hashed at 2^21.
    nerf_rows = [5832, 39304, 287496, cap, cap, cap, cap, cap, cap, cap]
    run("nerf-shape", nerf_rows, 384_000)


if __name__ == "__main__":
    main()
