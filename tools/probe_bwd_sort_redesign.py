"""Hardware probe: round-5 backward-sort redesign (VERDICT item 1).

Measures, on the real accelerator at canonical flagship microbatch shapes
(waymo_tpu, batch 15000, scan m=15 -> 1000-ray microbatches):

  A. Sort-only cost of the three stream formats per gather backward:
       - 5-array f32 (production round 4): key + 4 f32 channels,
         per-level batched segments.
       - 3-array packed: key + 2 int32 (4 bf16 channels).
       - dense sample 7-array: key + 4 f32 grads + 2 int32 (packed fracs)
         at 1/8 the elements (dense prefix levels only).
  B. End-to-end backward (sort + Pallas scatter) for the prop table:
       scatter_add_cm vs the dense+packed split the fused boundary emits.

Canonical shapes: prop table 6,606,928 rows / 6 levels (dense prefix 3);
nerf table 14,995,560 rows / 10 levels (dense prefix 3).  Per microbatch and
level the corner stream is rays*samples*8 = 1.024M (prop) / 256K (nerf).

Usage: python tools/probe_bwd_sort_redesign.py [--reps 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.ops import hashgrid, scatter


def timeit(fn, *args, reps=8):
    """Device-looped timing (the round-3 harness): run `fn` reps times in ONE
    jitted fori_loop, reduce every output to a scalar accumulator, and time
    the second dispatch — per-program tunnel dispatch (~0.04-0.1 s) is paid
    once, not per rep.  `fn` receives (i, *args) and must use i (e.g. via
    jnp.roll) so the loop body is not hoisted."""
    def looped(*a):
        def body(i, c):
            out = fn(i, *a)
            leaves = jax.tree.leaves(out)
            return c + sum(jnp.sum(l[..., ::4097].astype(jnp.float32))
                           for l in leaves)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    f = jax.jit(looped)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    np.asarray(f(*args))
    return (time.perf_counter() - t0 - 0.039) / reps * 1e3


def make_streams(spec, samples, rng):
    """Realistic per-level streams: random unit-cube points -> real corner
    indices via the production index math."""
    pts = rng.uniform(0, 1, (samples, 3)).astype(np.float32)
    x = jnp.asarray(pts)
    base_per_level = []
    gidx_per_level = []
    frac_per_level = []
    for level in range(spec.num_levels):
        scale = np.float32(spec.cuda_scales[level])
        pos = x * scale + np.float32(0.5)
        pf = jnp.floor(pos)
        frac = (pos - pf).T  # [3, S]
        pg = pf.astype(jnp.uint32)
        corners = []
        for corner in range(8):
            comps = []
            for d in range(3):
                comps.append(pg[:, d] + np.uint32(1 if corner & (1 << d)
                                                  else 0))
            idx = hashgrid._corner_index_components(spec, level, *comps)
            corners.append(idx.astype(jnp.int32)
                           + np.int32(spec.offsets[level]))
        gidx_per_level.append(jnp.stack(corners))      # [8, S]
        base_per_level.append(corners[0])
        frac_per_level.append(jnp.concatenate(
            [frac, jnp.zeros((1, samples), jnp.float32)], axis=0))
    return gidx_per_level, base_per_level, frac_per_level


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--samples", type=int, default=128000,
                    help="per-level samples (flagship m=15 prop: 128K)")
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    spec = hashgrid.HashGridSpec(num_levels=6, desired_resolution=512)
    print(f"prop spec: rows={spec.table_rows} dense_prefix="
          f"{spec.dense_prefix} strides={spec.dense_strides}")
    s = args.samples
    m = 8 * s  # corner stream per level
    nl = spec.num_levels
    nd = spec.dense_prefix
    nh = nl - nd
    gidx, base, fracs = make_streams(spec, s, rng)
    vals = jnp.asarray(rng.normal(0, 1, (4, nl * m)).astype(np.float32))
    idx_all = jnp.concatenate([g.reshape(-1) for g in gidx])
    rows = spec.table_rows
    key = jax.random.PRNGKey(0)

    # --- A: sort-only costs -------------------------------------------------
    def sort5(i, idx2, vals4):
        ops = ((jnp.roll(idx2, i, 1),)
               + tuple(vals4[c] for c in range(4)))
        return jax.lax.sort(ops, dimension=1, num_keys=1)[0]

    def sort3_packed(i, idx2, packed):
        ops = ((jnp.roll(idx2, i, 1),) + tuple(packed[c] for c in range(2)))
        return jax.lax.sort(ops, dimension=1, num_keys=1)[0]

    def sort7_dense(i, idx2, vals4, packed2):
        ops = ((jnp.roll(idx2, i, 1),)
               + tuple(vals4[c] for c in range(4))
               + tuple(packed2[c] for c in range(2)))
        return jax.lax.sort(ops, dimension=1, num_keys=1)[0]

    idx2 = idx_all.reshape(nl, m)
    vals4 = vals.reshape(4, nl, m)
    packed = scatter.pack_bf16_pairs(vals).reshape(2, nl, m)
    t5 = timeit(sort5, idx2, vals4, reps=args.reps)
    t3 = timeit(sort3_packed, idx2, packed, reps=args.reps)
    print(f"A. sort 5-array f32   [{nl}, {m}]: {t5:8.2f} ms")
    print(f"A. sort 3-array pack  [{nl}, {m}]: {t3:8.2f} ms "
          f"({t3 / t5:.2f}x)")

    # dense sample streams: nd levels of s samples (7-array), hashed levels
    # stay corner-granularity.
    base_d = jnp.stack(base[:nd]).reshape(nd, s)
    g_d = jnp.asarray(rng.normal(0, 1, (4, nd, s)).astype(np.float32))
    fr_d = scatter.pack_bf16_pairs(
        jnp.concatenate(fracs[:nd], axis=1)).reshape(2, nd, s)
    t7 = timeit(sort7_dense, base_d, g_d, fr_d, reps=args.reps)
    idx_h = idx2[nd:]
    t5h = timeit(sort5, idx_h, vals4[:, nd:], reps=args.reps)
    t3h = timeit(sort3_packed, idx_h, packed[:, nd:], reps=args.reps)
    print(f"A. dense 7-array      [{nd}, {s}]: {t7:8.2f} ms "
          f"(replaces {nd}/{nl} of the 5-array sort)")
    print(f"A. hashed 5-array     [{nh}, {m}]: {t5h:8.2f} ms")
    print(f"A. hashed 3-array     [{nh}, {m}]: {t3h:8.2f} ms")
    print(f"A. TOTAL old={t5:.1f}  new(dense7+hashed3)={t7 + t3h:.1f}  "
          f"({(t7 + t3h) / t5:.2f}x)")

    # --- B: end-to-end backward (sort + kernel) ----------------------------
    def f_old(i, v, ix):
        return scatter.scatter_add_cm(jnp.roll(v, i, 1), ix, rows,
                                      sort_segments=nl)
    t_old = timeit(f_old, vals, idx_all, reps=args.reps)
    print(f"B. scatter_add_cm (prod, {nl}-seg 5-array): {t_old:8.2f} ms")

    def f_packed(i, v, ix):
        return scatter.scatter_add_packed_cm(jnp.roll(v, i, 1), ix, rows,
                                             sort_segments=nl)
    t_packed = timeit(f_packed, vals, idx_all, reps=args.reps)
    print(f"B. scatter_add_packed_cm (all levels):      {t_packed:8.2f} ms")

    dense_rows = spec.offsets[nd]
    g_dense = g_d.reshape(4, nd * s)
    fr_dense = jnp.concatenate(fracs[:nd], axis=1)
    base_dense = base_d.reshape(-1)
    idx_hashed = idx2[nd:].reshape(-1) - np.int32(dense_rows)
    vals_hashed = vals4[:, nd:].reshape(4, -1)

    def split_bwd(i, gd, fd, bd, vh, ih):
        a = scatter.scatter_add_dense_cm(
            jnp.roll(gd, i, 1), fd, bd, dense_rows, level_len=s,
            strides=spec.dense_strides)
        b = scatter.scatter_add_packed_cm(
            jnp.roll(vh, i, 1), ih, rows - dense_rows, sort_segments=nh)
        return jnp.concatenate([a, b], axis=1)

    t_split = timeit(split_bwd, g_dense, fr_dense, base_dense, vals_hashed,
                     idx_hashed, reps=args.reps)
    print(f"B. dense-sample + packed split:             {t_split:8.2f} ms "
          f"({t_split / t_old:.2f}x of production)")

    def split_bwd_f32(i, gd, fd, bd, vh, ih):
        a = scatter.scatter_add_dense_cm(
            jnp.roll(gd, i, 1), fd, bd, dense_rows, level_len=s,
            strides=spec.dense_strides)
        b = scatter.scatter_add_cm(
            jnp.roll(vh, i, 1), ih, rows - dense_rows, sort_segments=nh)
        return jnp.concatenate([a, b], axis=1)

    t_split32 = timeit(split_bwd_f32, g_dense, fr_dense, base_dense,
                       vals_hashed, idx_hashed, reps=args.reps)
    print(f"B. dense-sample + f32-hashed split:         {t_split32:8.2f} ms")
    del key


if __name__ == "__main__":
    main()
