import sys, time, functools
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from ucnerf_tpu.ops import scatter, hashgrid

def dev_time(name, fn, *args, k=6):
    def looped(*a):
        def body(i, c):
            return c + fn(i, *a)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    f = jax.jit(looped)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    np.asarray(f(*args))
    dt = (time.perf_counter() - t0 - 0.039) / k
    print(f"{name:58s} {dt*1e3:9.2f} ms", flush=True)
    return dt

# Real index distribution: one prop level at flagship microbatch scale.
spec = hashgrid.HashGridSpec(num_levels=6, desired_resolution=512)
rows = spec.table_rows
key = jax.random.PRNGKey(0)
m = 9_216_000  # 6 levels x 8 corners x 1500x128 points
# Build realistic per-level indices (level-major, like the real stream).
per = m // 6
parts = []
for l in range(6):
    lo, hi = spec.offsets[l], spec.offsets[l + 1]
    parts.append(jax.random.randint(jax.random.fold_in(key, l),
                                    (per,), lo, hi, dtype=jnp.int32))
idx = jnp.concatenate(parts)
vals = jax.random.normal(key, (4, m), jnp.float32)

def baseline(i, vals, idx, segs):
    out = scatter.scatter_add_cm(jnp.roll(vals, i, axis=1),
                                 jnp.roll(idx, i), rows, sort_segments=segs)
    return jnp.sum(out[:, ::4097])
dev_time("scatter_add_cm flat", functools.partial(baseline, segs=1), vals, idx)
dev_time("scatter_add_cm per-level (6 segs, default)",
         functools.partial(baseline, segs=6), vals, idx)

def chunked(i, vals, idx, G):
    out = scatter.scatter_add_chunked_cm(jnp.roll(vals, i, axis=1),
                                         jnp.roll(idx, i), rows,
                                         num_chunks=G)
    return jnp.sum(out[:, ::4097])
for G in (6, 24, 48, 96, 192):
    dev_time(f"scatter_add_chunked_cm G={G}",
             functools.partial(chunked, G=G), vals, idx)
