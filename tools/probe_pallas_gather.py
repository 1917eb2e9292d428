import sys, time, functools
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from ucnerf_tpu.ops import gather

def dev_time(name, fn, *args, k=8):
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

key = jax.random.PRNGKey(0)
rows, c, m = 6_606_952, 4, 9_216_000
tbl = jax.random.normal(key, (c, rows), jnp.float32)
idx = jax.random.randint(key, (m,), 0, rows, dtype=jnp.int32)
w = jax.random.normal(key, (m,), jnp.float32)

def red(x, w):
    return jnp.sum(jnp.dot(x.astype(jnp.float32), w))

def native(i, tbl, idx, w):
    return red(jnp.take(tbl, (idx + i) % rows, axis=1), w)
dev_time("native XLA take", native, tbl, idx, w)

sidx = jnp.sort(idx)
def sk(i, tbl, sidx, w, span, bk, tp=True):
    out = gather.gather_sorted_cm(tbl, jnp.clip(sidx + i, 0, rows - 1),
                                  rows, span_rows=span, block_k=bk,
                                  two_pass=tp)
    return red(out, w)
for span, bk in ((2048, 1024), (2048, 2048), (4096, 2048), (4096, 4096)):
    dev_time(f"kernel-only span={span} K={bk}",
             functools.partial(sk, span=span, bk=bk), tbl, sidx, w)
dev_time("kernel-only span=4096 K=2048 1pass",
         functools.partial(sk, span=4096, bk=2048, tp=False), tbl, sidx, w)

def full(i, tbl, idx, w, **kw):
    out = gather.take_cm(tbl, (idx + i) % rows, **kw)
    return red(out, w)
dev_time("take_cm span=4096 K=2048",
         functools.partial(full, span_rows=4096, block_k=2048), tbl, idx, w)
dev_time("take_cm seg=8",
         functools.partial(full, span_rows=4096, block_k=2048,
                           sort_segments=8), tbl, idx, w)
