import time
import jax
import jax.numpy as jnp
import numpy as np

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
tbl_cm = jax.random.normal(key, (c, rows), jnp.float32)
tbl_bf = tbl_cm.astype(jnp.bfloat16)
idx = jax.random.randint(key, (m,), 0, rows, dtype=jnp.int32)
w = jax.random.normal(key, (m,), jnp.float32)

def red(x, w):
    return jnp.sum(jnp.dot(x.astype(jnp.float32), w))

def a_f32(i, tbl, idx, w):
    out = jnp.take(tbl, (idx + i) % rows, axis=1)
    return red(out, w)
dev_time("a) f32 planar take (baseline)", a_f32, tbl_cm, idx, w)
dev_time("b) bf16 planar take", a_f32, tbl_bf, idx, w)

def c_cast(i, tbl, idx, w):
    out = jnp.take(tbl.astype(jnp.bfloat16), (idx + i) % rows, axis=1)
    return red(out, w)
dev_time("c) f32 table cast->bf16 then take", c_cast, tbl_cm, idx, w)

perm = jax.random.permutation(key, m)
feats = jax.random.normal(key, (c, m), jnp.float32)
def f_permgather(i, feats, perm):
    out = jnp.take(feats, (perm + i) % m, axis=1)
    return jnp.sum(out[:, ::4097])
dev_time("f) permutation gather [C,M] by [M]", f_permgather, feats, perm)
