import sys, time
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
idx = jax.random.randint(key, (m,), 0, rows, dtype=jnp.int32)
feats = jax.random.normal(key, (c, m), jnp.float32)

for S in (8, 32, 128, 512, 1024):
    def b5(i, idx, feats, S=S):
        ops = (jnp.roll(idx, i).reshape(S, m // S),) + tuple(
            jnp.roll(feats[ch], i).reshape(S, m // S) for ch in range(c))
        out = jax.lax.sort(ops, dimension=1, num_keys=1)
        return sum(jnp.sum(o[:, ::4097]) for o in out[1:])
    dev_time(f"batched 5-array sort S={S}", b5, idx, feats)

# Packed bf16 unsort payload: pos key + one int64 of 4xbf16.
import jax.lax as lax
for S in (8, 128, 1024):
    def bp(i, idx, feats, S=S):
        f16 = feats.astype(jnp.bfloat16)
        u16 = [lax.bitcast_convert_type(jnp.roll(f16[ch], i),
                                        jnp.uint16).astype(jnp.uint64)
               for ch in range(c)]
        packed = (u16[0] | (u16[1] << 16) | (u16[2] << 32)
                  | (u16[3] << 48))
        out = jax.lax.sort((jnp.roll(idx, i).reshape(S, m // S),
                            packed.reshape(S, m // S)),
                           dimension=1, num_keys=1)
        return jnp.sum(out[1][:, ::4097].astype(jnp.float32) % 7)
    dev_time(f"packed-bf16 2-array sort S={S}", bp, idx, feats)
