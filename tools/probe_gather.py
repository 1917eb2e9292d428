"""Probe: fastest formulation for the big random table gather on TPU.

Honest timing: k in-program iterations, full-output dot-reduction so nothing
can be dead-code eliminated.
"""
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
    print(f"{name:58s} {dt*1e3:9.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    rows, c, m = 6_606_952, 4, 9_216_000  # prop fwd gather scale
    tbl_cm = jax.random.normal(key, (c, rows), jnp.float32)
    tbl_rm = tbl_cm.T.copy()                       # [rows, C]
    tbl_flat = tbl_cm.reshape(-1)                  # planar flat [C*rows]
    idx = jax.random.randint(key, (m,), 0, rows, dtype=jnp.int32)
    w = jax.random.normal(key, (m,), jnp.float32)

    def red(x, w):
        # x: [C, M] — weighted full reduction.
        return jnp.sum(jnp.dot(x, w))

    def a_planar(i, tbl, idx, w):
        out = jnp.take(tbl, (idx + i) % rows, axis=1)   # [C, M]
        return red(out, w)
    dev_time("a) planar [C,rows] take axis=1", a_planar, tbl_cm, idx, w)

    def b_flat4(i, tbl, idx, w):
        ii = (idx + i) % rows
        outs = [jnp.take(tbl, ii + ch * rows, axis=0) for ch in range(c)]
        return red(jnp.stack(outs, 0), w)
    dev_time("b) flat planar, 4x 1-D takes", b_flat4, tbl_flat, idx, w)

    def c_rowmajor(i, tbl, idx, w):
        out = jnp.take(tbl, (idx + i) % rows, axis=0)   # [M, C]
        return red(out.T, w)
    dev_time("c) row-major [rows,C] take axis=0", c_rowmajor, tbl_rm, idx, w)

    def d_rm_2d(i, tbl, idx, w):
        ii = ((idx + i) % rows).reshape(-1, 128)
        out = jnp.take(tbl, ii, axis=0)                 # [M/128, 128, C]
        return jnp.sum(out * w.reshape(-1, 128, 1))
    dev_time("d) row-major take 2-D idx", d_rm_2d, tbl_rm, idx, w)

    # e) smaller index count: C folded via planar gather of [1, rows] x4
    def e_perchan(i, tbl, idx, w):
        ii = (idx + i) % rows
        outs = [jnp.take(tbl[ch], ii, axis=0) for ch in range(c)]
        return red(jnp.stack(outs, 0), w)
    dev_time("e) per-channel 1-D takes from [C,rows]", e_perchan, tbl_cm,
             idx, w)

    # f) C=1 scale: prop grid is actually level_dim=1!
    def f_c1(i, tbl, idx, w):
        out = jnp.take(tbl[0], (idx + i) % rows, axis=0)  # [M]
        return jnp.dot(out, w)
    dev_time("f) C=1 flat 1-D take (prop true shape)", f_c1, tbl_cm, idx, w)

    # g) sorted indices (locality): does XLA gather go faster when sorted?
    sidx = jnp.sort(idx)
    dev_time("g) planar take, pre-sorted idx", a_planar, tbl_cm, sidx, w)


if __name__ == "__main__":
    main()
