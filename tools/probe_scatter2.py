"""Honest scatter/sort tuning probe: iteration-dependent inputs (no hoisting),
real index distributions from the actual model geometry."""
import functools
import time
import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.ops import hashgrid, scatter


def dev_time(name, fn, *args, k=4):
    def looped(*a):
        def body(i, c):
            out = fn(i, *a)
            return c + out
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    f = jax.jit(looped)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    np.asarray(f(*args))
    dt = (time.perf_counter() - t0 - 0.039) / k
    print(f"{name:62s} {dt*1e3:9.2f} ms")
    return dt


def real_indices(spec, n_rays, n_samples, seed=0):
    """Corner indices as the model would produce: points along random rays
    through the contracted ball."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    o = jax.random.uniform(k1, (3, 1, n_rays, 1), minval=-0.3, maxval=0.3)
    d = jax.random.normal(k2, (3, 1, n_rays, 1))
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    t = jnp.linspace(0.05, 1.8, n_samples)[None, None, None, :]
    pts = (o + d * t).reshape(3, 1, n_rays * n_samples)
    x01 = jnp.clip((pts / 2.0 + 1.0) / 2.0, 0.0, 1.0)
    gidx = []
    for level in range(spec.num_levels):
        scale = np.float32(spec.cuda_scales[level])
        pos = x01 * scale + 0.5
        pg = jnp.floor(pos).astype(jnp.uint32)
        for corner in range(8):
            comps = [pg[d2] + np.uint32((corner >> d2) & 1)
                     for d2 in range(3)]
            idx = hashgrid._corner_index_components(spec, level, *comps)
            gidx.append(idx.astype(jnp.int32)[0]
                        + np.int32(spec.offsets[level]))
    return jnp.concatenate(gidx)


def main():
    key = jax.random.PRNGKey(1)
    spec_nerf = hashgrid.HashGridSpec()
    spec_prop = hashgrid.HashGridSpec(num_levels=6, desired_resolution=512)

    for name, spec, n_rays, n_samples, c in (
            ("nerf", spec_nerf, 1500, 32, 4),
            ("prop", spec_prop, 1500, 128, 4)):
        rows = spec.table_rows
        idx = real_indices(spec, n_rays, n_samples)
        m = idx.shape[0]
        vals = jax.random.normal(key, (c, m), jnp.float32)
        print(f"--- {name}: M={m} rows={rows}")

        def run(i, vals, idx, **kw):
            # roll makes inputs iteration-dependent; distribution unchanged.
            ii = jnp.roll(idx, i)
            vv = jnp.roll(vals, i, axis=1)
            out = scatter.scatter_add_cm(vv, ii, rows, **kw)
            return jnp.sum(out[:, ::4097])

        for tr, bk in ((1024, 512), (4096, 1024), (4096, 2048), (8192, 1024)):
            dev_time(f"{name} scatter tile={tr} K={bk}",
                     functools.partial(run, tile_rows=tr, block_k=bk),
                     vals, idx)

        def sort_flat(i, vals, idx):
            out = jax.lax.sort((jnp.roll(idx, i),)
                               + tuple(jnp.roll(vals, i, axis=1)),
                               dimension=0, num_keys=1)
            return sum(o[0].astype(jnp.float32) for o in out[1:])
        dev_time(f"{name} sort flat M={m}", sort_flat, vals, idx)

        def sort_perlevel(i, vals, idx):
            # 8*pts per level contiguous
            per = m // spec.num_levels
            tot = jnp.float32(0)
            for l in range(spec.num_levels):
                sl = slice(l * per, (l + 1) * per)
                out = jax.lax.sort(
                    (jnp.roll(idx[sl], i),)
                    + tuple(jnp.roll(vals[:, sl], i, axis=1)),
                    dimension=0, num_keys=1)
                tot += sum(o[0].astype(jnp.float32) for o in out[1:])
            return tot
        dev_time(f"{name} sort per-level ({spec.num_levels}x)",
                 sort_perlevel, vals, idx)


if __name__ == "__main__":
    main()
