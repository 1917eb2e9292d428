"""Ablation micro-bench: time individual hot ops at canonical microbatch scale.

Not part of the framework; a scratch tool for locating the train-step
bottleneck on real hardware.  Each op is iterated K times INSIDE one jitted
program (lax.fori_loop with data dependence) so the ~40ms tunnel dispatch
overhead amortizes away and pure device time is measured.

Run: python ablate_bench.py
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.ops import hashgrid

R = 1500          # rays per microbatch (batch 15000 / 10 microbatches)
S_PROP, S_NERF = 128, 32
K = 8             # in-program iterations


def device_time(name, make_fn, *args, k=K):
    """make_fn(*args) -> pytree; iterate k times in-program, data-chained."""
    def looped(*a):
        def body(i, carry):
            out = make_fn(*a, carry)
            return jax.tree.map(
                lambda c, o: c + o.ravel()[0].astype(jnp.float32), carry, out
            ) if isinstance(out, tuple) else carry + out.ravel()[0].astype(
                jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    fn = jax.jit(looped)
    np.asarray(fn(*args))  # compile + 1 run
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    dt = (time.perf_counter() - t0 - 0.039) / k
    print(f"{name:55s} {dt*1e3:9.2f} ms/iter")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    spec = hashgrid.HashGridSpec()  # nerf grid: 10 levels, 2^21, C=4
    spec_prop = hashgrid.HashGridSpec(num_levels=6, level_dim=1,
                                      desired_resolution=512,
                                      log2_hashmap_size=21)
    table = hashgrid.init_table(key, spec)
    table_prop = hashgrid.init_table(key, spec_prop)

    m_nerf = R * S_NERF
    m_prop = R * S_PROP
    x_nerf = jax.random.uniform(key, (3, 1, m_nerf))
    x_prop = jax.random.uniform(key, (3, 1, m_prop))
    stds_nerf = jnp.full((6, m_nerf), 0.01)
    stds_prop = jnp.full((6, m_prop), 0.01)

    device_time(
        "nerf encode fwd  [1500x32, 10L, C4]",
        lambda t, x, s, c: hashgrid.encode_hex_cm(
            x + c * 1e-20, s, t, spec)[0],
        table, x_nerf, stds_nerf)
    device_time(
        "nerf encode fwd+bwd",
        lambda t, x, s, c: jax.grad(
            lambda tt: hashgrid.encode_hex_cm(
                x + c * 1e-20, s, tt, spec)[0].sum())(t),
        table, x_nerf, stds_nerf)
    device_time(
        "prop encode fwd  [1500x128, 6L, C1]",
        lambda t, x, s, c: hashgrid.encode_hex_cm(
            x + c * 1e-20, s, t, spec_prop)[0],
        table_prop, x_prop, stds_prop)
    device_time(
        "prop encode fwd+bwd",
        lambda t, x, s, c: jax.grad(
            lambda tt: hashgrid.encode_hex_cm(
                x + c * 1e-20, s, tt, spec_prop)[0].sum())(t),
        table_prop, x_prop, stds_prop)

    # Dense MLP stack at the same scale (bottleneck 256 x 2 view layers).
    w1 = jax.random.normal(key, (40, 64)) * 0.1
    w2 = jax.random.normal(key, (64, 256)) * 0.1
    wv = jax.random.normal(key, (283, 256)) * 0.1
    wv2 = jax.random.normal(key, (539, 256)) * 0.1
    feats = jax.random.normal(key, (40, m_nerf))

    def mlp(w1, w2, wv, wv2, feats, c):
        f = feats + c * 1e-20
        h = jnp.maximum(jnp.einsum("io,iN->oN", w1, f), 0)
        b = jnp.einsum("io,iN->oN", w2, h)
        h2 = jnp.concatenate([b, jnp.zeros((27, m_nerf))], axis=0)
        h3 = jnp.maximum(jnp.einsum("io,iN->oN", wv, h2), 0)
        h4 = jnp.concatenate([h3, h2], axis=0)
        return jnp.einsum("io,iN->oN", wv2, h4)
    device_time("nerf MLP fwd [40->64->256->256->256]", mlp,
                w1, w2, wv, wv2, feats)

    def adam_like(t, c):
        return t * 0.999 + c * 1e-20 + 0.001 * t**2
    device_time("tablewide elementwise (adam proxy)", adam_like, table)

    # Raw gather throughput: 4M random rows from the [4, 15M] table.
    idx = jax.random.randint(key, (4 * 1024 * 1024,), 0, spec.table_rows)

    def raw_gather(t, idx, c):
        return jnp.take(t, idx + c.astype(jnp.int32) * 0, axis=1)
    device_time("raw gather 4Mi rows x C4", raw_gather, table, idx)

    def raw_scatter(t, idx, c):
        upd = jnp.ones((4, idx.shape[0]), t.dtype) * (1e-20 * c + 1.0)
        return jnp.zeros_like(t).at[:, idx].add(upd)[:, :8]
    device_time("raw scatter-add 4Mi rows x C4", raw_scatter, table, idx)


if __name__ == "__main__":
    main()
