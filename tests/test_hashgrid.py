import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.ops import hashgrid

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def _oracle_encode(x, table, spec):
    """Brute-force numpy oracle of the CUDA grid-encode semantics
    (gridencoder.cu:88-197): per-level trilinear gather with prime-XOR hash."""
    x01 = (np.asarray(x, np.float64) + 1) / 2
    n = x01.shape[0]
    out = np.zeros((n, spec.num_levels, spec.level_dim), np.float64)
    table = np.asarray(table, np.float64).T  # [C, T] planar -> [T, C]
    for l in range(spec.num_levels):
        scale = np.float32(spec.cuda_scales[l])
        res = spec.cuda_resolutions[l]
        hs = spec.level_sizes[l]
        use_hash = (res + 1) ** 3 > hs
        for i in range(n):
            if np.any(x01[i] < 0) or np.any(x01[i] > 1):
                continue
            pos = x01[i].astype(np.float32) * scale + np.float32(0.5)
            pg = np.floor(pos).astype(np.uint64)
            frac = (pos - np.floor(pos)).astype(np.float64)
            acc = np.zeros(spec.level_dim)
            for c in range(8):
                w = 1.0
                cp = pg.copy()
                for d in range(3):
                    if c & (1 << d):
                        w *= frac[d]
                        cp[d] += 1
                    else:
                        w *= 1 - frac[d]
                if use_hash:
                    idx = np.uint64(0)
                    for d in range(3):
                        idx ^= np.uint64((cp[d] * PRIMES[d]) % (1 << 32))
                else:
                    idx = cp[0] + cp[1] * (res + 1) + cp[2] * (res + 1) ** 2
                idx = int(idx % np.uint64(hs)) + spec.offsets[l]
                acc += w * table[idx]
            out[i, l] = acc
    return out


def small_spec():
    return hashgrid.HashGridSpec(num_levels=4, level_dim=4, base_resolution=4,
                                 desired_resolution=64, log2_hashmap_size=8)


def test_spec_layout_canonical_nerf():
    """Table layout of the canonical NeRF grid (16 -> 8192, 10 levels, 2^21)
    must match the reference allocator (grid.py:122-144)."""
    spec = hashgrid.HashGridSpec(num_levels=10, level_dim=4,
                                 base_resolution=16, desired_resolution=8192,
                                 log2_hashmap_size=21)
    assert spec.per_level_scale == pytest.approx(2.0)
    assert spec.resolutions == (17, 33, 65, 129, 257, 513, 1025, 2049, 4097,
                                8193)
    assert spec.level_sizes[0] == int(np.ceil(17**3 / 8) * 8)
    assert spec.level_sizes[1] == int(np.ceil(33**3 / 8) * 8)
    assert spec.level_sizes[2] == int(np.ceil(65**3 / 8) * 8)
    assert all(s == 2**21 for s in spec.level_sizes[3:])
    assert spec.offsets[0] == 0
    assert spec.table_rows == sum(spec.level_sizes)


def test_spec_layout_prop_grid():
    spec = hashgrid.HashGridSpec(num_levels=6, level_dim=4,
                                 base_resolution=16, desired_resolution=512,
                                 log2_hashmap_size=21)
    assert spec.resolutions == (17, 33, 65, 129, 257, 513)
    assert not spec.uses_hash(0)
    assert spec.uses_hash(5)


def test_encode_matches_oracle(rng):
    spec = small_spec()
    key = jax.random.PRNGKey(0)
    table = hashgrid.init_table(key, spec)
    x = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    out = np.asarray(hashgrid.encode(jnp.asarray(x), table, spec))
    ref = _oracle_encode(x, np.asarray(table), spec)
    np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-4)


def test_encode_out_of_bounds_zero():
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(1), spec)
    x = jnp.array([[1.5, 0.0, 0.0], [0.0, -2.0, 0.5]])
    out = np.asarray(hashgrid.encode(x, table, spec))
    np.testing.assert_allclose(out, 0.0)


def test_encode_grad_table_matches_oracle(rng):
    """d(sum(encode))/d(table) is the scatter-add of trilinear weights."""
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(2), spec)
    x = jnp.asarray(rng.uniform(-1, 1, (16, 3)).astype(np.float32))

    g = jax.grad(lambda tb: hashgrid.encode(x, tb, spec).sum())(table)

    # Oracle scatter: numeric accumulation of the same weights.
    eps = 1e-3
    gnp = np.asarray(g).T  # [T, C]
    nonzero_rows = np.nonzero(np.abs(gnp).sum(-1) > 0)[0]
    assert len(nonzero_rows) > 0
    # Spot-check a few rows with finite differences.
    tb = np.asarray(table)  # [C, T] planar
    for row in nonzero_rows[:5]:
        tb_p = tb.copy()
        tb_p[0, row] += eps
        f_p = float(_oracle_encode(np.asarray(x), tb_p, spec).sum())
        tb_m = tb.copy()
        tb_m[0, row] -= eps
        f_m = float(_oracle_encode(np.asarray(x), tb_m, spec).sum())
        fd = (f_p - f_m) / (2 * eps)
        np.testing.assert_allclose(gnp[row, 0], fd, rtol=1e-3, atol=1e-4)


def test_encode_grad_inputs_nonzero(rng):
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(3), spec)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (8, 3)).astype(np.float32))
    g = jax.grad(lambda xx: hashgrid.encode(xx, table, spec).sum())(x)
    assert np.any(np.abs(np.asarray(g)) > 0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_hash_decay_means(rng):
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(4), spec)
    means = np.asarray(hashgrid.hash_decay_means(table, spec))
    tb = np.asarray(table).T  # [T, C]
    for l in range(spec.num_levels):
        lo, hi = spec.offsets[l], spec.offsets[l + 1]
        np.testing.assert_allclose(means[l], (tb[lo:hi] ** 2).mean(),
                                   rtol=1e-5)


def test_encode_jit_and_batch_shapes():
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(5), spec)
    x = jnp.zeros((2, 3, 6, 3))
    out = jax.jit(lambda xx: hashgrid.encode(xx, table, spec))(x)
    assert out.shape == (2, 3, 6, spec.num_levels, spec.level_dim)


def test_gather_rows_ml_matches_monolithic():
    """_gather_rows_ml (per-level sliced takes, round-4 operand-extent win)
    must equal the monolithic gather in values AND table gradients."""
    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.ops import hashgrid

    rng = np.random.default_rng(7)
    offsets = (0, 512, 2048, 6144)
    rows = offsets[-1]
    table = jnp.asarray(rng.normal(size=(4, rows)).astype(np.float32))
    seg = 1000
    gidx = np.stack([
        rng.integers(offsets[l], offsets[l + 1], seg) for l in range(3)
    ]).astype(np.int32)
    jg = jnp.asarray(gidx)

    def ml_sum(t):
        parts = hashgrid._gather_rows_ml(offsets, None, t, jg)
        return sum((p * (i + 1)).sum() for i, p in enumerate(parts))

    def mono_sum(t):
        out = hashgrid._gather_rows(rows, 3, None, t, jg.reshape(-1))
        out = out.reshape(4, 3, seg)
        return sum((out[:, i] * (i + 1)).sum() for i in range(3))

    v1, g1 = jax.value_and_grad(ml_sum)(table)
    v2, g2 = jax.value_and_grad(mono_sum)(table)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)

    parts = hashgrid._gather_rows_ml(offsets, None, table, jg)
    want = jnp.take(table, jg.reshape(-1), axis=1).reshape(4, 3, seg)
    for l in range(3):
        np.testing.assert_array_equal(np.asarray(parts[l]),
                                      np.asarray(want[:, l]))


def test_gather_rows_ml_bf16_dtype():
    """gather_dtype casts features but gradients stay f32 (two-sided)."""
    import jax
    import jax.numpy as jnp

    from ucnerf_tpu.ops import hashgrid

    rng = np.random.default_rng(8)
    offsets = (0, 256, 1024)
    table = jnp.asarray(rng.normal(size=(4, 1024)).astype(np.float32))
    gidx = np.stack([rng.integers(0, 256, 64),
                     rng.integers(256, 1024, 64)]).astype(np.int32)
    parts = hashgrid._gather_rows_ml(offsets, jnp.bfloat16, table,
                                     jnp.asarray(gidx))
    assert all(p.dtype == jnp.bfloat16 for p in parts)
    g = jax.grad(lambda t: sum(
        p.astype(jnp.float32).sum()
        for p in hashgrid._gather_rows_ml(offsets, jnp.bfloat16, t,
                                          jnp.asarray(gidx))))(table)
    assert g.dtype == jnp.float32
    assert np.isfinite(np.asarray(g)).all()


def _oracle_tv_grad(x, table, spec, weight=1e-7):
    """Numpy oracle of the CUDA TV-gradient update (kernel_grad_tv,
    gridencoder.cu:507-610): per point/level, grad flows only to the ANCHOR
    cell, per-channel results * rsqrt(sum diffs^2 + 1e-9), boundary sides
    skipped, OOB points skipped, w = weight / (2 D)."""
    x01 = (np.asarray(x, np.float64) + 1) / 2
    tb = np.asarray(table, np.float64)  # [C, T]
    grad = np.zeros_like(tb)
    w = weight / (2 * spec.input_dim)

    def _idx(cp, l):
        res = spec.cuda_resolutions[l]
        hs = spec.level_sizes[l]
        if (res + 1) ** 3 > hs:
            idx = np.uint64(0)
            for d in range(3):
                idx ^= np.uint64((int(cp[d]) * int(PRIMES[d])) % (1 << 32))
        else:
            idx = cp[0] + cp[1] * (res + 1) + cp[2] * (res + 1) ** 2
        return int(idx % np.uint64(hs)) + spec.offsets[l]

    for i in range(x01.shape[0]):
        if np.any(x01[i] < 0) or np.any(x01[i] > 1):
            continue
        for l in range(spec.num_levels):
            scale = np.float32(spec.cuda_scales[l])
            res = spec.cuda_resolutions[l]
            pg = np.floor(x01[i].astype(np.float32) * scale
                          + np.float32(0.5)).astype(np.int64)
            anchor = _idx(pg, l)
            results = np.zeros(spec.level_dim)
            idelta = np.zeros(spec.level_dim)
            for d in range(3):
                for step in (1, -1):
                    if step == 1 and not pg[d] < res:
                        continue
                    if step == -1 and not pg[d] > 0:
                        continue
                    cp = pg.copy()
                    cp[d] += step
                    diff = tb[:, anchor] - tb[:, _idx(cp, l)]
                    results += diff
                    idelta += diff * diff
            grad[:, anchor] += w * results / np.sqrt(idelta + 1e-9)
    return grad


def test_tv_loss_grad_matches_cuda_semantics(rng):
    """jax.grad of ops.hashgrid.tv_loss reproduces kernel_grad_tv's anchor
    update (gridencoder.cu:507-610) including OOB skip and boundary masks."""
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(11), spec) * 100.0
    x = rng.uniform(-1.2, 1.2, (24, 3)).astype(np.float32)  # some OOB

    g = jax.grad(lambda tb: hashgrid.tv_loss(tb, spec, x=jnp.asarray(x),
                                             weight=1e-3))(table)
    g_oracle = _oracle_tv_grad(x, table, spec, weight=1e-3)
    np.testing.assert_allclose(np.asarray(g), g_oracle, rtol=2e-4, atol=1e-10)
    # Multiple points hit real neighbors: the update must be nontrivial.
    assert np.count_nonzero(np.abs(np.asarray(g)) > 0) > 10


def test_tv_loss_random_points_finite():
    spec = small_spec()
    table = hashgrid.init_table(jax.random.PRNGKey(12), spec)
    loss = hashgrid.tv_loss(table, spec, key=jax.random.PRNGKey(13),
                            num_points=256)
    assert np.isfinite(float(loss))
    with pytest.raises(ValueError):
        hashgrid.tv_loss(table, spec)
