"""Tests for the sort-based Pallas scatter-add (hash-grid table gradients).

Oracle: numpy float64 scatter (and the XLA scatter impl).  The Pallas kernel
runs in interpreter mode on CPU (tests); the same code compiles for TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.ops import hashgrid, scatter


def _oracle(vals, idx, rows):
    out = np.zeros((vals.shape[0], rows))
    np.add.at(out, (slice(None), np.asarray(idx)),
              np.asarray(vals, np.float64))
    return out


@pytest.mark.parametrize("c,m,rows", [(4, 5000, 3000), (1, 2048, 1 << 15),
                                      (4, 513, 1025)])
def test_scatter_matches_f64_oracle(c, m, rows):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, rows, m).astype(np.int32)
    vals = rng.normal(size=(c, m)).astype(np.float32)
    got = scatter.scatter_add_cm(jnp.asarray(vals), jnp.asarray(idx), rows,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), _oracle(vals, idx, rows),
                               atol=5e-5, rtol=5e-5)


def test_scatter_degenerate_all_one_row():
    """Every update hits one row (the worst-case skew: a single tile must
    stream every block)."""
    rng = np.random.default_rng(1)
    c, m, rows = 4, 4096, 3000
    idx = np.full((m,), 7, np.int32)
    vals = rng.normal(size=(c, m)).astype(np.float32)
    got = scatter.scatter_add_cm(jnp.asarray(vals), jnp.asarray(idx), rows,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), _oracle(vals, idx, rows),
                               atol=1e-3 * np.sqrt(m), rtol=1e-5)


def test_scatter_empty_and_boundaries():
    c, rows = 2, 2500
    got = scatter.scatter_add_cm(jnp.zeros((c, 0), jnp.float32),
                                 jnp.zeros((0,), jnp.int32), rows,
                                 interpret=True)
    assert got.shape == (c, rows)
    assert float(jnp.abs(got).max()) == 0.0
    # First/last rows and tile-boundary rows.
    idx = np.array([0, 1023, 1024, 2047, 2048, rows - 1, 0], np.int32)
    vals = np.arange(c * idx.size, dtype=np.float32).reshape(c, idx.size) + 1
    got = scatter.scatter_add_cm(jnp.asarray(vals), jnp.asarray(idx), rows,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), _oracle(vals, idx, rows),
                               atol=1e-6)


def test_gather_rows_vjp_matches_xla_autodiff():
    """The custom VJP (pallas interpret) == plain jnp.take autodiff."""
    rng = np.random.default_rng(2)
    rows, c = 4096, 4
    table = jnp.asarray(rng.normal(size=(c, rows)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, rows, (5, 7, 64)).astype(np.int32))
    cotan = jnp.asarray(
        rng.normal(size=(c, 5, 7, 64)).astype(np.float32))

    def f_custom(t):
        return hashgrid._gather_rows(rows, 1, None, t, gidx)

    def f_plain(t):
        return jnp.take(t, gidx, axis=1)

    out_c, vjp_c = jax.vjp(f_custom, table)
    out_p, vjp_p = jax.vjp(f_plain, table)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_p))

    old = hashgrid.SCATTER_IMPL
    try:
        hashgrid.SCATTER_IMPL = "pallas_interpret"
        (dt_c,) = vjp_c(cotan)
    finally:
        hashgrid.SCATTER_IMPL = old
    (dt_p,) = vjp_p(cotan)
    np.testing.assert_allclose(np.asarray(dt_c), np.asarray(dt_p),
                               atol=1e-4, rtol=1e-4)


def test_encode_hex_cm_grad_pallas_vs_xla():
    """Full encode backward: pallas-interpret scatter == XLA scatter."""
    rng = np.random.default_rng(3)
    spec = hashgrid.HashGridSpec(num_levels=3, level_dim=2,
                                 base_resolution=4, desired_resolution=16,
                                 log2_hashmap_size=8)
    table = jnp.asarray(
        rng.normal(size=(2, spec.table_rows)).astype(np.float32) * 0.1)
    m = 97
    x01 = jnp.asarray(rng.uniform(size=(3, 1, m)).astype(np.float32))
    stds = jnp.asarray(
        rng.uniform(0.001, 0.1, size=(6, m)).astype(np.float32))

    def loss(t):
        feats, _ = hashgrid.encode_hex_cm(x01, stds, t, spec)
        return jnp.sum(feats ** 2)

    old = hashgrid.SCATTER_IMPL
    try:
        hashgrid.SCATTER_IMPL = "xla"
        g_xla = jax.grad(loss)(table)
        hashgrid.SCATTER_IMPL = "pallas_interpret"
        g_pallas = jax.grad(loss)(table)
    finally:
        hashgrid.SCATTER_IMPL = old
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               atol=1e-5, rtol=1e-4)


def test_scatter_segmented_sort():
    """Per-segment sorting (increasing segment index ranges) == flat."""
    rng = np.random.default_rng(4)
    c, rows, nseg, per = 2, 4000, 4, 750
    # Segment s's indices live in [s*1000, s*1000+999] — increasing ranges.
    idx = np.concatenate([
        rng.integers(s * 1000, s * 1000 + 1000, per) for s in range(nseg)
    ]).astype(np.int32)
    vals = rng.normal(size=(c, nseg * per)).astype(np.float32)
    got = scatter.scatter_add_cm(jnp.asarray(vals), jnp.asarray(idx), rows,
                                 interpret=True, sort_segments=nseg)
    np.testing.assert_allclose(np.asarray(got), _oracle(vals, idx, rows),
                               atol=5e-5, rtol=5e-5)


def test_chunked_scatter_matches_xla(rng):
    """scatter_add_chunked_cm (chunk-local sorts + (tile, chunk)
    accumulating grid) vs the XLA oracle — unsorted input, duplicates."""
    from ucnerf_tpu.ops import scatter

    rows, c, m = 5000, 4, 12288
    vals = jnp.asarray(rng.normal(0, 1, (c, m)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, rows, m).astype(np.int32))
    for chunks in (1, 4, 16):
        got = scatter.scatter_add_chunked_cm(
            vals, idx, rows, num_chunks=chunks, tile_rows=1024,
            block_k=512, interpret=True)
        want = scatter.scatter_add_xla(vals, idx, rows)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-4,
                                   err_msg=f"chunks={chunks}")


def test_chunked_scatter_uneven_chunk_padding(rng):
    """chunk length not a block multiple: per-chunk sentinel padding."""
    from ucnerf_tpu.ops import scatter

    rows, c, m = 2048, 4, 6 * 300  # chunk=300 with block_k=256 -> pad 512
    vals = jnp.asarray(rng.normal(0, 1, (c, m)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, rows, m).astype(np.int32))
    got = scatter.scatter_add_chunked_cm(
        vals, idx, rows, num_chunks=6, tile_rows=512, block_k=256,
        interpret=True)
    want = scatter.scatter_add_xla(vals, idx, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-4)


def test_chunked_scatter_concentrated_rows(rng):
    """All updates hit a handful of rows across every chunk: the VMEM tile
    accumulator must sum contributions from all chunks exactly."""
    from ucnerf_tpu.ops import scatter

    rows, c, m = 4096, 4, 8192
    vals = jnp.asarray(np.ones((c, m), np.float32))
    idx = jnp.asarray((rng.integers(0, 3, m) * 1500).astype(np.int32))
    got = scatter.scatter_add_chunked_cm(
        vals, idx, rows, num_chunks=8, tile_rows=1024, block_k=512,
        interpret=True)
    want = scatter.scatter_add_xla(vals, idx, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


def test_partial_scatter_matches_xla(rng):
    """scatter_add_partial_cm (per-level sub-chunk sorts + G partial tables
    summed in XLA) vs the oracle — level-segmented indices, duplicates."""
    from ucnerf_tpu.ops import scatter

    rows, c, nseg, per = 4000, 4, 4, 1536
    idx = np.concatenate([
        rng.integers(s * 1000, s * 1000 + 1000, per) for s in range(nseg)
    ]).astype(np.int32)
    vals = rng.normal(0, 1, (c, nseg * per)).astype(np.float32)
    want = scatter.scatter_add_xla(jnp.asarray(vals), jnp.asarray(idx), rows)
    for chunks in (1, 2, 4):
        got = scatter.scatter_add_partial_cm(
            jnp.asarray(vals), jnp.asarray(idx), rows, num_chunks=chunks,
            sort_segments=nseg, tile_rows=1024, block_k=512, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-4,
                                   err_msg=f"chunks={chunks}")


def test_pack_unpack_bf16_pairs_roundtrip():
    rng = np.random.default_rng(7)
    vals = rng.normal(size=(4, 257)).astype(np.float32)
    bf = np.asarray(jnp.asarray(vals).astype(jnp.bfloat16).astype(
        jnp.float32))
    packed = scatter.pack_bf16_pairs(jnp.asarray(vals))
    assert packed.shape == (2, 257) and packed.dtype == jnp.int32
    got = np.asarray(scatter.unpack_bf16_pairs(packed))
    np.testing.assert_array_equal(got, bf)


def test_scatter_packed_matches_bf16_oracle(rng):
    """scatter_add_packed_cm == f64 scatter of the bf16-rounded values."""
    c, m, rows = 4, 5000, 3000
    idx = rng.integers(0, rows, m).astype(np.int32)
    vals = rng.normal(size=(c, m)).astype(np.float32)
    vals_bf = np.asarray(
        jnp.asarray(vals).astype(jnp.bfloat16).astype(jnp.float32))
    got = scatter.scatter_add_packed_cm(
        jnp.asarray(vals), jnp.asarray(idx), rows, interpret=True)
    np.testing.assert_allclose(np.asarray(got), _oracle(vals_bf, idx, rows),
                               atol=5e-5, rtol=5e-5)


def test_scatter_packed_segmented_matches_flat(rng):
    c, rows, nseg, per = 4, 4000, 4, 750
    idx = np.concatenate([
        rng.integers(s * 1000, s * 1000 + 1000, per) for s in range(nseg)
    ]).astype(np.int32)
    vals = rng.normal(size=(c, nseg * per)).astype(np.float32)
    vals_bf = np.asarray(
        jnp.asarray(vals).astype(jnp.bfloat16).astype(jnp.float32))
    got = scatter.scatter_add_packed_cm(
        jnp.asarray(vals), jnp.asarray(idx), rows, interpret=True,
        sort_segments=nseg)
    np.testing.assert_allclose(np.asarray(got), _oracle(vals_bf, idx, rows),
                               atol=5e-5, rtol=5e-5)


def _dense_oracle(gvals, fracs, base_idx, rows, level_len, strides):
    """numpy f64 8-corner expansion with bf16-rounded fracs."""
    fr = np.asarray(jnp.asarray(fracs).astype(jnp.bfloat16).astype(
        jnp.float32), np.float64)
    out = np.zeros((gvals.shape[0], rows))
    for l, s in enumerate(strides):
        sl = slice(l * level_len, (l + 1) * level_len)
        g = np.asarray(gvals[:, sl], np.float64)
        fx, fy, fz = fr[0, sl], fr[1, sl], fr[2, sl]
        base = base_idx[sl]
        for corner in range(8):
            w = ((fx if corner & 1 else 1 - fx)
                 * (fy if corner & 2 else 1 - fy)
                 * (fz if corner & 4 else 1 - fz))
            off = (corner & 1) + ((corner >> 1) & 1) * s \
                + ((corner >> 2) & 1) * s * s
            np.add.at(out, (slice(None), base + off), w * g)
    return out


def _make_dense_stream(rng, level_sizes, strides, level_len):
    """Random per-level samples whose 8 corners stay inside each level."""
    offs = np.concatenate([[0], np.cumsum(level_sizes)]).astype(np.int64)
    base, gs, frs = [], [], []
    for l, (size, s) in enumerate(zip(level_sizes, strides)):
        span = s * s + s + 1
        hi = size - span - 1
        base.append(rng.integers(0, hi, level_len).astype(np.int64)
                    + offs[l])
    base_idx = np.concatenate(base).astype(np.int32)
    m = len(level_sizes) * level_len
    gvals = rng.normal(size=(4, m)).astype(np.float32)
    fracs = rng.uniform(0, 1, size=(4, m)).astype(np.float32)
    fracs[3] = 0.0
    return gvals, fracs, base_idx, int(offs[-1])


def test_scatter_dense_matches_oracle(rng):
    """Sample-granularity dense scatter vs the f64 corner-expansion oracle;
    multi-level stream with tile-boundary-crossing corner spans."""
    level_sizes = (4920, 35944)   # the real l0/l1 dense sizes
    strides = (17, 34)
    level_len = 700               # not a block multiple: exercises padding
    gvals, fracs, base_idx, rows = _make_dense_stream(
        rng, level_sizes, strides, level_len)
    got = scatter.scatter_add_dense_cm(
        jnp.asarray(gvals), jnp.asarray(fracs), jnp.asarray(base_idx), rows,
        level_len=level_len, strides=strides, tile_rows=4096, block_k=512,
        interpret=True)
    want = _dense_oracle(gvals, fracs, base_idx, rows, level_len, strides)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_scatter_dense_single_level_concentrated(rng):
    """One level, all samples in one cell: duplicate accumulation and the
    span-widened window on a single tile."""
    level_sizes = (8192,)
    strides = (17,)
    level_len = 2048
    base_idx = np.full((level_len,), 4090, np.int32)  # corners cross tile 0/1
    gvals = rng.normal(size=(4, level_len)).astype(np.float32)
    fracs = rng.uniform(0, 1, size=(4, level_len)).astype(np.float32)
    fracs[3] = 0.0
    got = scatter.scatter_add_dense_cm(
        jnp.asarray(gvals), jnp.asarray(fracs), jnp.asarray(base_idx), 8192,
        level_len=level_len, strides=strides, tile_rows=4096, block_k=512,
        interpret=True)
    want = _dense_oracle(gvals, fracs, base_idx, 8192, level_len, strides)
    np.testing.assert_allclose(np.asarray(got), want,
                               atol=1e-3 * np.sqrt(level_len), rtol=1e-4)


def test_scatter_dense_single_pass(rng):
    """two_pass=False rounds the weighted grads to bf16 (~1e-2 rel)."""
    level_sizes = (4920,)
    strides = (17,)
    level_len = 1024
    gvals, fracs, base_idx, rows = _make_dense_stream(
        rng, level_sizes, strides, level_len)
    got = scatter.scatter_add_dense_cm(
        jnp.asarray(gvals), jnp.asarray(fracs), jnp.asarray(base_idx), rows,
        level_len=level_len, strides=strides, interpret=True,
        two_pass=False)
    want = _dense_oracle(gvals, fracs, base_idx, rows, level_len, strides)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("value_dtype,dense", [
    (None, True), ("bfloat16", False), ("bfloat16", True)])
def test_encode_hex_cm_fused_bwd_matches_reference_path(value_dtype, dense):
    """The round-5 fused boundary (sample-granularity dense scatter and/or
    bf16-packed hashed payloads, Pallas interpret) matches the round-4 path
    in values EXACTLY and in gradients up to the documented roundings."""
    spec = hashgrid.HashGridSpec(num_levels=4, level_dim=4,
                                 base_resolution=16, desired_resolution=128,
                                 log2_hashmap_size=14)
    assert spec.dense_prefix >= 1
    assert spec.dense_prefix < spec.num_levels  # both paths exercised
    rng = np.random.default_rng(11)
    n = 300
    x01 = jnp.asarray(rng.uniform(-0.05, 1.05, (3, 6, n)).astype(np.float32))
    stds = jnp.asarray(rng.uniform(0.01, 0.3, (6, n)).astype(np.float32))
    table = jnp.asarray(
        rng.normal(0, 0.1, (4, spec.table_rows)).astype(np.float32))
    cotan_f = jnp.asarray(rng.normal(
        0, 1, (spec.num_levels * 4, n)).astype(np.float32))
    cotan_w = jnp.asarray(rng.normal(
        0, 1, (spec.num_levels, n)).astype(np.float32))

    old_impl = hashgrid.SCATTER_IMPL
    hashgrid.SCATTER_IMPL = "pallas_interpret"
    try:
        def run(**kw):
            def loss(t, x):
                feats, wmeans = hashgrid.encode_hex_cm(x, stds, t, spec,
                                                       **kw)
                return jnp.vdot(feats, cotan_f) + jnp.vdot(wmeans, cotan_w)
            val, grads = jax.value_and_grad(loss, argnums=(0, 1))(table, x01)
            return val, grads

        v_ref, (gt_ref, gx_ref) = run()
        v_new, (gt_new, gx_new) = run(
            bwd_dense_sample=dense,
            bwd_value_dtype=value_dtype)
    finally:
        hashgrid.SCATTER_IMPL = old_impl

    # Forward identical (same gathers, f32 weights).
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    # x-gradient flows through d_w (saved rows) — matches autodiff tightly.
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    # Table gradient: bf16 payload/frac rounding bounds the difference.
    scale = float(jnp.abs(gt_ref).max())
    tol = 2e-2 if value_dtype == "bfloat16" else 1e-2
    np.testing.assert_allclose(np.asarray(gt_new), np.asarray(gt_ref),
                               atol=tol * max(scale, 1e-3), rtol=tol)

def test_scatter_tile_offset_region_matches_full():
    """tile_offset mode: the gridded region matches the full-output kernel;
    rows below tile_offset*tile_rows are undefined and excluded."""
    rng = np.random.default_rng(21)
    c, m, tile = 4, 4000, 1024
    rows = 10 * tile + 300          # unaligned total -> padded last tile
    lo = 3 * tile                   # region start (tile_offset = 3)
    idx = rng.integers(lo, rows, m).astype(np.int32)
    vals = rng.normal(size=(c, m)).astype(np.float32)
    got = scatter.scatter_add_cm(jnp.asarray(vals), jnp.asarray(idx), rows,
                                 tile_rows=tile, tile_offset=3,
                                 interpret=True)
    assert got.shape == (c, rows)
    want = _oracle(vals, idx, rows)
    np.testing.assert_allclose(np.asarray(got)[:, lo:], want[:, lo:],
                               atol=5e-5, rtol=5e-5)


def test_scatter_tile_offset_patch_assembly():
    """The fused-buffer grad assembly recipe (ops/hashgrid.py backward):
    hashed scatter at a tile offset into the full-size buffer + an in-place
    update-slice patch of the dense prefix == oracle over the whole table,
    with an UNALIGNED dense/hashed split inside a straddle tile."""
    rng = np.random.default_rng(22)
    c, tile = 4, 512
    dense_rows = 3 * tile + 100     # split mid-tile: tile 3 is straddled
    total = 9 * tile + 50
    m_d, m_h = 1500, 3000
    idx_d = rng.integers(0, dense_rows, m_d).astype(np.int32)
    idx_h = rng.integers(dense_rows, total, m_h).astype(np.int32)
    vals_d = rng.normal(size=(c, m_d)).astype(np.float32)
    vals_h = rng.normal(size=(c, m_h)).astype(np.float32)
    buf = scatter.scatter_add_cm(
        jnp.asarray(vals_h), jnp.asarray(idx_h), total, tile_rows=tile,
        tile_offset=dense_rows // tile, interpret=True)
    dense = scatter.scatter_add_cm(
        jnp.asarray(vals_d), jnp.asarray(idx_d), dense_rows, tile_rows=tile,
        interpret=True)
    got = jax.lax.dynamic_update_slice(buf, dense, (0, 0))
    want = _oracle(np.concatenate([vals_d, vals_h], axis=1),
                   np.concatenate([idx_d, idx_h]), total)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=5e-5)


def test_scatter_tile_offset_with_segmented_sort():
    """tile_offset composed with sort_segments (the production hashed-level
    call): per-level segments with increasing global row ranges, offset
    region, sentinel padding above the last tile."""
    rng = np.random.default_rng(23)
    c, tile = 4, 512
    lo = 2 * tile + 37              # region start mid-tile (tile_offset = 2)
    rows = 8 * tile + 200
    seg, nseg = 1000, 3
    # Segment s owns an increasing, disjoint row range above lo.
    edges = np.linspace(lo, rows, nseg + 1).astype(np.int64)
    idx = np.concatenate([
        rng.integers(edges[s], edges[s + 1], seg) for s in range(nseg)
    ]).astype(np.int32)
    vals = rng.normal(size=(c, nseg * seg)).astype(np.float32)
    got = scatter.scatter_add_cm(jnp.asarray(vals), jnp.asarray(idx), rows,
                                 tile_rows=tile, tile_offset=2,
                                 sort_segments=nseg, interpret=True)
    want = _oracle(vals, idx, rows)
    np.testing.assert_allclose(np.asarray(got)[:, 2 * tile:],
                               want[:, 2 * tile:], atol=5e-5, rtol=5e-5)
