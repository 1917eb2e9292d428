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
