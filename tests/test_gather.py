"""ops/gather.py — the windowed one-hot MXU forward gather — against
jnp.take, in Pallas interpreter mode (CPU), mirroring the scatter kernel's
test strategy (SURVEY.md §4: Pallas kernels vs pure-XLA oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucnerf_tpu.ops import gather


def _table(rng, c, rows):
    return jnp.asarray(rng.normal(0, 1, (c, rows)).astype(np.float32))


@pytest.mark.parametrize("rows,m,span,k", [
    (4096, 4096, 512, 512),       # uniform density ~1/row
    (1536, 8192, 512, 1024),      # dense: many lookups per window
    (16384, 1024, 512, 512),      # sparse: most windows empty
    (5000, 3000, 512, 512),       # rows not a multiple of span
    (1024, 700, 256, 256),        # m not a multiple of block_k
])
def test_take_cm_matches_xla(rng, rows, m, span, k):
    tbl = _table(rng, 4, rows)
    idx = jnp.asarray(rng.integers(0, rows, m).astype(np.int32))
    got = gather.take_cm(tbl, idx, span_rows=span, block_k=k,
                         interpret=True)
    want = jnp.take(tbl, idx, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_take_cm_two_pass_precision(rng):
    """The hi+lo bf16 split recovers ~f32 values; single-pass rounds."""
    rows, m = 2048, 2048
    tbl = _table(rng, 4, rows) * 37.0 + 11.0
    idx = jnp.asarray(rng.integers(0, rows, m).astype(np.int32))
    want = np.asarray(jnp.take(tbl, idx, axis=1))

    exact = np.asarray(gather.take_cm(tbl, idx, interpret=True,
                                      two_pass=True))
    np.testing.assert_allclose(exact, want, rtol=3e-5)

    rounded = np.asarray(gather.take_cm(tbl, idx, interpret=True,
                                        two_pass=False))
    np.testing.assert_allclose(rounded, want, rtol=1e-2)
    assert np.abs(rounded - want).max() > np.abs(exact - want).max()


def test_take_cm_duplicate_and_boundary_indices(rng):
    rows = 2048
    # Every index is a window/lane boundary case or a duplicate.
    special = np.array([0, 127, 128, 129, 511, 512, 513, rows - 1, rows - 1,
                        0, 512, 1024, 1535, 1536], np.int32)
    idx = jnp.asarray(np.tile(special, 40))
    tbl = _table(rng, 4, rows)
    got = gather.take_cm(tbl, idx, span_rows=512, block_k=256,
                         interpret=True)
    want = jnp.take(tbl, idx, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_take_cm_preserves_shape(rng):
    tbl = _table(rng, 4, 1024)
    idx = jnp.asarray(rng.integers(0, 1024, (16, 3, 20)).astype(np.int32))
    got = gather.take_cm(tbl, idx, span_rows=256, block_k=256,
                         interpret=True)
    assert got.shape == (4, 16, 3, 20)
    want = jnp.take(tbl, idx, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_gather_sorted_sentinel_rows_are_zero(rng):
    """Entries at the padded row bound (the sort-padding sentinel) must
    produce zeros, not garbage."""
    rows = 1000  # pads to 1024 with span 512
    tbl = _table(rng, 4, rows)
    sidx = jnp.asarray(
        np.concatenate([np.sort(rng.integers(0, rows, 500)),
                        np.full(12, 1024)]).astype(np.int32))
    got = np.asarray(gather.gather_sorted_cm(tbl, sidx, rows, span_rows=512,
                                             block_k=256, interpret=True))
    want = np.asarray(jnp.take(tbl, sidx[:500], axis=1))
    np.testing.assert_allclose(got[:, :500], want, rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(got[:, 500:], 0.0)


def test_take_cm_skewed_distribution(rng):
    """Hash-level-like skew: half the stream hits a tiny dense range (one
    window), the rest spreads over everything — exercises nblk >> 1 in one
    window and overrun chains through empty windows."""
    rows = 8192
    tbl = _table(rng, 4, rows)
    dense = rng.integers(0, 64, 4096)
    sparse = rng.integers(4096, rows, 512)
    idx = jnp.asarray(np.concatenate([dense, sparse]).astype(np.int32))
    got = gather.take_cm(tbl, idx, span_rows=512, block_k=512,
                         interpret=True)
    want = jnp.take(tbl, idx, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_hashgrid_encode_with_pallas_gather(rng, monkeypatch):
    """encode_hex_cm end-to-end equivalence: Pallas forward gather (interpret)
    vs the native XLA gather — values AND table gradients."""
    from ucnerf_tpu.ops import hashgrid

    spec = hashgrid.HashGridSpec(num_levels=4, level_dim=4,
                                 base_resolution=16, desired_resolution=128,
                                 log2_hashmap_size=12)
    table = hashgrid.init_table(jax.random.PRNGKey(0), spec)
    m = 512
    x01 = jnp.asarray(rng.uniform(0, 1, (3, 6, m)).astype(np.float32))
    stds = jnp.asarray(
        rng.uniform(0.001, 0.1, (6, m)).astype(np.float32))

    def run(impl):
        monkeypatch.setattr(hashgrid, "GATHER_IMPL", impl)

        def loss(t):
            feats, wmeans = hashgrid.encode_hex_cm(x01, stds, t, spec)
            return jnp.sum(feats * jnp.arange(feats.size).reshape(
                feats.shape)), feats

        (val, feats), grad = jax.value_and_grad(loss, has_aux=True)(table)
        return np.asarray(feats), np.asarray(grad)

    feats_x, grad_x = run("xla")
    feats_p, grad_p = run("pallas_interpret")
    np.testing.assert_allclose(feats_p, feats_x, rtol=3e-5, atol=1e-7)
    np.testing.assert_allclose(grad_p, grad_x, rtol=3e-5, atol=1e-7)
