"""TPU-native scatter-add for hash-grid table gradients.

XLA's ``scatter-add`` lowers to a serial per-element loop on TPU (~85 ns per
update measured on v5e) — at canonical UC-NeRF training sizes that is ~400 ms
per microbatch, 40x the rest of the train step combined.  This module replaces
the reference CUDA kernel's ``atomicAdd`` backward
(``/root/reference/nerf/gridencoder/src/gridencoder.cu:249-340``) with a
deterministic sort-based Pallas design (SURVEY.md §7 "hard parts"):

1. Sort the (row-index, C-channel update) pairs by row index — XLA's bitonic
   ``lax.sort`` is fast and fully vectorized on TPU.
2. ``searchsorted`` the table-tile boundaries in the sorted index stream —
   each tile of ``tile_rows`` rows owns a contiguous slice of updates.
3. A Pallas kernel grids over table tiles.  Each step double-buffers DMAs of
   its K-element update blocks from HBM and accumulates them into the
   VMEM-resident output tile via a FACTORED one-hot contraction: the local
   row index splits as ``local = hi * 128 + lo``; update block
   ``A[(c,hi), k] = val[c,k] * (hi_k == hi)`` contracts with
   ``W[lo, k] = (lo_k == lo)`` on the MXU, giving ``out2[(c,hi), lo]``.
   The factoring keeps the matmul at full MXU width (C*tile/128 x K x 128)
   instead of a C-row-thin [C, K] x [K, tile] product — ~10x fewer MXU
   cycles at C=4, and the VPU compare cost drops from K*tile to
   K*(tile/128 + 128) per block.

Duplicate indices sum exactly (multiple one-hot columns hit the same row);
summation order is fixed by the sort — bitwise deterministic, unlike the
reference's atomics.  Update values are split into two bf16 pieces for the
MXU (hi + lo carries ~16 mantissa bits, relative error ~1e-5); one-hot
entries are exact in bf16.

The kernel touches every output tile exactly once, so HBM write traffic is
one pass over the gradient table; update blocks stream at DMA bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _scatter_kernel(blk_lo_ref, nblk_ref, sidx_ref, sval_ref, out_ref,
                    idx_buf, val_buf, acc, idx_sem, val_sem,
                    *, block_k: int, tile_rows: int, channels: int):
    """One table tile: stream sorted-update blocks, factored one-hot MXU."""
    t = pl.program_id(0)
    r_hi = tile_rows // _LANE
    acc[...] = jnp.zeros_like(acc)
    lo_blk = blk_lo_ref[t]
    n = nblk_ref[t]
    row0 = t * tile_rows

    def get_dmas(slot, b):
        start = (lo_blk + b) * block_k
        cp_i = pltpu.make_async_copy(
            sidx_ref.at[:, pl.ds(start, block_k)], idx_buf.at[slot],
            idx_sem.at[slot])
        cp_v = pltpu.make_async_copy(
            sval_ref.at[:, pl.ds(start, block_k)], val_buf.at[slot],
            val_sem.at[slot])
        return cp_i, cp_v

    @pl.when(n > 0)
    def _():
        cp_i, cp_v = get_dmas(0, 0)
        cp_i.start()
        cp_v.start()

        def body(b, carry):
            slot = jax.lax.rem(b, 2)

            @pl.when(b + 1 < n)
            def _():
                ni, nv = get_dmas(jax.lax.rem(b + 1, 2), b + 1)
                ni.start()
                nv.start()

            cp_i, cp_v = get_dmas(slot, b)
            cp_i.wait()
            cp_v.wait()

            local = idx_buf[slot] - row0                  # [1, K]
            hi = jax.lax.shift_right_arithmetic(local, 7)  # [1, K]
            lo = jax.lax.bitwise_and(local, _LANE - 1)
            # Out-of-tile entries (block overlap at tile boundaries and the
            # sentinel padding) have hi outside [0, r_hi) -> zero A column.
            hi_iota = jax.lax.broadcasted_iota(
                jnp.int32, (r_hi, block_k), 0)
            hmask = (hi_iota == hi)                       # [r_hi, K]
            lo_iota = jax.lax.broadcasted_iota(
                jnp.int32, (_LANE, block_k), 0)
            w2 = (lo_iota == lo).astype(jnp.bfloat16)     # [128, K]

            vals = val_buf[slot]                          # [C, K] f32
            a = jnp.where(hmask[None], vals[:, None, :], 0.0)
            a = a.reshape(channels * r_hi, block_k)       # [C*r_hi, K]
            # Two-pass bf16 split: exact one-hot x (hi + lo mantissa halves).
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (1,)), ((), ()))
            out2 = jax.lax.dot_general(
                a_hi, w2, dims, preferred_element_type=jnp.float32)
            out2 += jax.lax.dot_general(
                a_lo, w2, dims, preferred_element_type=jnp.float32)
            acc[...] += out2.reshape(channels, r_hi * _LANE)
            return carry

        jax.lax.fori_loop(0, n, body, 0)

    out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("num_rows", "tile_rows",
                                             "block_k", "interpret",
                                             "sort_segments"))
def scatter_add_cm(values, idx, num_rows: int, *, tile_rows: int = 4096,
                   block_k: int = 1024, interpret: bool = False,
                   sort_segments: int = 1):
    """Deterministic scatter-add: out[:, idx[m]] += values[:, m].

    Args:
      values: [C, M] float32 updates (channel-major).
      idx: [M] int32 row indices in [0, num_rows).
      num_rows: static output column count.
      tile_rows: rows per output tile (VMEM accumulator; multiple of 128).
      block_k: updates per DMA/matmul block.
      interpret: run the Pallas kernel in interpreter mode (CPU testing).
      sort_segments: split the stream into this many equal contiguous
        segments and sort each independently.  ONLY valid when every index
        in segment s is < every index in segment s+1 (e.g. per-level slices
        of a packed hash table, where level row offsets are increasing) —
        the concatenation of per-segment sorted streams is then globally
        sorted, and S smaller bitonic sorts beat one big one (~2x measured).

    Returns:
      [C, num_rows] float32.
    """
    c, m = values.shape
    assert tile_rows % _LANE == 0
    rows_pad = _round_up(num_rows, tile_rows)
    num_tiles = rows_pad // tile_rows

    # 1) Sort by row index, channels as payloads (single fused bitonic sort;
    # optionally segmented, see sort_segments).
    if sort_segments > 1 and m % sort_segments == 0 and m > 0:
        seg = m // sort_segments
        parts = []
        for s in range(sort_segments):
            sl = slice(s * seg, (s + 1) * seg)
            parts.append(jax.lax.sort(
                (idx[sl],) + tuple(values[:, sl]), dimension=0, num_keys=1))
        sidx = jnp.concatenate([p[0] for p in parts])
        svals = jnp.concatenate(
            [jnp.stack(p[1:], axis=0) for p in parts], axis=1)
    else:
        sorted_all = jax.lax.sort((idx,) + tuple(values), dimension=0,
                                  num_keys=1)
        sidx, svals = sorted_all[0], jnp.stack(sorted_all[1:], axis=0)

    # 2) Pad the stream to whole blocks; sentinel rows land beyond every tile.
    m_pad = _round_up(max(m, 1), block_k)
    sidx = jnp.concatenate(
        [sidx, jnp.full((m_pad - m,), rows_pad, jnp.int32)])
    svals = jnp.concatenate(
        [svals, jnp.zeros((c, m_pad - m), svals.dtype)], axis=1)

    # 3) Tile boundaries in the sorted stream -> per-tile block ranges.
    bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * tile_rows
    starts = jnp.searchsorted(sidx, bounds, side="left").astype(jnp.int32)
    blk_lo = starts[:-1] // block_k
    has_any = starts[1:] > starts[:-1]
    blk_hi = jnp.where(has_any, (starts[1:] - 1) // block_k + 1, blk_lo)
    nblk = blk_hi - blk_lo

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (c, tile_rows), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, block_k), jnp.int32),
            pltpu.VMEM((2, c, block_k), jnp.float32),
            pltpu.VMEM((c, tile_rows), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, block_k=block_k,
                          tile_rows=tile_rows, channels=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, rows_pad), jnp.float32),
        interpret=interpret,
    )(blk_lo, nblk, sidx[None, :], svals)
    return out[:, :num_rows]


@functools.partial(jax.jit, static_argnames=("num_rows", "num_chunks",
                                             "sort_segments", "tile_rows",
                                             "block_k", "interpret"))
def scatter_add_partial_cm(values, idx, num_rows: int, *, num_chunks: int,
                           sort_segments: int = 1, tile_rows: int = 4096,
                           block_k: int = 1024, interpret: bool = False):
    """Partial-table chunked scatter-add (round-3 PERF_NOTES' own sketch for
    harvesting the backward-sort-granularity lever).

    The stream's ``sort_segments`` level segments each split into
    ``num_chunks`` sub-chunks; chunk g of every level concatenates into an
    independent stream (still level-ordered, so per-segment sorts remain
    valid) that scatters into its OWN partial table via the production
    kernel; the G tables sum in XLA.  Finer sorts (seg/G elements each) are
    cheaper per element; the price is G-1 extra kernel passes over the
    table grid plus one G-way table reduction.

    MEASURED OUTCOME (PERF_NOTES round 4): net negative at real scale — the
    per-pass kernel grid cost (~1.6K tiles x ~3 us, paid G times) plus the
    [G, C, rows] reduction exceeds the few-ms sort saving; recorded with the
    arithmetic, closing the lever.  scatter_add_cm stays production.

    Requires M % (sort_segments * num_chunks) == 0.
    """
    c, m = values.shape
    ls = sort_segments * num_chunks
    assert m % ls == 0, (m, sort_segments, num_chunks)
    sub = m // ls
    vals4 = values.reshape(c, sort_segments, num_chunks, sub)
    idx3 = idx.reshape(sort_segments, num_chunks, sub)
    partials = []
    for g in range(num_chunks):
        vg = vals4[:, :, g].reshape(c, -1)
        ig = idx3[:, g].reshape(-1)
        partials.append(scatter_add_cm(
            vg, ig, num_rows, tile_rows=tile_rows, block_k=block_k,
            interpret=interpret, sort_segments=sort_segments))
    out = partials[0]
    for p in partials[1:]:
        out = out + p
    return out


def scatter_add_xla(values, idx, num_rows: int):
    """XLA reference implementation (the test oracle; slow on TPU)."""
    c = values.shape[0]
    out = jnp.zeros((c, num_rows), values.dtype)
    return out.at[:, idx].add(values)


def _chunked_scatter_kernel(blk_lo_ref, nblk_ref, sidx_ref, sval_ref,
                            out_ref, idx_buf, val_buf, acc, idx_sem, val_sem,
                            *, block_k: int, tile_rows: int, channels: int):
    """(tile, chunk) accumulating grid: the chunk axis varies fastest, so the
    output tile stays VMEM-resident while every chunk's contribution for this
    tile accumulates; the sort only needs to be valid WITHIN each chunk."""
    t = pl.program_id(0)
    g = pl.program_id(1)
    num_chunks = pl.num_programs(1)
    r_hi = tile_rows // _LANE

    @pl.when(g == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    lo_blk = blk_lo_ref[t, g]
    n = nblk_ref[t, g]
    row0 = t * tile_rows

    def get_dmas(slot, b):
        start = (lo_blk + b) * block_k
        cp_i = pltpu.make_async_copy(
            sidx_ref.at[:, pl.ds(start, block_k)], idx_buf.at[slot],
            idx_sem.at[slot])
        cp_v = pltpu.make_async_copy(
            sval_ref.at[:, pl.ds(start, block_k)], val_buf.at[slot],
            val_sem.at[slot])
        return cp_i, cp_v

    @pl.when(n > 0)
    def _():
        cp_i, cp_v = get_dmas(0, 0)
        cp_i.start()
        cp_v.start()

        def body(b, carry):
            slot = jax.lax.rem(b, 2)

            @pl.when(b + 1 < n)
            def _():
                ni, nv = get_dmas(jax.lax.rem(b + 1, 2), b + 1)
                ni.start()
                nv.start()

            cp_i, cp_v = get_dmas(slot, b)
            cp_i.wait()
            cp_v.wait()

            local = idx_buf[slot] - row0
            hi = jax.lax.shift_right_arithmetic(local, 7)
            lo = jax.lax.bitwise_and(local, _LANE - 1)
            hi_iota = jax.lax.broadcasted_iota(
                jnp.int32, (r_hi, block_k), 0)
            hmask = (hi_iota == hi)
            lo_iota = jax.lax.broadcasted_iota(
                jnp.int32, (_LANE, block_k), 0)
            w2 = (lo_iota == lo).astype(jnp.bfloat16)

            vals = val_buf[slot]
            a = jnp.where(hmask[None], vals[:, None, :], 0.0)
            a = a.reshape(channels * r_hi, block_k)
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (1,)), ((), ()))
            out2 = jax.lax.dot_general(
                a_hi, w2, dims, preferred_element_type=jnp.float32)
            out2 += jax.lax.dot_general(
                a_lo, w2, dims, preferred_element_type=jnp.float32)
            acc[...] += out2.reshape(channels, r_hi * _LANE)
            return carry

        jax.lax.fori_loop(0, n, body, 0)

    @pl.when(g == num_chunks - 1)
    def _():
        out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("num_rows", "num_chunks",
                                             "tile_rows", "block_k",
                                             "interpret"))
def scatter_add_chunked_cm(values, idx, num_rows: int, *, num_chunks: int,
                           tile_rows: int = 4096, block_k: int = 1024,
                           interpret: bool = False):
    """Deterministic scatter-add with CHUNK-LOCAL sorting (round-3
    PERF_NOTES: backward sort granularity is a measured 19% step swing).

    The stream splits into ``num_chunks`` equal contiguous chunks with NO
    cross-chunk ordering requirement; each chunk is sorted independently —
    as one batched ``lax.sort`` over the reshaped [G, M/G] view, which is
    2-3x faster than one flat sort at G >= 32 — and the kernel grids over
    (tile, chunk) with the output tile accumulating in VMEM across the
    chunk axis.

    MEASURED OUTCOME (PERF_NOTES round 3): at real scale (9.2M updates,
    6.6M rows) the best configuration (G=24, tile 16384) runs 52.6 ms vs
    scatter_add_cm's 36.0 ms — the (tile x chunk) grid's ~7 us/step fixed
    cost exceeds the batched-sort savings, and the SMEM footprint of the
    [T, G] block-range prefetch forces tiles >= 8192.  Kept as the
    tested record of the design point; scatter_add_cm remains the
    production path.

    Requires M % num_chunks == 0.  Returns [C, num_rows] float32, bitwise
    deterministic (fixed chunk order).
    """
    c, m = values.shape
    assert tile_rows % _LANE == 0
    assert m % num_chunks == 0, (m, num_chunks)
    chunk = m // num_chunks
    rows_pad = _round_up(num_rows, tile_rows)
    num_tiles = rows_pad // tile_rows

    # 1) Chunk-local sort, batched as ONE op over the [G, chunk] view.
    ops = (idx.reshape(num_chunks, chunk),) + tuple(
        values[ch].reshape(num_chunks, chunk) for ch in range(c))
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    sidx2 = sorted_ops[0]                          # [G, chunk]
    svals2 = jnp.stack(sorted_ops[1:], axis=0)     # [C, G, chunk]

    # 2) Pad each chunk to whole blocks (sentinels land beyond every tile).
    chunk_pad = _round_up(chunk, block_k)
    if chunk_pad != chunk:
        sidx2 = jnp.concatenate(
            [sidx2, jnp.full((num_chunks, chunk_pad - chunk), rows_pad,
                             jnp.int32)], axis=1)
        svals2 = jnp.concatenate(
            [svals2, jnp.zeros((c, num_chunks, chunk_pad - chunk),
                               svals2.dtype)], axis=2)
    sidx = sidx2.reshape(-1)
    svals = svals2.reshape(c, -1)

    # 3) Per-(tile, chunk) block ranges in the padded stream.
    bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * tile_rows
    # starts[g, t] = first position in chunk g with row >= t*tile_rows.
    starts = jax.vmap(
        lambda s: jnp.searchsorted(s, bounds, side="left").astype(jnp.int32)
    )(sidx2)                                        # [G, T+1]
    base = (jnp.arange(num_chunks, dtype=jnp.int32) * chunk_pad)[:, None]
    abs_starts = starts + base
    blk_lo = abs_starts[:, :-1] // block_k          # [G, T]
    has_any = starts[:, 1:] > starts[:, :-1]
    blk_hi = jnp.where(has_any, (abs_starts[:, 1:] - 1) // block_k + 1,
                       blk_lo)
    nblk = (blk_hi - blk_lo).T.copy()               # [T, G]
    blk_lo = blk_lo.T.copy()                        # [T, G]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles, num_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (c, tile_rows), lambda t, g, *_: (0, t),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, block_k), jnp.int32),
            pltpu.VMEM((2, c, block_k), jnp.float32),
            pltpu.VMEM((c, tile_rows), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_chunked_scatter_kernel, block_k=block_k,
                          tile_rows=tile_rows, channels=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, rows_pad), jnp.float32),
        interpret=interpret,
    )(blk_lo, nblk, sidx[None, :], svals)
    return out[:, :num_rows]
