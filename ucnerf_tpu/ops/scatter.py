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
                    *, block_k: int, tile_rows: int, channels: int,
                    tile_offset: int = 0):
    """One table tile: stream sorted-update blocks, factored one-hot MXU."""
    t = pl.program_id(0)
    r_hi = tile_rows // _LANE
    acc[...] = jnp.zeros_like(acc)
    lo_blk = blk_lo_ref[t]
    n = nblk_ref[t]
    row0 = (t + tile_offset) * tile_rows

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
                                             "sort_segments", "tile_offset"))
def scatter_add_cm(values, idx, num_rows: int, *, tile_rows: int = 4096,
                   block_k: int = 1024, interpret: bool = False,
                   sort_segments: int = 1, tile_offset: int = 0):
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
      tile_offset: skip the first ``tile_offset`` output tiles: the kernel
        grids only over tiles [tile_offset, ceil(num_rows/tile_rows)), so
        rows below ``tile_offset * tile_rows`` come back UNDEFINED (garbage)
        and every index must be >= that bound.  Used by the fused-buffer
        grad assembly (ops/hashgrid.py): the hashed-level scatter writes its
        region of the full-table buffer directly and the caller patches the
        small dense prefix in-place, eliminating the [C, total] concat
        epilogue (~47 ms/step at flagship scale, PERF_NOTES round 5).

    Returns:
      [C, num_rows] float32 (columns below tile_offset*tile_rows undefined
      when tile_offset > 0).
    """
    c, m = values.shape
    assert tile_rows % _LANE == 0
    rows_pad = _round_up(num_rows, tile_rows)
    num_tiles = rows_pad // tile_rows
    assert 0 <= tile_offset < num_tiles

    # 1) Sort by row index, channels as payloads (single fused bitonic sort;
    # optionally segmented, see sort_segments).  NOTE (clean same-session
    # A/B, round 5): batching the equal-length segments into ONE lax.sort
    # over the [S, M/S] view regresses the flagship train step 12015 ->
    # 7657 rays/s on v5e — the multi-row batched sort lowers far worse than
    # a loop of flat sorts at [6, 1M]-scale operands.  Loop stays.
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

    # 3) Tile boundaries in the sorted stream -> per-tile block ranges
    # (tiles below tile_offset are never gridded; their rows hold no keys).
    grid_tiles = num_tiles - tile_offset
    bounds = (jnp.arange(grid_tiles + 1, dtype=jnp.int32)
              + tile_offset) * tile_rows
    starts = jnp.searchsorted(sidx, bounds, side="left").astype(jnp.int32)
    blk_lo = starts[:-1] // block_k
    has_any = starts[1:] > starts[:-1]
    blk_hi = jnp.where(has_any, (starts[1:] - 1) // block_k + 1, blk_lo)
    nblk = blk_hi - blk_lo

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (c, tile_rows), lambda t, *_: (0, t + tile_offset),
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
        functools.partial(_scatter_kernel, block_k=block_k,
                          tile_rows=tile_rows, channels=c,
                          tile_offset=tile_offset),
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


# ---------------------------------------------------------------------------
# Round-5 backward-sort redesign (PERF_NOTES round 4: sorts are ~26% of the
# flagship step and feed a kernel that only needs tile-GROUPED updates).
# Two complementary reductions of the sorted-stream byte volume:
#
#   * scatter_add_packed_cm — the 4 f32 value channels round to bf16 and pack
#     pairwise into 2 int32 payloads, turning the 5-array bitonic sort into a
#     3-array one (~0.5x bytes/stage).  The kernel's MXU contraction was
#     ALREADY rounding values through a two-bf16 split; packing moves the
#     rounding before the sort and drops the split (single-pass matmul).
#     Precision: one bf16 rounding per update term (~0.4% rel), accumulated
#     in f32 in deterministic sorted order — comparable to the reference's
#     own half-precision path (atomicAdd __half2, gridencoder.cu:325-338),
#     which rounds to fp16 AND accumulates in fp16 nondeterministically.
#
#   * scatter_add_dense_cm — for levels whose corner index is the LINEAR cell
#     index (no spatial hash, no modulo), all 8 corner rows of a sample sit
#     at static stride offsets from corner 0.  Sorting SAMPLES (1/8 the
#     stream) keyed by the corner-0 row with payload (4 f32 feature grads +
#     3 bf16-packed fractional coords) carries 28 B/sample through the sort
#     instead of 8 x 20 B/corner-update (0.175x); the kernel re-derives the
#     8 trilinear weights and corner rows in-VMEM.  Per-tile update windows
#     widen by the corner span (stride^2+stride+1 rows); out-of-tile entries
#     are masked by the factored one-hot exactly as in the base kernel.
# ---------------------------------------------------------------------------

_HI16 = np.uint32(0xFFFF0000)


def pack_bf16_pairs(values):
    """Round [C, M] f32 to bf16 and pack channel pairs into int32.

    Channel c pairs with channel c + C/2: payload p[c] carries channel c in
    its high 16 bits and channel c + C/2 in its low 16, so unpacking is a
    mask / shift plus a concatenate (no interleave).  Returns [C//2, M] i32.
    """
    c = values.shape[0]
    assert c % 2 == 0, c
    half = c // 2
    bits = jax.lax.bitcast_convert_type(
        values.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32)
    packed = (bits[:half] & _HI16) | (bits[half:] >> np.uint32(16))
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


def unpack_bf16_pairs(packed):
    """Inverse of pack_bf16_pairs: [P, ...] i32 -> [2P, ...] f32
    (bf16-valued; top halves first, matching the pack's channel order)."""
    bits = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    top = jax.lax.bitcast_convert_type(bits & _HI16, jnp.float32)
    bot = jax.lax.bitcast_convert_type(bits << np.uint32(16), jnp.float32)
    return jnp.concatenate([top, bot], axis=0)


def _scatter_kernel_packed(blk_lo_ref, nblk_ref, sidx_ref, sval_ref, out_ref,
                           idx_buf, val_buf, acc, idx_sem, val_sem,
                           *, block_k: int, tile_rows: int, channels: int):
    """Packed-payload tile kernel: values arrive as bf16 pairs in int32, so
    the one-hot contraction runs as a SINGLE bf16 matmul (no two-pass
    split — the rounding already happened at pack time)."""
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
            hi = jax.lax.shift_right_arithmetic(local, 7)
            lo = jax.lax.bitwise_and(local, _LANE - 1)
            hi_iota = jax.lax.broadcasted_iota(
                jnp.int32, (r_hi, block_k), 0)
            hmask = (hi_iota == hi)
            lo_iota = jax.lax.broadcasted_iota(
                jnp.int32, (_LANE, block_k), 0)
            w2 = (lo_iota == lo).astype(jnp.bfloat16)     # [128, K]

            vals = unpack_bf16_pairs(val_buf[slot])       # [C, K] bf16-valued
            a = jnp.where(hmask[None], vals[:, None, :], 0.0)
            # bf16 cast is EXACT: entries are bf16-valued already.
            a = a.reshape(channels * r_hi, block_k).astype(jnp.bfloat16)
            dims = (((1,), (1,)), ((), ()))
            out2 = jax.lax.dot_general(
                a, w2, dims, preferred_element_type=jnp.float32)
            acc[...] += out2.reshape(channels, r_hi * _LANE)
            return carry

        jax.lax.fori_loop(0, n, body, 0)

    out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("num_rows", "tile_rows",
                                             "block_k", "interpret",
                                             "sort_segments"))
def scatter_add_packed_cm(values, idx, num_rows: int, *,
                          tile_rows: int = 4096, block_k: int = 1024,
                          interpret: bool = False, sort_segments: int = 1):
    """Deterministic scatter-add with bf16-packed value payloads.

    Semantics of ``scatter_add_cm`` with each update value rounded once to
    bf16 (RNE) before the deterministic f32 accumulation.  The sort carries
    3 arrays (row key + C/2 packed payloads) instead of 1 + C — the measured
    first-order cost of the backward (PERF_NOTES rounds 3-4).

    Args mirror scatter_add_cm; C must be even.  Equal-length segment sorts
    batch into ONE lax.sort over the reshaped [S, M/S] view.
    """
    c, m = values.shape
    assert c % 2 == 0, c
    assert tile_rows % _LANE == 0
    rows_pad = _round_up(num_rows, tile_rows)
    num_tiles = rows_pad // tile_rows
    packed = pack_bf16_pairs(values)                      # [C//2, M]

    if sort_segments > 1 and m % sort_segments == 0 and m > 0:
        # Loop of flat per-segment sorts — a batched [S, M/S] sort lowers
        # pathologically on v5e (see the note in scatter_add_cm).
        seg = m // sort_segments
        parts = []
        for s in range(sort_segments):
            sl = slice(s * seg, (s + 1) * seg)
            parts.append(jax.lax.sort(
                (idx[sl],) + tuple(packed[:, sl]), dimension=0, num_keys=1))
        sidx = jnp.concatenate([p[0] for p in parts])
        svals = jnp.concatenate(
            [jnp.stack(p[1:], axis=0) for p in parts], axis=1)
    else:
        sorted_all = jax.lax.sort((idx,) + tuple(packed), dimension=0,
                                  num_keys=1)
        sidx, svals = sorted_all[0], jnp.stack(sorted_all[1:], axis=0)

    m_pad = _round_up(max(m, 1), block_k)
    sidx = jnp.concatenate(
        [sidx, jnp.full((m_pad - m,), rows_pad, jnp.int32)])
    svals = jnp.concatenate(
        [svals, jnp.zeros((c // 2, m_pad - m), svals.dtype)], axis=1)

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
            pltpu.VMEM((2, c // 2, block_k), jnp.int32),
            pltpu.VMEM((c, tile_rows), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_scatter_kernel_packed, block_k=block_k,
                          tile_rows=tile_rows, channels=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, rows_pad), jnp.float32),
        interpret=interpret,
    )(blk_lo, nblk, sidx[None, :], svals)
    return out[:, :num_rows]


def _scatter_kernel_dense(blk_lo_ref, nblk_ref, sidx_ref, sg_ref, sf_ref,
                          out_ref, idx_buf, g_buf, f_buf, acc,
                          idx_sem, g_sem, f_sem,
                          *, block_k: int, tile_rows: int, channels: int,
                          strides, level_blocks: int, two_pass: bool):
    """Sample-granularity tile kernel for dense (non-hashed) levels.

    Each stream element is one SAMPLE: key = corner-0 row (global), payload
    = [C] f32 upstream feature grad + 3 bf16 fractional coords.  The kernel
    re-derives the 8 trilinear weights and corner rows (static per-level
    stride offsets) and contracts all 8 corners in one batched one-hot MXU
    matmul.  Rows outside this tile — including corners that spilled past
    the tile edge, handled by the caller's span-widened windows — fall
    outside the factored one-hot and contribute zero.

    Level selection is SCALAR per block: each level's stream is padded to a
    multiple of block_k, so a block never straddles levels and its level is
    its global block index // level_blocks.
    """
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
        cp_g = pltpu.make_async_copy(
            sg_ref.at[:, pl.ds(start, block_k)], g_buf.at[slot],
            g_sem.at[slot])
        cp_f = pltpu.make_async_copy(
            sf_ref.at[:, pl.ds(start, block_k)], f_buf.at[slot],
            f_sem.at[slot])
        return cp_i, cp_g, cp_f

    @pl.when(n > 0)
    def _():
        for cp in get_dmas(0, 0):
            cp.start()

        def body(b, carry):
            slot = jax.lax.rem(b, 2)

            @pl.when(b + 1 < n)
            def _():
                for cp in get_dmas(jax.lax.rem(b + 1, 2), b + 1):
                    cp.start()

            cp_i, cp_g, cp_f = get_dmas(slot, b)
            cp_i.wait()
            cp_g.wait()
            cp_f.wait()

            # Scalar level id -> this block's corner stride.
            gb = lo_blk + b
            lvl = gb // level_blocks
            stride = jnp.int32(strides[-1])
            for l in range(len(strides) - 1):
                stride = jnp.where(lvl == l, np.int32(strides[l]), stride)
            stride2 = stride * stride

            base = idx_buf[slot]                          # [1, K] global rows
            g = g_buf[slot]                               # [C, K] f32
            fr = unpack_bf16_pairs(f_buf[slot])           # [4, K]: fx fy fz 0
            fx, fy, fz = fr[0:1], fr[1:2], fr[2:3]        # [1, K] each

            hi_iota = jax.lax.broadcasted_iota(
                jnp.int32, (r_hi, block_k), 0)
            lo_iota = jax.lax.broadcasted_iota(
                jnp.int32, (_LANE, block_k), 0)

            dim_strides = (jnp.int32(1), stride, stride2)
            a_his, a_los, w2s = [], [], []
            for corner in range(8):
                off = jnp.int32(0)
                wc = jnp.ones_like(fx)
                for d, f in enumerate((fx, fy, fz)):
                    if corner & (1 << d):
                        wc = wc * f
                        off = off + dim_strides[d]
                    else:
                        wc = wc * (1.0 - f)
                local = base + off - row0
                hi = jax.lax.shift_right_arithmetic(local, 7)
                lo = jax.lax.bitwise_and(local, _LANE - 1)
                hmask = (hi_iota == hi)
                w2s.append((lo_iota == lo).astype(jnp.bfloat16))
                val = wc * g                              # [C, K]
                a = jnp.where(hmask[None], val[:, None, :], 0.0)
                a = a.reshape(channels * r_hi, block_k)
                a_hi = a.astype(jnp.bfloat16)
                a_his.append(a_hi)
                if two_pass:
                    a_los.append(
                        (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16))

            a_hi8 = jnp.stack(a_his)                      # [8, C*r_hi, K]
            w28 = jnp.stack(w2s)                          # [8, 128, K]
            dims = (((2,), (2,)), ((0,), (0,)))
            out3 = jax.lax.dot_general(
                a_hi8, w28, dims, preferred_element_type=jnp.float32)
            if two_pass:
                out3 += jax.lax.dot_general(
                    jnp.stack(a_los), w28, dims,
                    preferred_element_type=jnp.float32)
            acc[...] += out3.sum(axis=0).reshape(channels, r_hi * _LANE)
            return carry

        jax.lax.fori_loop(0, n, body, 0)

    out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("num_rows", "level_len",
                                             "strides", "tile_rows",
                                             "block_k", "interpret",
                                             "two_pass"))
def scatter_add_dense_cm(gvals, fracs, base_idx, num_rows: int, *,
                         level_len: int, strides: Tuple[int, ...],
                         tile_rows: int = 4096, block_k: int = 512,
                         interpret: bool = False, two_pass: bool = True):
    """Sample-granularity scatter-add for dense (non-hashed) grid levels.

    Computes, for every sample s of every dense level l and every corner
    c in 0..7:  out[:, base[s] + off_l(c)] += w_c(frac_s) * gvals[:, s],
    where off_l(c) = bit0(c) + bit1(c)*stride_l + bit2(c)*stride_l^2 (the
    linear-index corner pattern of gridencoder.cu:64-69) and w_c is the
    trilinear weight from the sample's fractional coords.  Equivalent to the
    8-corner expansion fed to ``scatter_add_cm``, but the sort carries one
    7-array stream of SAMPLES (key + C f32 grads + 2 packed-bf16 frac words)
    instead of a (1+C)-array stream of 8x the elements.

    fracs round to bf16 (~0.4% of a cell — below the hex multisample
    jitter); grads stay f32 and the contraction uses the same two-bf16
    split as scatter_add_cm (rel err ~1e-5), so precision matches the
    production kernel up to the frac rounding.

    Args:
      gvals: [C, M] f32 upstream feature grads, M = n_levels * level_len,
        level-major (level l occupies columns [l*level_len, (l+1)*level_len)).
      fracs: [4, M] f32 fractional coords (fx, fy, fz, ignored); the 4th row
        exists so bf16 pairs pack evenly.
      base_idx: [M] int32 GLOBAL corner-0 rows (level offsets baked in).
      num_rows: total dense-span rows (sum of the dense levels' tables).
      level_len: samples per level (static; equal across levels).
      strides: per-level corner stride (cuda_resolution + 1), one per level.

    Returns:
      [C, num_rows] f32, bitwise deterministic.
    """
    c, m = gvals.shape
    n_levels = len(strides)
    assert m == n_levels * level_len, (m, n_levels, level_len)
    assert tile_rows % _LANE == 0
    if level_len == 0:
        return jnp.zeros((c, num_rows), jnp.float32)
    rows_pad = _round_up(num_rows, tile_rows)
    num_tiles = rows_pad // tile_rows
    spans = [s * s + s + 1 for s in strides]
    fr_packed = pack_bf16_pairs(fracs)                    # [2, M]

    # 1) Per-level sorts (loop of flat lax.sorts, stacked).  A single
    # batched sort over the [L, level_len] view lowers pathologically on
    # v5e (the same effect measured 12015 -> 7657 rays/s when tried in
    # scatter_add_cm); the flat-sort loop is the fast form.
    parts = []
    for l in range(n_levels):
        sl = slice(l * level_len, (l + 1) * level_len)
        parts.append(jax.lax.sort(
            (base_idx[sl],) + tuple(gvals[ch, sl] for ch in range(c))
            + tuple(fr_packed[:, sl]), dimension=0, num_keys=1))
    sorted_ops = tuple(
        jnp.stack([p[k] for p in parts], axis=0)
        for k in range(1 + c + 2))

    # 2) Pad each level to whole blocks.  Padding must keep the concatenated
    # stream globally sorted, so the sentinel is a REAL row (the level's last
    # row) with zero grads — it scatters exact zeros.  (A beyond-the-table
    # sentinel would sort above the NEXT level's keys.)
    lvl_pad = _round_up(level_len, block_k)
    pad = lvl_pad - level_len
    sidx2 = sorted_ops[0]
    sg2 = jnp.stack(sorted_ops[1:1 + c], axis=0)          # [C, L, len]
    sf2 = jnp.stack(sorted_ops[1 + c:], axis=0)           # [2, L, len]
    if pad:
        # Last row of each level = next level's global offset - 1; derive it
        # from the static level extents implied by num_rows/strides is not
        # possible here, so use each level's max real key (sorted -> last
        # column), which is necessarily within the level.
        last_key = sidx2[:, -1:]                          # [L, 1]
        sidx2 = jnp.concatenate(
            [sidx2, jnp.broadcast_to(last_key, (n_levels, pad))], axis=1)
        sg2 = jnp.concatenate(
            [sg2, jnp.zeros((c, n_levels, pad), sg2.dtype)], axis=2)
        sf2 = jnp.concatenate(
            [sf2, jnp.zeros((2, n_levels, pad), sf2.dtype)], axis=2)
    sidx = sidx2.reshape(-1)
    sg = sg2.reshape(c, -1)
    sf = sf2.reshape(2, -1)

    # 3) Span-widened per-tile block ranges: an element with base key k
    # touches rows [k, k + span], so tile t's window starts at the first
    # element with key >= t*tile_rows - max(span).  Extra elements are
    # masked by the kernel's one-hot.
    max_span = max(spans)
    ub = (np.arange(num_tiles, dtype=np.int32) + 1) * tile_rows
    lb = np.maximum(np.arange(num_tiles, dtype=np.int32) * tile_rows
                    - max_span, 0)
    starts_lo = jnp.searchsorted(
        sidx, jnp.asarray(lb), side="left").astype(jnp.int32)
    starts_hi = jnp.searchsorted(
        sidx, jnp.asarray(ub), side="left").astype(jnp.int32)
    blk_lo = starts_lo // block_k
    has_any = starts_hi > starts_lo
    blk_hi = jnp.where(has_any, (starts_hi - 1) // block_k + 1, blk_lo)
    nblk = blk_hi - blk_lo

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (c, tile_rows), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, block_k), jnp.int32),
            pltpu.VMEM((2, c, block_k), jnp.float32),
            pltpu.VMEM((2, 2, block_k), jnp.int32),
            pltpu.VMEM((c, tile_rows), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_scatter_kernel_dense, block_k=block_k,
                          tile_rows=tile_rows, channels=c, strides=strides,
                          level_blocks=lvl_pad // block_k, two_pass=two_pass),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, rows_pad), jnp.float32),
        interpret=interpret,
    )(blk_lo, nblk, sidx[None, :], sg, sf)
    return out[:, :num_rows]


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
