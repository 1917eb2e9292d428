"""TPU-native forward gather for hash-grid tables: sort + windowed one-hot
MXU kernel + unsort.

Why: XLA's native gather on a ``[C, rows]`` table reads a full (8, 128)-lane
f32 tile from HBM per index (~4 KiB to fetch 16 useful bytes — measured
6 ns/lookup on v5e = 84% of HBM peak *at that granularity*, a 256x byte
waste; tools/probe_gather.py).  The hash-grid encode is the train step's
dominant cost, so the forward gather is rebuilt the way the backward scatter
already was (ops/scatter.py, the reference CUDA kernel's TPU replacement —
``/root/reference/nerf/gridencoder/src/gridencoder.cu:88-245`` is the
corresponding forward kernel):

1. Sort the indices (jax.lax.sort, keys=gidx, payload=original position).
2. A Pallas kernel grids over table WINDOWS of ``span_rows`` rows (streamed
   HBM->VMEM once per call by the BlockSpec pipeline).  Each window owns the
   contiguous slice of the sorted stream whose rows fall inside it and
   processes it in K-element blocks: the local row index splits as
   ``local = hi * 128 + lo``; the window tile reshaped to ``[C*r_hi, 128]``
   contracts with the one-hot ``W[lo, k] = (lo == lo_k)`` on the MXU, and a
   VPU mask over ``hi`` selects the right sublane group.  Total HBM traffic:
   one pass over the table + the index/feature streams — independent of the
   lookup count's 4 KiB-per-index granularity.
3. Un-sort by sorting (position, features) back.

Block/window bookkeeping mirrors ops/scatter.py.  A block at a window
boundary overruns into entries owned by LATER windows; those lanes compute
zero here (their ``hi`` falls outside the window) and are rewritten with the
true values by the owning window — grid steps execute in order on the core
and every window waits for its output DMAs, so the later write lands last.

Values move through the MXU as an exact two-bf16 split (hi + residual) with
f32 accumulation, like the scatter kernel; pass ``gather_dtype=bfloat16`` to
halve that to a single pass (table rounded to bf16, the documented
Config.grid_bf16_gather semantics).
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


def _gather_kernel(blk_start_ref, nblk_ref, sidx_ref, tile_ref, out_ref,
                   idx_buf, out_buf, idx_sem, out_sem,
                   *, block_k: int, span_rows: int, channels: int,
                   two_pass: bool):
    """One table window: stream sorted-index blocks, one-hot MXU gather."""
    w = pl.program_id(0)
    r_hi = span_rows // _LANE
    start = blk_start_ref[w]
    n = nblk_ref[w]
    row0 = w * span_rows

    def idx_dma(slot, b):
        return pltpu.make_async_copy(
            sidx_ref.at[:, pl.ds(start + b * block_k, block_k)],
            idx_buf.at[slot], idx_sem.at[slot])

    def out_dma(slot, b):
        return pltpu.make_async_copy(
            out_buf.at[slot],
            out_ref.at[:, pl.ds(start + b * block_k, block_k)],
            out_sem.at[slot])

    @pl.when(n > 0)
    def _():
        idx_dma(0, 0).start()

        def body(b, carry):
            slot = jax.lax.rem(b, 2)

            @pl.when(b + 1 < n)
            def _():
                idx_dma(jax.lax.rem(b + 1, 2), b + 1).start()

            idx_dma(slot, b).wait()

            local = idx_buf[slot] - row0                      # [1, K]
            hi = jax.lax.shift_right_arithmetic(local, 7)
            lo = jax.lax.bitwise_and(local, _LANE - 1)
            lo_iota = jax.lax.broadcasted_iota(
                jnp.int32, (_LANE, block_k), 0)
            w2 = (lo_iota == lo).astype(jnp.bfloat16)         # [128, K]

            a = tile_ref[...].reshape(channels * r_hi, _LANE)
            dims = (((1,), (0,)), ((), ()))
            a_hi = a.astype(jnp.bfloat16)
            b2 = jax.lax.dot_general(
                a_hi, w2, dims, preferred_element_type=jnp.float32)
            if two_pass:
                a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                b2 += jax.lax.dot_general(
                    a_lo, w2, dims, preferred_element_type=jnp.float32)
            b3 = b2.reshape(channels, r_hi, block_k)

            # Select the sublane group; out-of-window entries (block overrun
            # + sentinel padding) have hi outside [0, r_hi) -> zero, later
            # overwritten by their owning window.
            hi_iota = jax.lax.broadcasted_iota(
                jnp.int32, (r_hi, block_k), 0)
            picked = jnp.sum(
                jnp.where((hi_iota == hi)[None], b3, 0.0), axis=1)

            # Wait for the previous use of this output slot, then emit.
            @pl.when(b >= 2)
            def _():
                out_dma(slot, b - 2).wait()
            out_buf[slot] = picked
            out_dma(slot, b).start()
            return carry

        jax.lax.fori_loop(0, n, body, 0)

        # Drain outstanding output DMAs before the next window may rewrite
        # overrun regions (grid steps execute in order).
        @pl.when(n >= 2)
        def _():
            out_dma(jax.lax.rem(n, 2), n - 2).wait()
        out_dma(jax.lax.rem(n - 1, 2), n - 1).wait()


@functools.partial(jax.jit, static_argnames=("num_rows", "span_rows",
                                             "block_k", "interpret",
                                             "two_pass"))
def gather_sorted_cm(table, sidx, num_rows: int, *, span_rows: int = 512,
                     block_k: int = 2048, interpret: bool = False,
                     two_pass: bool = True):
    """Gather table columns at SORTED indices: [C, rows], [M] -> [C, M].

    sidx must be non-decreasing, int32, in [0, num_rows]; entries equal to
    the padded row bound act as sentinels and yield zeros.
    """
    c, rows = table.shape
    assert rows == num_rows
    (m,) = sidx.shape
    assert span_rows % _LANE == 0 and block_k % _LANE == 0
    rows_pad = _round_up(num_rows, span_rows)
    num_windows = rows_pad // span_rows

    m_pad = _round_up(max(m, 1), block_k) + block_k
    sidx_p = jnp.concatenate(
        [sidx, jnp.full((m_pad - m,), rows_pad, jnp.int32)])

    # Window ownership: starts[w] = first sorted position with row >= w*span.
    bounds = jnp.arange(num_windows + 1, dtype=jnp.int32) * span_rows
    starts = jnp.searchsorted(sidx_p[:m], bounds, side="left").astype(
        jnp.int32)
    counts = starts[1:] - starts[:-1]
    nblk = (counts + block_k - 1) // block_k

    table_pad = table
    if rows_pad != rows:
        table_pad = jnp.pad(table, ((0, 0), (0, rows_pad - rows)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_windows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # sidx (HBM)
            pl.BlockSpec((c, span_rows), lambda w, *_: (0, w),
                         memory_space=pltpu.VMEM),   # table window
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # out (HBM)
        scratch_shapes=[
            pltpu.VMEM((2, 1, block_k), jnp.int32),
            pltpu.VMEM((2, c, block_k), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, block_k=block_k,
                          span_rows=span_rows, channels=c,
                          two_pass=two_pass),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, m_pad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts[:-1], nblk, sidx_p[None, :], table_pad)
    return out[:, :m]


def take_cm(table, gidx, *, span_rows: int = 512, block_k: int = 2048,
            interpret: bool = False, two_pass: bool = True,
            sort_segments: int = 1):
    """Drop-in for ``jnp.take(table, gidx, axis=1)`` on a [C, rows] table:
    sort indices, windowed MXU gather, sort back.  Returns [C, *gidx.shape].

    sort_segments: split the flat stream into this many equal contiguous
    segments and sort each independently (same contract as
    scatter_add_cm: only valid when every index in segment s is < every
    index in segment s+1, e.g. per-level slices of a packed table).  The
    unsort is segmentable the same way — sorted segment s holds exactly the
    elements of input segment s.
    """
    c, rows = table.shape
    shape = gidx.shape
    flat = gidx.reshape(-1).astype(jnp.int32)
    m = flat.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]

    segs = sort_segments if (sort_segments > 1 and m % sort_segments == 0
                             and m > 0) else 1
    seg = m // max(segs, 1)

    def seg_sort(arrs, s):
        sl = slice(s * seg, (s + 1) * seg)
        return jax.lax.sort(tuple(a[sl] for a in arrs), dimension=0,
                            num_keys=1)

    if segs > 1:
        parts = [seg_sort((flat, pos), s) for s in range(segs)]
        sidx = jnp.concatenate([p[0] for p in parts])
        perm = jnp.concatenate([p[1] for p in parts])
    else:
        sidx, perm = jax.lax.sort((flat, pos), dimension=0, num_keys=1)

    feats = gather_sorted_cm(table, sidx, rows, span_rows=span_rows,
                             block_k=block_k, interpret=interpret,
                             two_pass=two_pass)

    if segs > 1:
        outs = [seg_sort((perm,) + tuple(feats), s) for s in range(segs)]
        stacked = jnp.concatenate(
            [jnp.stack(o[1:], axis=0) for o in outs], axis=1)
    else:
        unsorted = jax.lax.sort((perm,) + tuple(feats), dimension=0,
                                num_keys=1)
        stacked = jnp.stack(unsorted[1:], axis=0)
    return stacked.reshape((c,) + shape)


def auto_span(num_rows: int, m: int, block_k: int = 2048) -> int:
    """Window size heuristic: aim for ~2 blocks per window at the stream's
    mean density, clamped to [256, 4096] lanes-aligned.  Small windows cap
    the per-lookup MXU cost (C * span/128 * 128 MACs); large windows
    amortize per-window overhead when the stream is sparse."""
    density = max(m / max(num_rows, 1), 1e-6)
    span = int(np.clip(2 * block_k / density, 256, 4096))
    return _round_up(span, _LANE)
