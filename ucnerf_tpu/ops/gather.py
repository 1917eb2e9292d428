"""TPU-native forward gather for hash-grid tables: sort + blockwise one-hot
MXU kernel + unsort.

Why: XLA's native gather on a ``[C, rows]`` table reads a full (8, 128)-lane
f32 tile from HBM per index (~4 KiB to fetch 16 useful bytes — measured
6 ns/lookup on v5e = 84% of HBM peak *at that granularity*, a 256x byte
waste; tools/probe_gather.py).  The hash-grid encode is the train step's
dominant cost, so the forward gather is rebuilt the way the backward scatter
already was (ops/scatter.py; the corresponding reference CUDA forward kernel
is ``/root/reference/nerf/gridencoder/src/gridencoder.cu:88-245``):

1. Sort the indices (jax.lax.sort, keys=gidx, payload=original position;
   segmentable per hash level like the backward).
2. A Pallas kernel grids over K-element blocks of the sorted stream (block
   boundaries are K-aligned, so every DMA offset is provably tile-aligned
   and no two grid steps ever write the same output lanes).  Each block
   walks its row range window-by-window with a scalar while loop: DMA the
   ``span_rows``-row table window whose base is the (128-aligned) row of the
   first unconsumed entry, contract the window tile reshaped to
   ``[C*span/128, 128]`` with the one-hot ``W[lo, k] = (lo == lo_k)`` on the
   MXU, select the sublane group with a VPU mask, accumulate, and advance
   the scalar cursor by the number of entries consumed (sorted order makes
   the in-window entries contiguous).  Dense streams touch one window per
   block; sparse streams skip empty windows entirely because the next base
   comes from the next unconsumed entry's row.
3. Un-sort by sorting (position, features) back.

Total HBM traffic: ~one table-window per block + the index/feature streams —
independent of the 4 KiB-per-index granularity of native gathers.

Values move through the MXU as an exact two-bf16 split (hi + residual) with
f32 accumulation, like the scatter kernel; pass ``two_pass=False`` (the
Config.grid_bf16_gather semantics) to halve the MXU work.
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


def _gather_kernel(idx_ref, table_ref, out_ref,
                   idx_smem, tile, cnt_smem, idx_sem, tile_sem,
                   *, block_k: int, span_rows: int, channels: int,
                   num_rows: int, rows_pad: int, two_pass: bool):
    """One K-aligned sorted block: walk its row range window by window."""
    r_hi = span_rows // _LANE

    # The block's indices, also as SMEM scalars for the cursor walk.
    cp = pltpu.make_async_copy(idx_ref, idx_smem, idx_sem)
    cp.start()
    cp.wait()

    rows_vec = idx_ref[0]                                   # [K] int32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)[0]

    out_acc = jnp.zeros((channels, block_k), jnp.float32)

    def cond(carry):
        j, _ = carry
        # Clamped read: both operands of the logical_and evaluate, so the
        # SMEM access must stay in bounds even at j == block_k.
        jc = jnp.minimum(j, block_k - 1)
        return jnp.logical_and(j < block_k,
                               idx_smem[0, jc] < num_rows)

    def body(carry):
        j, acc = carry
        base = (idx_smem[0, j] >> 7) << 7
        base = jnp.minimum(base, rows_pad - span_rows)
        base = pl.multiple_of(base, _LANE)

        tcp = pltpu.make_async_copy(
            table_ref.at[:, pl.ds(base, span_rows)], tile, tile_sem)
        tcp.start()
        tcp.wait()

        local = rows_vec - base                             # [K]
        inwin = jnp.logical_and(
            jnp.logical_and(local >= 0, local < span_rows), lane >= j)
        hi = jax.lax.shift_right_arithmetic(local, 7)       # [K]
        lo = jax.lax.bitwise_and(local, _LANE - 1)
        lo_iota = jax.lax.broadcasted_iota(
            jnp.int32, (_LANE, block_k), 0)
        w2 = jnp.logical_and(lo_iota == lo[None], inwin[None]).astype(
            jnp.bfloat16)                                   # [128, K]

        a = tile[...].reshape(channels * r_hi, _LANE)
        dims = (((1,), (0,)), ((), ()))
        a_hi = a.astype(jnp.bfloat16)
        b2 = jax.lax.dot_general(
            a_hi, w2, dims, preferred_element_type=jnp.float32)
        if two_pass:
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b2 += jax.lax.dot_general(
                a_lo, w2, dims, preferred_element_type=jnp.float32)
        b3 = b2.reshape(channels, r_hi, block_k)

        hi_iota = jax.lax.broadcasted_iota(
            jnp.int32, (r_hi, block_k), 0)
        picked = jnp.sum(
            jnp.where((hi_iota == hi[None])[None], b3, 0.0), axis=1)
        acc = acc + picked

        # Consumed entries are contiguous from j (sorted stream); the entry
        # at j is always in-window (base <= row_j < base + 128), so the
        # cursor strictly advances.
        cnt_smem[0, 0] = jnp.sum(inwin.astype(jnp.int32))
        return j + cnt_smem[0, 0], acc

    _, out_acc = jax.lax.while_loop(cond, body, (jnp.int32(0), out_acc))
    out_ref[...] = out_acc


@functools.partial(jax.jit, static_argnames=("num_rows", "span_rows",
                                             "block_k", "interpret",
                                             "two_pass"))
def gather_sorted_cm(table, sidx, num_rows: int, *, span_rows: int = 2048,
                     block_k: int = 2048, interpret: bool = False,
                     two_pass: bool = True):
    """Gather table columns at SORTED indices: [C, rows], [M] -> [C, M].

    sidx must be non-decreasing, int32, in [0, num_rows]; entries >=
    num_rows act as sentinels and yield zeros.
    """
    c, rows = table.shape
    assert rows == num_rows
    (m,) = sidx.shape
    assert span_rows % _LANE == 0 and block_k % _LANE == 0
    rows_pad = max(_round_up(num_rows, _LANE), span_rows)
    m_pad = _round_up(max(m, 1), block_k)
    num_blocks = m_pad // block_k

    sidx_p = sidx
    if m_pad != m:
        sidx_p = jnp.concatenate(
            [sidx, jnp.full((m_pad - m,), rows_pad, jnp.int32)])

    table_pad = table
    if rows_pad != rows:
        table_pad = jnp.pad(table, ((0, 0), (0, rows_pad - rows)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, block_k), lambda b: (0, b),
                         memory_space=pltpu.VMEM),   # sorted idx block
            pl.BlockSpec(memory_space=pl.ANY),       # table (HBM)
        ],
        out_specs=pl.BlockSpec((c, block_k), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1, block_k), jnp.int32),
            pltpu.VMEM((c, span_rows), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, block_k=block_k,
                          span_rows=span_rows, channels=c,
                          num_rows=num_rows, rows_pad=rows_pad,
                          two_pass=two_pass),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, m_pad), jnp.float32),
        interpret=interpret,
    )(sidx_p[None, :], table_pad)
    return out[:, :m]


def take_cm(table, gidx, *, span_rows: int = 2048, block_k: int = 2048,
            interpret: bool = False, two_pass: bool = True,
            sort_segments: int = 1):
    """Drop-in for ``jnp.take(table, gidx, axis=1)`` on a [C, rows] table:
    sort indices, blockwise MXU gather, sort back.  Returns
    [C, *gidx.shape].

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
    """Window size heuristic: cover a typical block's row range in one DMA
    at the stream's mean density, clamped to [512, 4096] lanes-aligned."""
    density = max(m / max(num_rows, 1), 1e-6)
    span = int(np.clip(1.25 * block_k / density, 512, 4096))
    return _round_up(span, _LANE)
