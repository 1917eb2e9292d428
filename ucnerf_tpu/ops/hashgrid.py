"""Multiresolution hash-grid encoder (instant-NGP style) for TPU.

TPU-native re-design of the reference CUDA grid encoder
(``/root/reference/nerf/gridencoder/src/gridencoder.cu`` and
``gridencoder/grid.py``):

- Table layout, level offsets, per-level resolutions, and the prime-XOR hash
  are replicated bit-exactly (grid.py:122-144, gridencoder.cu:51-84) so parity
  with the reference is directly checkable.
- The forward pass is a per-level 8-corner gather + trilinear blend; on TPU
  this is expressed as XLA ``gather`` over the HBM-resident table, with the
  corner loop statically unrolled so the accumulator stays at [N, C].
- The backward pass comes from JAX autodiff: the gather transposes to a
  scatter-add, replacing the CUDA ``atomicAdd`` (gridencoder.cu:323-338) with
  a deterministic XLA scatter — a determinism upgrade over the reference,
  whose atomics sum in nondeterministic order.

All level geometry is static (baked into the spec at trace time), so there is
no data-dependent control flow anywhere.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ucnerf_tpu.ops import scatter

# Prime constants of the spatial hash (gridencoder.cu:54).
_PRIMES = (1, 2654435761, 805459861)

# Backward scatter implementation: 'auto' picks the Pallas sort+tile kernel
# on TPU and XLA scatter elsewhere; tests may force 'pallas_interpret'.
SCATTER_IMPL = "auto"

# Forward gather implementation.  'auto' currently means the native XLA
# gather everywhere: the Pallas blockwise one-hot MXU gather (ops/gather.py)
# runs the gather PROPER 8.8x faster (0.68 vs 6.0 ns/lookup, v5e), but it
# requires block-sorted index streams, and the measured sort + unsort cost
# exceeds what the kernel saves at the model's stream densities — the
# native gather already sits at 84% of HBM peak for its (8,128)-tile access
# granularity (PERF_NOTES.md round 3; tools/probe_gather.py).  'pallas'
# forces the kernel (experiments); tests force 'pallas_interpret'.
GATHER_IMPL = "auto"


def _use_pallas_scatter() -> bool:
    if SCATTER_IMPL == "auto":
        return jax.default_backend() == "tpu"
    return SCATTER_IMPL.startswith("pallas")


def _use_pallas_gather(m: int) -> bool:
    del m
    return GATHER_IMPL.startswith("pallas")


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gather_rows(num_rows: int, sort_segments: int, gather_dtype, table,
                 gidx):
    """Gather table columns: [C, rows], [...] int32 -> [C, ...].

    Forward is XLA's native gather.  The custom VJP replaces the transpose —
    XLA's serial scatter-add, ~85 ns/update on v5e — with the sort-based
    Pallas kernel in ``ops/scatter.py`` (the reference's CUDA ``atomicAdd``
    backward, gridencoder.cu:249-340, rebuilt TPU-native).

    sort_segments: number of equal leading-axis segments of gidx whose index
    ranges are increasing (per-level slices of the packed table); the
    backward sorts each independently.

    gather_dtype: optional dtype (e.g. bfloat16) the table is cast to BEFORE
    the gather.  TPU's gather reads a full (sublane, 128)-lane tile per
    index, so halving the element size halves the dominant HBM traffic.
    The cast lives inside this custom-vjp boundary: features are rounded,
    but table gradients are still scattered in exact f32.
    """
    m = int(np.prod(gidx.shape))
    if _use_pallas_gather(m):
        # Do NOT pre-cast the table here: the kernel's VMEM scratch is f32,
        # and its single-pass (two_pass=False) mode already implements the
        # bf16 rounding semantics via the hi-bf16 split.  Cast the OUTPUT
        # instead so the feature dtype matches the XLA path.
        from ucnerf_tpu.ops import gather as gatherlib
        out = gatherlib.take_cm(
            table, gidx,
            span_rows=gatherlib.auto_span(num_rows, m),
            two_pass=gather_dtype is None,
            sort_segments=sort_segments if m % max(sort_segments, 1) == 0
            else 1,
            interpret=GATHER_IMPL == "pallas_interpret")
        return out if gather_dtype is None else out.astype(gather_dtype)
    if gather_dtype is not None:
        table = table.astype(gather_dtype)
    return jnp.take(table, gidx, axis=1)


def _gather_rows_fwd(num_rows, sort_segments, gather_dtype, table, gidx):
    return _gather_rows(num_rows, sort_segments, gather_dtype, table,
                        gidx), gidx


def _gather_rows_bwd(num_rows, sort_segments, gather_dtype, gidx, g):
    c = g.shape[0]
    flat_g = g.reshape(c, -1).astype(jnp.float32)
    flat_idx = gidx.reshape(-1)
    if _use_pallas_scatter():
        interp = SCATTER_IMPL == "pallas_interpret"
        dtable = scatter.scatter_add_cm(flat_g, flat_idx, num_rows,
                                        interpret=interp,
                                        sort_segments=sort_segments)
    else:
        dtable = scatter.scatter_add_xla(flat_g, flat_idx, num_rows)
    return dtable, np.zeros(gidx.shape, jax.dtypes.float0)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_rows_ml(level_offsets, gather_dtype, table, gidx_lvl):
    """Per-level sliced gathers: [C, rows], [L, seg] int32 -> L x [C, seg].

    The v5e gather's per-lookup cost is set by the OPERAND's row extent, not
    by the addresses touched: 11.7 ns/lookup over a 14.7M-row packed table
    vs 5.5 ns for the IDENTICAL lookups issued as takes over the per-level
    slices (tools/probe_gather_operand_size.py, PERF_NOTES round 4).  This
    multi-output variant issues one take per level over that level's slice
    and returns the parts UNCONCATENATED — concatenating them tempted XLA
    into materializing a copy with the size-4 channel dim minormost (32x
    lane padding: a 47 GB allocation at render chunk 15000).  Callers
    consume each part level-by-level (weighted corner sums), so the full
    [C, L*seg] array never needs to exist.

    Backward: one batched sort + Pallas scatter over the packed table (the
    same machinery as _gather_rows; per-level sort segments).

    level_offsets: tuple of L+1 static row offsets; row l of gidx_lvl holds
    GLOBAL indices within [level_offsets[l], level_offsets[l+1]).
    """
    num_levels = len(level_offsets) - 1
    m = int(np.prod(gidx_lvl.shape))
    if _use_pallas_gather(m):
        from ucnerf_tpu.ops import gather as gatherlib
        out = gatherlib.take_cm(
            table, gidx_lvl.reshape(-1),
            span_rows=gatherlib.auto_span(int(level_offsets[-1]), m),
            two_pass=gather_dtype is None,
            sort_segments=num_levels,
            interpret=GATHER_IMPL == "pallas_interpret")
        if gather_dtype is not None:
            out = out.astype(gather_dtype)
        seg = gidx_lvl.shape[1]
        return tuple(out[:, l * seg:(l + 1) * seg]
                     for l in range(num_levels))
    if gather_dtype is not None:
        table = table.astype(gather_dtype)
    outs = []
    for l in range(num_levels):
        lo, hi = int(level_offsets[l]), int(level_offsets[l + 1])
        sl = jax.lax.slice_in_dim(table, lo, hi, axis=1)
        outs.append(jnp.take(sl, gidx_lvl[l] - jnp.int32(lo), axis=1))
    return tuple(outs)


def _gather_rows_ml_fwd(level_offsets, gather_dtype, table, gidx_lvl):
    return _gather_rows_ml(level_offsets, gather_dtype, table,
                           gidx_lvl), gidx_lvl


def _gather_rows_ml_bwd(level_offsets, gather_dtype, gidx_lvl, gs):
    num_levels = len(level_offsets) - 1
    num_rows = int(level_offsets[-1])
    c = gs[0].shape[0]
    flat_g = jnp.concatenate(
        [g.astype(jnp.float32) for g in gs], axis=1).reshape(c, -1)
    flat_idx = gidx_lvl.reshape(-1)
    if _use_pallas_scatter():
        interp = SCATTER_IMPL == "pallas_interpret"
        dtable = scatter.scatter_add_cm(flat_g, flat_idx, num_rows,
                                        interpret=interp,
                                        sort_segments=num_levels)
    else:
        dtable = scatter.scatter_add_xla(flat_g, flat_idx, num_rows)
    return dtable, np.zeros(gidx_lvl.shape, jax.dtypes.float0)


_gather_rows_ml.defvjp(_gather_rows_ml_fwd, _gather_rows_ml_bwd)


def _sliced_rows(level_offsets, gather_dtype, table, gidx_lvl):
    """Per-level sliced takes: [C, rows], [L, 8, S] -> L x [C, 8, S]."""
    num_levels = len(level_offsets) - 1
    if gather_dtype is not None:
        table = table.astype(gather_dtype)
    rows = []
    for l in range(num_levels):
        lo, hi = int(level_offsets[l]), int(level_offsets[l + 1])
        sl = jax.lax.slice_in_dim(table, lo, hi, axis=1)
        rows.append(jnp.take(sl, gidx_lvl[l] - jnp.int32(lo), axis=1))
    return rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _gather_wsum_ml(level_offsets, dense_strides, value_dtype, gather_dtype,
                    table, gidx_lvl, w_lvl, frac_lvl):
    """Fused per-level gather + trilinear corner sum with a restructured
    backward (the round-5 sort-reduction boundary).

    Forward == ``_gather_rows_ml`` followed by the per-level weighted corner
    sum: part_l = sum_c take(slice_l, gidx[l, c]) * w[l, c].  Moving the
    corner sum inside the custom-vjp boundary exposes the w (x) g
    factorization to the backward, which shrinks the backward's dominant
    cost — the 5-array bitonic sorts feeding the Pallas scatter
    (PERF_NOTES round 4: ~26% of the flagship step) — two ways:

    * Levels in the DENSE PREFIX (corner index == linear cell index, no
      hash/modulo — ``HashGridSpec.dense_prefix``) sort one stream element
      per SAMPLE (key = corner-0 row, payload = [C] f32 feature grad +
      bf16-packed fracs) instead of 8 corner-updates; the scatter kernel
      re-expands the corners at static stride offsets
      (``scatter.scatter_add_dense_cm``).  1/8 the sorted elements.
    * Remaining (hashed) levels optionally pack the 4 premultiplied f32
      update channels into 2 bf16-pair int32 payloads
      (``scatter.scatter_add_packed_cm``): a 3-array sort instead of
      5-array.  Enabled via value_dtype='bfloat16'; precision is one bf16
      rounding per update (the reference's own half-precision backward
      rounds harder: fp16 atomics, gridencoder.cu:325-338).

    Args:
      level_offsets: L+1 static row offsets of the packed table.
      dense_strides: static per-level corner strides for the dense prefix
        (empty tuple disables the sample-granularity path).
      value_dtype: None (f32 sorts for hashed levels) or 'bfloat16'.
      table: [C, rows].  gidx_lvl: [L, 8, S] int32 global rows.
      w_lvl: [L, 8, S] trilinear corner weights.
      frac_lvl: [nd, 4, S] fractional coords (fx, fy, fz, 0) for the dense
        prefix — a stop-gradient re-encoding of w for the backward payload;
        its own cotangent is zero (w_lvl carries the real weight gradient).

    Returns:
      Tuple of L [C, S] weighted corner sums.
    """
    rows = _sliced_rows(level_offsets, gather_dtype, table, gidx_lvl)
    return tuple((rows[l] * w_lvl[l][None]).sum(axis=1)
                 for l in range(len(rows)))


def _gather_wsum_ml_fwd(level_offsets, dense_strides, value_dtype,
                        gather_dtype, table, gidx_lvl, w_lvl, frac_lvl):
    rows = [checkpoint_name(r, "hashgrid_gather")
            for r in _sliced_rows(level_offsets, gather_dtype, table,
                                  gidx_lvl)]
    outs = tuple((rows[l] * w_lvl[l][None]).sum(axis=1)
                 for l in range(len(rows)))
    return outs, (gidx_lvl, w_lvl, frac_lvl, tuple(rows))


def _gather_wsum_ml_bwd(level_offsets, dense_strides, value_dtype,
                        gather_dtype, res, gs):
    gidx_lvl, w_lvl, frac_lvl, rows = res
    num_levels = len(level_offsets) - 1
    nd = len(dense_strides)
    c = gs[0].shape[0]
    s = gidx_lvl.shape[2]

    # Weight cotangent from the saved gather outputs (what autodiff computed
    # when the corner sum lived outside the boundary).
    d_w = jnp.stack([
        jnp.einsum("chs,cs->hs", rows[l].astype(jnp.float32),
                   gs[l].astype(jnp.float32)) for l in range(num_levels)])

    if not _use_pallas_scatter():
        # XLA fallback (CPU, non-interpret): exact corner-expanded scatter.
        vals = jnp.concatenate(
            [(w_lvl[l][None] * gs[l][:, None].astype(jnp.float32))
             .reshape(c, -1) for l in range(num_levels)], axis=1)
        dtable = scatter.scatter_add_xla(
            vals, gidx_lvl.reshape(-1), int(level_offsets[-1]))
        return (dtable, np.zeros(gidx_lvl.shape, jax.dtypes.float0), d_w,
                jnp.zeros_like(frac_lvl))

    interp = SCATTER_IMPL == "pallas_interpret"
    dense_rows = int(level_offsets[nd])
    total_rows = int(level_offsets[-1])
    if nd and nd < num_levels and value_dtype != "bfloat16":
        # Fused-buffer assembly (PERF_NOTES round 5): the hashed-level
        # scatter writes its tiles of the FULL-table buffer directly (rows
        # below its first tile come back garbage), and the small dense
        # prefix — ~2% of the rows — is patched over [0, dense_rows) with
        # an in-place static update-slice.  The straddle tile's hashed
        # columns (>= dense_rows) are written by the hashed kernel and
        # survive the patch, so the split needs no tile alignment.  This
        # removes the [C, total] grad concat epilogue (fusion.1647/.1672,
        # ~47 ms/step at flagship scale).
        vals = jnp.concatenate(
            [(w_lvl[l][None] * gs[l][:, None].astype(jnp.float32))
             .reshape(c, -1) for l in range(nd, num_levels)], axis=1)
        tile_rows = 4096
        buf = scatter.scatter_add_cm(
            vals, gidx_lvl[nd:].reshape(-1), total_rows,
            tile_rows=tile_rows, tile_offset=dense_rows // tile_rows,
            sort_segments=num_levels - nd, interpret=interp)
        g_d = jnp.concatenate(
            [gs[l].astype(jnp.float32) for l in range(nd)], axis=1)
        fr = jnp.concatenate([frac_lvl[l] for l in range(nd)], axis=1)
        base = gidx_lvl[:nd, 0].reshape(-1)
        dense_part = scatter.scatter_add_dense_cm(
            g_d, fr, base, dense_rows, level_len=s, strides=dense_strides,
            interpret=interp)
        dtable = jax.lax.dynamic_update_slice(buf, dense_part, (0, 0))
        return (dtable, np.zeros(gidx_lvl.shape, jax.dtypes.float0), d_w,
                jnp.zeros_like(frac_lvl))
    parts = []
    if nd:
        g_d = jnp.concatenate(
            [gs[l].astype(jnp.float32) for l in range(nd)], axis=1)
        fr = jnp.concatenate([frac_lvl[l] for l in range(nd)], axis=1)
        base = gidx_lvl[:nd, 0].reshape(-1)
        parts.append(scatter.scatter_add_dense_cm(
            g_d, fr, base, dense_rows, level_len=s, strides=dense_strides,
            interpret=interp))
    if nd < num_levels:
        vals = jnp.concatenate(
            [(w_lvl[l][None] * gs[l][:, None].astype(jnp.float32))
             .reshape(c, -1) for l in range(nd, num_levels)], axis=1)
        idx = gidx_lvl[nd:].reshape(-1) - jnp.int32(dense_rows)
        hashed_rows = total_rows - dense_rows
        if value_dtype == "bfloat16":
            parts.append(scatter.scatter_add_packed_cm(
                vals, idx, hashed_rows, sort_segments=num_levels - nd,
                interpret=interp))
        else:
            parts.append(scatter.scatter_add_cm(
                vals, idx, hashed_rows, sort_segments=num_levels - nd,
                interpret=interp))
    dtable = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    return (dtable, np.zeros(gidx_lvl.shape, jax.dtypes.float0), d_w,
            jnp.zeros_like(frac_lvl))


_gather_wsum_ml.defvjp(_gather_wsum_ml_fwd, _gather_wsum_ml_bwd)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of a multiresolution hash grid.

    Mirrors GridEncoder's constructor arguments (grid.py:97-149) with
    align_corners=False, gridtype='hash', linear interpolation.
    """
    input_dim: int = 3
    num_levels: int = 10
    level_dim: int = 4
    base_resolution: int = 16
    desired_resolution: int = 8192
    log2_hashmap_size: int = 21
    init_std: float = 1e-4

    @functools.cached_property
    def per_level_scale(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(np.exp2(
            np.log2(self.desired_resolution / self.base_resolution)
            / (self.num_levels - 1)))

    @functools.cached_property
    def resolutions(self) -> Tuple[int, ...]:
        """Per-level table resolutions (grid.py:128-129, align_corners=False):
        ceil(base * scale^l) + 1.  Exposed as `grid_sizes` for the erf
        multisample weighting (models.py:495)."""
        return tuple(
            int(np.ceil(self.base_resolution * self.per_level_scale**i)) + 1
            for i in range(self.num_levels))

    @functools.cached_property
    def level_sizes(self) -> Tuple[int, ...]:
        """Rows allocated per level: min(2^log2_hashmap_size, res^D), rounded
        up to a multiple of 8 (grid.py:130-131)."""
        max_params = 2**self.log2_hashmap_size
        sizes = []
        for res in self.resolutions:
            n = min(max_params, res**self.input_dim)
            sizes.append(int(np.ceil(n / 8) * 8))
        return tuple(sizes)

    @functools.cached_property
    def offsets(self) -> Tuple[int, ...]:
        """Row offset of each level in the packed table (len = L + 1)."""
        offs = [0]
        for s in self.level_sizes:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def table_rows(self) -> int:
        return self.offsets[-1]

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @functools.cached_property
    def cuda_scales(self) -> Tuple[float, ...]:
        """Per-level continuous scales as computed by the CUDA kernel:
        exp2(l * log2(per_level_scale)) * H - 1 (gridencoder.cu:138)."""
        s = np.log2(self.per_level_scale)
        return tuple(
            float(np.exp2(i * s) * self.base_resolution - 1.0)
            for i in range(self.num_levels))

    @functools.cached_property
    def cuda_resolutions(self) -> Tuple[int, ...]:
        """Index-stride resolutions as computed by the CUDA kernel:
        ceil(scale) + 1 (gridencoder.cu:139)."""
        return tuple(int(np.ceil(s)) + 1 for s in self.cuda_scales)

    def uses_hash(self, level: int) -> bool:
        """True when the level's dense stride exceeds its table, so corner
        coordinates are hashed (gridencoder.cu:72-81)."""
        stride = (self.cuda_resolutions[level] + 1) ** self.input_dim
        return stride > self.level_sizes[level]

    @functools.cached_property
    def dense_prefix(self) -> int:
        """Number of leading levels whose corner index is the plain linear
        cell index — no hash AND provably no modulo (the no-mod branch of
        ``_corner_index``).  For these levels corner c of a sample sits at a
        static stride offset from corner 0, enabling the sample-granularity
        backward (``scatter.scatter_add_dense_cm``)."""
        if self.input_dim != 3:
            return 0
        n = 0
        for level in range(self.num_levels):
            if self.uses_hash(level):
                break
            r = self.cuda_resolutions[level]
            stride = r + 1
            max_index = r * (1 + stride + stride * stride)
            if max_index >= self.level_sizes[level]:
                break
            n += 1
        return n

    @functools.cached_property
    def dense_strides(self) -> Tuple[int, ...]:
        """Corner strides (cuda_resolution + 1) of the dense prefix."""
        return tuple(self.cuda_resolutions[l] + 1
                     for l in range(self.dense_prefix))


def init_table(key: jax.Array, spec: HashGridSpec,
               dtype=jnp.float32) -> jax.Array:
    """Initialize the packed embedding table, U(-init_std, init_std).

    Stored CHANNEL-PLANAR as [C, rows]: the huge row axis sits on the TPU
    lanes (only the C axis pads 4->8 sublanes, a 2x cost), a single
    axis-1 gather fetches all C channels of a row (5x faster than
    per-channel scalar gathers, measured), and a [rows, C<128] layout —
    which would lane-pad 32x (7+ GB per copy at canonical scale) — never
    exists.
    """
    return jax.random.uniform(
        key, (spec.level_dim, spec.table_rows), dtype=dtype,
        minval=-spec.init_std, maxval=spec.init_std)


def _corner_index(spec: HashGridSpec, level: int, pos_grid):
    """Row index (within the level) of an integer corner coordinate.

    pos_grid: [..., D] uint32.  Static decision between the dense linear
    index and the prime-XOR hash, then modulo the level size — power-of-two
    sizes use a bitwise AND.
    """
    hashmap_size = spec.level_sizes[level]
    if spec.uses_hash(level):
        index = pos_grid[..., 0] * np.uint32(_PRIMES[0])
        for d in range(1, spec.input_dim):
            index = index ^ (pos_grid[..., d] * np.uint32(_PRIMES[d]))
    else:
        stride_base = np.uint32(spec.cuda_resolutions[level] + 1)
        index = pos_grid[..., 0]
        stride = np.uint32(1)
        for d in range(1, spec.input_dim):
            stride = np.uint32(stride * stride_base)
            index = index + pos_grid[..., d] * stride
        # Dense indices provably fit in the allocated level table: the max
        # corner coordinate is cuda_resolution, so no modulo is needed when
        # the worst-case index is in range.
        r = spec.cuda_resolutions[level]
        max_index = sum(r * (spec.cuda_resolutions[level] + 1) ** d
                        for d in range(spec.input_dim))
        if max_index < hashmap_size:
            return index
    if hashmap_size & (hashmap_size - 1) == 0:
        return index & np.uint32(hashmap_size - 1)
    return index % np.uint32(hashmap_size)


def encode_level(x01, table, spec: HashGridSpec, level: int):
    """Encode unit-cube points into one level's features.

    Args:
      x01: [N, D] float32 coordinates; values outside [0, 1] produce zeros
        (gridencoder.cu:111-135).
      table: [rows * C] flat packed embedding table (see init_table).
      level: static level index.

    Returns:
      [N, C] features.
    """
    scale = np.float32(spec.cuda_scales[level])
    oob = jnp.any((x01 < 0) | (x01 > 1), axis=-1)
    xs = jnp.clip(x01, 0.0, 1.0)
    pos = xs * scale + np.float32(0.5)
    pos_floor = jnp.floor(pos)
    frac = pos - jax.lax.stop_gradient(pos_floor)
    pos_grid = pos_floor.astype(jnp.uint32)  # [N, D]

    level_offset = np.uint32(spec.offsets[level])
    acc = jnp.zeros((x01.shape[0], spec.level_dim), dtype=table.dtype)
    for corner in range(2**spec.input_dim):
        w = jnp.ones(x01.shape[:-1], dtype=x01.dtype)
        corner_pos = []
        for d in range(spec.input_dim):
            if corner & (1 << d):
                w = w * frac[..., d]
                corner_pos.append(pos_grid[..., d] + np.uint32(1))
            else:
                w = w * (1 - frac[..., d])
                corner_pos.append(pos_grid[..., d])
        corner_pos = jnp.stack(corner_pos, axis=-1)
        idx = _corner_index(spec, level, corner_pos) + level_offset
        rows = jnp.take(table, idx.astype(jnp.int32), axis=1).T  # [N, C]
        acc = acc + w[..., None] * rows
    return jnp.where(oob[..., None], 0.0, acc)


def encode(x, table, spec: HashGridSpec, bound: float = 1.0):
    """Hash-encode points in [-bound, bound]^D.

    Args:
      x: [..., D] coordinates.
      table: [rows, C] packed table.
      bound: half-extent of the input domain (grid.py:158-162).

    Returns:
      [..., L, C] per-level features (callers flatten to L*C as needed; the
      reference returns [..., L*C] and immediately unflattens,
      models.py:494).
    """
    x01 = (x + bound) / (2 * bound)
    batch_shape = x01.shape[:-1]
    flat = x01.reshape(-1, spec.input_dim)
    outs = [encode_level(flat, table, spec, l) for l in range(spec.num_levels)]
    out = jnp.stack(outs, axis=-2)  # [N, L, C]
    return out.reshape(batch_shape + (spec.num_levels, spec.level_dim))


def _corner_index_components(spec: HashGridSpec, level: int, cx, cy, cz):
    """Row index within a level from separate uint32 coordinate arrays.

    Identical math to _corner_index but on component arrays, so callers can
    keep every tensor in a TPU-friendly layout (no trailing dim of 3)."""
    hashmap_size = spec.level_sizes[level]
    if spec.uses_hash(level):
        index = (cx * np.uint32(_PRIMES[0])
                 ^ cy * np.uint32(_PRIMES[1])
                 ^ cz * np.uint32(_PRIMES[2]))
    else:
        stride = np.uint32(spec.cuda_resolutions[level] + 1)
        index = cx + cy * stride + cz * stride * stride
        r = spec.cuda_resolutions[level]
        max_index = int(r) * (1 + int(stride) + int(stride) ** 2)
        if max_index < hashmap_size:
            return index
    if hashmap_size & (hashmap_size - 1) == 0:
        return index & np.uint32(hashmap_size - 1)
    return index % np.uint32(hashmap_size)


def encode_hex_cm(x01, stds, table, spec: HashGridSpec, grid_sizes=None,
                  accum_dtype=jnp.float32, gather_dtype=None,
                  bwd_dense_sample: bool = False, bwd_value_dtype=None):
    """Channel-major hash encode with erf weighting + hex-mean folded in.

    The hex axis of x01 may have size 1 ("single-query" mode): the grid is
    looked up once per sample at the hex-mean position and modulated by the
    mean erf weight over the 6 multisample stds — a 6x lookup reduction that
    keeps the scale-dependent anti-aliasing term (a TPU-efficiency
    approximation of models.py:494-496; the reference encodes all 6 points).

    The TPU-native hot path: every tensor it touches keeps the large point
    axis minormost (lane dimension), so nothing suffers the 21x lane padding
    that a [..., 6]- or [..., 4]-trailing layout incurs.  Semantically equals
    encode() followed by the erf multisample downweighting and the mean over
    the 6 hex points (models.py:494-496), but never materializes the
    [N, 6, L, C] intermediates.

    Args:
      x01: [3, 6, M] unit-cube coordinates, channel-major, hex axis second
        (M = rays*samples).
      stds: [6, M] per-multisample Gaussian stds in the SAME normalized frame
        as x01 (callers divide by the contraction bound before this).
      table: [C, rows] channel-planar packed table (see init_table).
      grid_sizes: optional [L] float resolutions for the erf weight; defaults
        to spec.resolutions.  Pass None for stds to skip weighting.

    bwd_dense_sample / bwd_value_dtype: round-5 backward-sort reductions,
    see ``_gather_wsum_ml``.  Defaults reproduce the round-4 path exactly.

    Returns:
      feats [L*C, M]: per-level features, hex-averaged, erf-weighted.
      wmeans [L, M]: per-level mean erf weight over hex points (used by the
        scale-featurization path); zeros-shaped if stds is None.
    """
    del accum_dtype
    if grid_sizes is None:
        grid_sizes = np.asarray(spec.resolutions, np.float32)
    c_dim = spec.level_dim
    hex_n = x01.shape[1]
    m = x01.shape[-1]

    oob = ((x01[0] < 0) | (x01[0] > 1) | (x01[1] < 0) | (x01[1] > 1)
           | (x01[2] < 0) | (x01[2] > 1))  # [H, M]
    xs = jnp.clip(x01, 0.0, 1.0)

    # Pass 1: corner indices + trilinear weights for every (level, corner).
    # All L*8 gathers batch into ONE _gather_rows call so the backward runs
    # ONE sort + ONE Pallas scatter over the flat table (level offsets are
    # baked into the indices) instead of L*8 separate scatters.
    nd = spec.dense_prefix if bwd_dense_sample else 0
    gidx_parts = []
    w_parts = []
    frac_parts = []
    erf_levels = []
    for level in range(spec.num_levels):
        scale = np.float32(spec.cuda_scales[level])
        pos = xs * scale + np.float32(0.5)
        pos_floor = jnp.floor(pos)
        frac = pos - jax.lax.stop_gradient(pos_floor)
        pg = pos_floor.astype(jnp.uint32)  # [3, H, M]
        if level < nd:
            # Backward payload for the sample-granularity scatter: (fx, fy,
            # fz, 0) so bf16 pairs pack evenly.  Stop-gradient: w_parts
            # carries the real weight gradient.
            frac_parts.append(jax.lax.stop_gradient(jnp.concatenate(
                [frac.reshape(3, -1),
                 jnp.zeros((1, hex_n * m), frac.dtype)], axis=0)))

        if stds is not None:
            w_erf = jax.lax.erf(
                1.0 / jnp.sqrt(8.0 * stds**2
                               * np.float32(grid_sizes[level]) ** 2))
        else:
            w_erf = jnp.ones((hex_n, m), x01.dtype)
        erf_levels.append(w_erf)

        for corner in range(8):
            w = jnp.ones((hex_n, m), x01.dtype)
            comps = []
            for d in range(3):
                if corner & (1 << d):
                    w = w * frac[d]
                    comps.append(pg[d] + np.uint32(1))
                else:
                    w = w * (1 - frac[d])
                    comps.append(pg[d])
            idx = _corner_index_components(spec, level, *comps)
            gidx_parts.append(
                idx.astype(jnp.int32) + np.int32(spec.offsets[level]))
            w_parts.append(w)

    if nd > 0 or bwd_value_dtype is not None:
        # Round-5 fused boundary: gather + corner sum inside one custom_vjp
        # so the backward can sort dense levels at SAMPLE granularity and
        # pack hashed-level payloads (see _gather_wsum_ml).
        hm = hex_n * m
        gidx_lvl = jnp.stack(
            [jnp.stack(gidx_parts[l * 8:(l + 1) * 8]).reshape(8, hm)
             for l in range(spec.num_levels)], axis=0)
        w_lvl = jnp.stack(
            [jnp.stack(w_parts[l * 8:(l + 1) * 8]).reshape(8, hm)
             for l in range(spec.num_levels)], axis=0)
        frac_lvl = (jnp.stack(frac_parts) if nd
                    else jnp.zeros((0, 4, hm), x01.dtype))
        parts = _gather_wsum_ml(
            spec.offsets, spec.dense_strides[:nd], bwd_value_dtype,
            gather_dtype, table, gidx_lvl, w_lvl, frac_lvl)
        acc_levels = [p.reshape(c_dim, hex_n, m) for p in parts]
    else:
        # One [L, 8*H*M] index array; level l's row holds its 8 corner
        # streams.
        gidx_lvl = jnp.stack(
            [jnp.stack(gidx_parts[l * 8:(l + 1) * 8]).reshape(-1)
             for l in range(spec.num_levels)], axis=0)
        # Per-level sliced gathers (operand-extent effect, see
        # _gather_rows_ml) returned as L separate [C, 8*H*M] parts; each is
        # weighted-corner-summed immediately so the [C, L*8, H, M] monolith
        # never materializes.
        parts = _gather_rows_ml(spec.offsets, gather_dtype, table, gidx_lvl)

        acc_levels = []
        for level in range(spec.num_levels):
            # Named so the remat policy keeps this (the expensive random HBM
            # gather) instead of recomputing it in the backward pass.
            # NOTE (measured, round 4): reducing the corner axis in the
            # gather's natural [lookups, C] layout and transposing the 8x
            # smaller result looked like it would save the ~24 ms/level
            # [M,4]->[4,M] transpose fusions seen in the trace — but benched
            # 14% SLOWER overall (8384 vs 9745 rays/s): the [H, M, C]-major
            # reduce drags minor-dim-4 (32x lane-padded) layouts into the
            # elementwise chain and total HBM traffic rises.  Channel-major
            # stays.
            rows = checkpoint_name(parts[level], "hashgrid_gather").reshape(
                c_dim, 8, hex_n, m)
            w_lvl = jnp.stack(w_parts[level * 8:(level + 1) * 8])  # [8,H,M]
            acc_levels.append(jnp.sum(rows * w_lvl[None], axis=1))  # [C,H,M]

    feats = []
    wmeans = []
    for level in range(spec.num_levels):
        acc = acc_levels[level]
        w_erf = erf_levels[level]
        if hex_n == w_erf.shape[0]:
            # Hex mode: per-point erf weights, mean over the hex axis.
            w_valid = jnp.where(oob, 0.0, w_erf)
            feats.append((acc * w_valid[None]).mean(axis=1))  # [C, M]
        else:
            # Single-query mode: one lookup at the hex-mean position,
            # modulated by the mean erf weight over the multisample stds.
            w_single = jnp.where(oob[0], 0.0, w_erf.mean(axis=0))
            feats.append(acc[:, 0] * w_single[None])
        wmeans.append(w_erf.mean(axis=0))
    return jnp.concatenate(feats, axis=0), jnp.stack(wmeans, axis=0)


def tv_loss(table, spec: HashGridSpec, x=None, key=None,
            num_points: int = 4096, bound: float = 1.0,
            weight: float = 1e-7):
    """Total-variation regularizer on the hash table at sampled points.

    API parity with ``GridEncoder.grad_total_variation`` (grid.py:176-198,
    kernel ``kernel_grad_tv`` gridencoder.cu:507-610).  The CUDA kernel adds
    ``w * sum_neighbors(anchor - neighbor) * rsqrt(sum (anchor-neighbor)^2 +
    1e-9)`` to the ANCHOR cell's gradient only (atomicAdd at the anchor
    index, w = weight / (2 D)).  That update is exactly the gradient of

        w * sum_{points, levels, channels} sqrt(sum_{d, side} diff^2 + 1e-9)

    with the neighbor lookups held constant — so this function returns that
    scalar with ``stop_gradient`` on the neighbors, and ``jax.grad`` w.r.t.
    the table reproduces the CUDA update (per-channel rsqrt, out-of-bound
    points skipped, boundary sides masked).  Like the reference, this is
    exposed API: no shipped training config invokes it (verified — no caller
    of grad_total_variation exists outside its definition).

    Args:
      table: [C, rows] channel-planar packed table.
      x: optional [..., D] points in [-bound, bound]; when None, num_points
        uniform samples in the unit cube are drawn from ``key`` (matching
        the wrapper's ``torch.rand`` default).
      weight: loss scale (reference default 1e-7).

    Returns:
      Scalar loss.
    """
    if x is None:
        if key is None:
            raise ValueError("tv_loss needs either x or key")
        x01 = jax.random.uniform(key, (num_points, spec.input_dim))
    else:
        x01 = ((x + bound) / (2 * bound)).reshape(-1, spec.input_dim)
    oob = jnp.any((x01 < 0) | (x01 > 1), axis=-1)  # [B]
    xs = jnp.clip(x01, 0.0, 1.0)

    total = jnp.float32(0.0)
    for level in range(spec.num_levels):
        scale = np.float32(spec.cuda_scales[level])
        res = np.uint32(spec.cuda_resolutions[level])
        pos_grid = jnp.floor(xs * scale + np.float32(0.5)).astype(jnp.uint32)
        level_offset = np.int32(spec.offsets[level])
        anchor = _corner_index(spec, level, pos_grid).astype(jnp.int32)
        a = jnp.take(table, anchor + level_offset, axis=1)  # [C, B]

        idelta = jnp.zeros_like(a)
        for d in range(spec.input_dim):
            onehot = np.zeros((spec.input_dim,), np.uint32)
            onehot[d] = 1
            for step, valid in (
                    (np.uint32(1), pos_grid[:, d] < res),
                    (np.uint32(0xFFFFFFFF), pos_grid[:, d] > 0)):
                npos = pos_grid + onehot * step  # uint32 wrap masked below
                nidx = _corner_index(spec, level, npos).astype(jnp.int32)
                nval = jax.lax.stop_gradient(
                    jnp.take(table, nidx + level_offset, axis=1))
                diff = jnp.where(valid[None], a - nval, 0.0)
                idelta = idelta + diff * diff
        per_pt = jnp.sqrt(idelta + np.float32(1e-9))  # [C, B]
        total = total + jnp.sum(jnp.where(oob[None], 0.0, per_pt))
    return np.float32(weight / (2 * spec.input_dim)) * total


def hash_decay_means(table, spec: HashGridSpec):
    """Per-level mean of squared embeddings: [L].

    Replaces the reference's segment_coo scatter-mean (models.py:299-306)
    with static per-level slices over the FLAT table — level extents are
    compile-time constants, so this is a handful of rank-1 reductions
    (mean over a level's rows x channels == mean over its flat slice).
    """
    means = []
    for l in range(spec.num_levels):
        lo, hi = spec.offsets[l], spec.offsets[l + 1]
        means.append(jnp.mean(table[:, lo:hi] ** 2))
    return jnp.stack(means)


def level_sq_means(table, spec: HashGridSpec):
    """Per-level mean over rows of sum_c emb^2: [L].  Used by the
    scale-featurization path (models.py:497-506)."""
    means = []
    for l in range(spec.num_levels):
        lo, hi = spec.offsets[l], spec.offsets[l + 1]
        means.append(jnp.mean(jnp.sum(table[:, lo:hi] ** 2, axis=0)))
    return jnp.stack(means)
