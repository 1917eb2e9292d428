"""CER-MVS recurrent update block (TPU/JAX, NHWC).

Functional parity with the reference (``/root/reference/mvs/core/update.py``):
a ConvGRU over a hidden state fed with (context, 7x7 disparity-difference
encoding x100, encoded correlation features), emitting a 0.01-scaled
disparity delta per cascade stage (update.py:29-120).  Weight sharing follows
the reference defaults: correlation encoder and GRU shared across stages,
per-stage delta heads.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ucnerf_tpu.models.mvs.extractor import kaiming_normal


def _conv(f, k, name):
    return nn.Conv(f, (k, k), padding=k // 2, name=name,
                   kernel_init=kaiming_normal)


class ConvGRU(nn.Module):
    h_planes: int
    kernel: int = 3

    @nn.compact
    def __call__(self, net, inp):
        net_inp = jnp.concatenate([net, inp], axis=-1)
        z = nn.sigmoid(_conv(self.h_planes, self.kernel, "convz")(net_inp))
        r = nn.sigmoid(_conv(self.h_planes, self.kernel, "convr")(net_inp))
        q = nn.tanh(_conv(self.h_planes, self.kernel, "convq")(
            jnp.concatenate([r * net, inp], axis=-1)))
        return (1 - z) * net + z * q


def disp_encoding(disp, size=7):
    """7x7 neighborhood differences of the disparity (update.py:83-88).

    disp [N, H, W, 1] -> [N, H, W, size*size] of (neighbor - center).
    """
    patches = jax.lax.conv_general_dilated_patches(
        disp, (size, size), (1, 1),
        [(size // 2, size // 2), (size // 2, size // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return patches - disp


class UpdateBlock(nn.Module):
    """Shared-weights GRU update over per-view correlation features."""
    num_stages: int = 2
    dim_net: int = 64
    dim_inp: int = 64
    dim0_corr: int = 64
    dim1_corr: int = 64
    dim0_delta: int = 256
    num_levels: int = 3
    radius: int = 5
    size_disp_enc: int = 7
    aggregation: Tuple[str, ...] = ("mean",)

    @nn.compact
    def __call__(self, net, inp, disp, corr_frames, stage: int):
        """One GRU step.

        Args:
          net: [H, W, dim_net] hidden state.
          inp: [H, W, dim_inp] context features.
          disp: [H, W] current disparity.
          corr_frames: [num, H, W, F] per-source-view correlation lookups.
          stage: static cascade stage index (selects the delta head).

        Returns:
          (net, delta [H, W]).
        """
        disp_enc = 100.0 * disp_encoding(disp[None, ..., None],
                                         self.size_disp_enc)[0]
        parts = []
        if "mean" in self.aggregation:
            parts.append(jnp.mean(corr_frames, axis=0))
        if "max" in self.aggregation:
            parts.append(jnp.max(corr_frames, axis=0))
        if "std" in self.aggregation:
            parts.append(jnp.std(corr_frames, axis=0))
        corr = jnp.concatenate(parts, axis=-1)[None]  # [1, H, W, F*|agg|]

        # Correlation encoder (shared across stages, update.py:60-66).
        c = nn.relu(nn.Conv(self.dim0_corr, (1, 1), name="corr_encoder_0",
                            kernel_init=kaiming_normal)(corr))
        c = nn.relu(_conv(self.dim1_corr, 3, "corr_encoder_1")(c))

        gru_inp = jnp.concatenate(
            [inp[None], disp_enc[None], c[0][None]], axis=-1)
        net = ConvGRU(self.dim_net, name="gru")(net[None], gru_inp)[0]

        # Per-stage delta head (share_delta=False, update.py:67-71).
        d = nn.relu(_conv(self.dim0_delta, 3, f"delta{stage}_0")(net[None]))
        d = _conv(1, 3, f"delta{stage}_1")(d)
        delta = 0.01 * d[0, ..., 0]
        return net, delta
