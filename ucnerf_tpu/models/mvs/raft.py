"""CER-MVS: cascaded recurrent multi-view-stereo depth (TPU/JAX).

Functional parity with the reference ``RAFT``
(``/root/reference/mvs/core/raft.py:13-109``): instance-norm feature encoder +
no-norm context encoder at 1/4 ("HR") or 1/8 ("LR") resolution, a 2-stage
cascade of depth-hypothesis slabs ((64 hyp, spacing 1/400/64, 8 iters),
(auto=44 hyp, spacing 1/400/320, 8 iters)), each stage building a plane-sweep
correlation pyramid and running ConvGRU refinement of the inverse-depth map.

The CUDA correlation sampler is replaced by XLA gathers + einsum
(see corr.py); fp16 autocast is replaced by full fp32 (bf16 is a later
optimization toggle).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ucnerf_tpu.models.mvs.corr import (build_corr_volume, corr_pyramid,
                                        lookup)
from ucnerf_tpu.models.mvs.extractor import BasicEncoder
from ucnerf_tpu.models.mvs.update import UpdateBlock


class RAFTMVS(nn.Module):
    """Reference-view inverse-depth estimation from a temporal window."""
    cascade: Tuple[Tuple[int, int, int], ...] = ((64, 64, 8), (-1, 320, 8))
    encoder_type: str = "HR"
    dim_fmap: int = 64
    dim_net: int = 64
    dim_inp: int = 64
    num_levels: int = 3
    radius: int = 5

    def setup(self):
        self.fnet = BasicEncoder(output_dim=self.dim_fmap,
                                 norm_fn="instance",
                                 encoder_type=self.encoder_type, name="fnet")
        self.cnet = BasicEncoder(output_dim=self.dim_net + self.dim_inp,
                                 norm_fn="none",
                                 encoder_type=self.encoder_type, name="cnet")
        self.update_block = UpdateBlock(
            num_stages=len(self.cascade), dim_net=self.dim_net,
            dim_inp=self.dim_inp, num_levels=self.num_levels,
            radius=self.radius, name="update_block")

    def __call__(self, images, poses, intrinsics, scale=None,
                 return_predictions=False):
        """Estimate the ref view's inverse depth.

        Args:
          images: [V, H, W, 3] uint8-range floats; view 0 is the reference.
          poses: [V, 4, 4] world-to-cam.
          intrinsics: [V, 3, 3] at full image resolution.
          scale: optional scalar multiplying pose translations on entry and
            the output disparity on exit (raft.py:35,106-108).

        Returns:
          disp [h, w] inverse depth at feature resolution (1/4 or 1/8).
        """
        if scale is not None:
            poses = poses.at[:, :3, 3].multiply(scale)
        factor = 8 if self.encoder_type == "LR" else 4
        intrinsics = intrinsics.at[:, :2].divide(float(factor))
        images = images * (2.0 / 255.0) - 1.0

        v, ht, wd = images.shape[0], images.shape[1], images.shape[2]
        h, w = ht // factor, wd // factor
        src = tuple(range(1, v))

        net_inp = self.cnet(images[:1])[0]  # [h, w, net+inp]
        net = jnp.tanh(net_inp[..., :self.dim_net])
        inp = nn.relu(net_inp[..., self.dim_net:])
        fmaps = self.fnet(images)  # [V, h, w, C]

        disp = jnp.zeros((h, w))
        predictions = []
        for stage, (n_incre, incre_div, n_iters) in enumerate(self.cascade):
            if n_incre == -1:
                n_incre = (2 * self.radius + 1) * 2 ** (self.num_levels - 1)
            incre = 0.0025 / incre_div

            # Hypothesis slab center: stage 0 shifts away from zero
            # (corr.py:58-62); later stages center on the estimate.
            if stage == 0:
                disps_origin = jnp.maximum(disp, n_incre // 2 * incre)
            else:
                disps_origin = disp
            disps_origin = jax.lax.stop_gradient(disps_origin)
            hyp = ((jnp.arange(n_incre) - n_incre // 2) * incre)
            disps = hyp[:, None, None] + disps_origin[None]  # [D, h, w]

            corr = build_corr_volume(fmaps, poses, intrinsics, disps, src)
            pyramid = corr_pyramid(corr, self.num_levels)

            for _ in range(n_iters):
                disp = jax.lax.stop_gradient(disp)
                corr_frames = lookup(pyramid, disp, disps_origin, incre,
                                     n_incre, self.radius)
                net, delta = self.update_block(net, inp, disp, corr_frames,
                                               stage)
                disp = disp + delta
                predictions.append(disp)

        if scale is not None:
            disp = disp * scale
        if return_predictions:
            # Per-iteration estimates for the sequence loss (raft.py:104).
            return disp, predictions
        return disp
