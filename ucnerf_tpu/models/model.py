"""The UC-NeRF model: Zip-NeRF proposal hierarchy + sky + color correction.

TPU-native re-design of the reference ``Model`` (
``/root/reference/nerf/internal/models.py:31-365``): N-1 proposal levels
resample ray intervals from the previous level's weight histogram, the final
nerf level renders color, a separate sky NeRF fills in (1-acc), and per-view
affine color correction is applied per level.  Everything is a single jit-able
function of (params, batch, key, train_frac) — no Python state, no host
round-trips, static shapes throughout.

Ray batch convention (flat, [N, ...]):
  origins [N,3], directions [N,3], viewdirs [N,3], cam_dirs [N,3],
  radii [N,1], near [N,1], far [N,1], cam_idx [N] (int), lossmult [N,1],
  rgb [N,3] (supervision), sky_segs [N] (1=sky).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu.configs import Config
from ucnerf_tpu.models.brightness import BrightnessCorrection, apply_affine
from ucnerf_tpu.models.cam_refine import CameraRefinement
from ucnerf_tpu.models.fields import ZipMLP
from ucnerf_tpu.models.sky import SkyNeRF, render_sky
from ucnerf_tpu.ops import coord, grad_scaler, hashgrid, rendering, stepfun


class UCNeRFModel(nn.Module):
    """Proposal-hierarchy NeRF with UC-NeRF extensions."""
    config: Config

    def setup(self):
        cfg = self.config
        mcfg = cfg.model
        # Remat the field MLPs: the per-level encode+MLP intermediates are
        # recomputed in the backward pass instead of living across the whole
        # step (jax.checkpoint; replaces nothing in the reference — torch
        # keeps all activations and pays in HBM).  The hash-table gather is
        # excluded from rematerialization (save_only_these_names): re-running
        # a multi-million-row random HBM gather costs ~100ms/microbatch on
        # v5e while its output is only ~40-60MB.
        remat_policy = jax.checkpoint_policies.save_only_these_names(
            "hashgrid_gather")
        field_cls = (nn.remat(ZipMLP, policy=remat_policy)
                     if cfg.remat_fields else ZipMLP)
        import dataclasses as _dc
        nerf_mlp_cfg, prop_mlp_cfg = cfg.nerf_mlp, cfg.prop_mlp
        if cfg.contract_origin_grads:
            nerf_mlp_cfg = _dc.replace(nerf_mlp_cfg, contract_grads=True)
            prop_mlp_cfg = _dc.replace(prop_mlp_cfg, contract_grads=True)
        self.nerf_mlp = field_cls(nerf_mlp_cfg, name="nerf_mlp")
        prop_mlps = []
        for i in range(mcfg.num_levels - 1):
            prop_mlps.append(field_cls(
                prop_mlp_cfg.with_grid(mcfg.prop_desired_grid_size[i]),
                name=f"prop_mlp_{i}"))
        self.prop_mlps = prop_mlps
        if cfg.model_sky:
            self.skynerf = SkyNeRF(
                net_depth=mcfg.sky_net_depth, net_width=mcfg.sky_net_width,
                deg_view=mcfg.sky_deg_view, name="skynerf")
        if cfg.optimize_cameras:
            self.cam_refine = CameraRefinement(num_cams=cfg.num_phys_cams,
                                               name="cam_refine")
        if cfg.brightness_correction:
            self.brightness_corr = BrightnessCorrection(
                n_views=cfg.training_views, model_sky=cfg.model_sky,
                n_dim=mcfg.brightness_latent_dim,
                net_depth=mcfg.brightness_net_depth,
                net_width=mcfg.brightness_net_width,
                name="brightness_corr")

    def __call__(self, key, batch, train_frac, compute_extras=False,
                 train=True, eval_camidx=None):
        """Render a flat ray batch.

        Args:
          key: PRNG key (None for fully deterministic rendering).
          batch: dict of ray arrays (see module docstring).
          train_frac: float in [0,1], fraction of training complete.
          compute_extras: compute visualization extras.
          train: training mode (adds hash-decay terms to ray history).
          eval_camidx: optional int — brightness-correction view id to use for
            every ray (eval renders of test views, models.py:340-343).

        Returns:
          (renderings, ray_history): one dict per sampling level each.
        """
        cfg = self.config
        mcfg = cfg.model

        if cfg.optimize_cameras and "phys_cam_idx" in batch:
            # Differentiable per-camera se(3) refinement at device-side
            # ray-gen (equivalent to regenerating rays from Exp(delta)@c2w —
            # see models/cam_refine.py).  viewdirs are the normalized
            # directions; rotation preserves norms so renormalization is a
            # no-op up to fp error and we rotate them directly.
            o2, d2, cd2 = self.cam_refine(
                batch["phys_cam_idx"], batch["origins"],
                batch["directions"], batch["cam_dirs"])
            vd2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
            batch = dict(batch, origins=o2, directions=d2, cam_dirs=cd2,
                         viewdirs=vd2)

        # Mapping from normalized to metric ray distances.
        _, s_to_t = coord.construct_ray_warps(
            mcfg.raydist_fn, batch["near"], batch["far"], mcfg.power_lambda)

        if mcfg.near_anneal_rate is None:
            init_s_near = 0.0
        else:
            init_s_near = float(np.clip(
                1 - train_frac / mcfg.near_anneal_rate, 0,
                mcfg.near_anneal_init))
        init_s_far = 1.0
        sdist = jnp.concatenate([
            jnp.full_like(batch["near"], init_s_near),
            jnp.full_like(batch["far"], init_s_far),
        ], axis=-1)
        weights = jnp.ones_like(batch["near"])
        prod_num_samples = 1

        keys = ([None] * (3 * mcfg.num_levels + 2) if key is None
                else list(jax.random.split(key, 3 * mcfg.num_levels + 2)))
        ki = 0

        ray_history = []
        renderings = []
        for i_level in range(mcfg.num_levels):
            is_prop = i_level < (mcfg.num_levels - 1)
            num_samples = (mcfg.num_prop_samples if is_prop
                           else mcfg.num_nerf_samples)

            dilation = (mcfg.dilation_bias + mcfg.dilation_multiplier *
                        (init_s_far - init_s_near) / prod_num_samples)
            prod_num_samples *= num_samples

            use_dilation = mcfg.dilation_bias > 0 or mcfg.dilation_multiplier > 0
            if i_level > 0 and use_dilation:
                sdist, weights = stepfun.max_dilate_weights(
                    sdist, weights, dilation,
                    domain=(init_s_near, init_s_far), renormalize=True)
                sdist = sdist[..., 1:-1]
                weights = weights[..., 1:-1]

            if mcfg.anneal_slope > 0:
                # Schlick's bias function.
                bias = lambda x, s: (s * x) / ((s - 1) * x + 1)
                anneal = bias(train_frac, mcfg.anneal_slope)
            else:
                anneal = 1.0

            logits_resample = jnp.where(
                sdist[..., 1:] > sdist[..., :-1],
                anneal * jnp.log(weights + mcfg.resample_padding),
                -jnp.inf)

            sdist = stepfun.sample_intervals(
                keys[ki], sdist, logits_resample, num_samples,
                single_jitter=mcfg.single_jitter,
                domain=(init_s_near, init_s_far))
            ki += 1

            if mcfg.stop_level_grad:
                sdist = jax.lax.stop_gradient(sdist)

            tdist = s_to_t(sdist)

            # Channel-major hot path: means [3, 6, R, S], stds/ts [6, R, S].
            means, stds, ts = rendering.cast_rays_cm(
                keys[ki], tdist, batch["origins"], batch["directions"],
                batch["cam_dirs"], batch["radii"], std_scale=mcfg.std_scale)
            ki += 1

            mlp = self.prop_mlps[i_level] if is_prop else self.nerf_mlp
            ray_results = mlp(
                keys[ki], means, stds,
                viewdirs=batch["viewdirs"] if mcfg.use_viewdirs else None)
            ki += 1

            if cfg.brightness_correction:
                # Floaters-no-more gradient scaling (models.py:232-235);
                # the reference scales by the hex-mean sample distance.
                rgb_s, density_s = grad_scaler.scale_gradients_by_distance(
                    ray_results["rgb"], ray_results["density"],
                    ts.mean(axis=0))
                ray_results = dict(ray_results, rgb=rgb_s, density=density_s)

            weights = rendering.compute_alpha_weights(
                ray_results["density"], tdist, batch["directions"],
                opaque_background=mcfg.opaque_background)[0]

            bg_rgbs = mcfg.bg_intensity_range[0]
            if mcfg.bg_intensity_range[0] != mcfg.bg_intensity_range[1]:
                if key is None:
                    bg_rgbs = sum(mcfg.bg_intensity_range) / 2
                else:
                    lo, hi = mcfg.bg_intensity_range
                    bg_rgbs = lo + (hi - lo) * jax.random.uniform(
                        keys[-1], weights.shape[:-1] + (3,))

            level_render = rendering.volumetric_rendering_cm(
                ray_results["rgb"], weights, tdist, bg_rgbs, batch["far"],
                compute_extras,
                extras={k: v for k, v in ray_results.items()
                        if k.startswith("normals")})
            level_render["weights"] = weights

            if train:
                # Hash decay over this level's table: per-level mean of
                # squared embeddings (replaces segment_coo, models.py:297-306).
                ray_results["loss_hash_decay"] = hashgrid.hash_decay_means(
                    mlp.table, mlp.grid_spec).mean()

            renderings.append(level_render)
            ray_results["sdist"] = sdist
            ray_results["weights"] = weights
            if is_prop and mlp.config.disable_rgb:
                # disable_rgb prop MLPs emit zeros [3,R,S] as a compositing
                # placeholder; drop them from the history so vis substitutes
                # white (the reference plots ray_rgbs only for levels that
                # have them, vis.py:193-221).  Prop MLPs configured with real
                # rgb heads keep theirs.
                ray_results["rgb"] = None
            ray_history.append(ray_results)

        # Sky layer: render beyond the far plane, composite with (1 - acc)
        # after per-view color correction (models.py:326-363).
        sky_rgb = None
        if cfg.model_sky:
            sky_near = batch["far"]
            sky_far = jnp.full_like(
                sky_near,
                jax.lax.stop_gradient(batch["far"][0, 0]) * mcfg.sky_far_mult)
            sky_out = render_sky(
                self.skynerf, batch["origins"], batch["directions"],
                sky_near, sky_far, mcfg.sky_num_samples,
                viewdirs=batch["cam_dirs"])
            sky_rgb = sky_out["rgb_map"]
            for r in renderings:
                r["sky_rgbs"] = sky_rgb

        if cfg.brightness_correction:
            if eval_camidx is None:
                camera_idxs = batch["cam_idx"]
            else:
                camera_idxs = jnp.full(
                    (renderings[0]["rgb"].shape[0],), eval_camidx, jnp.int32)
            affine, affine_sky = self.brightness_corr(camera_idxs)
            # Sky opacity from the FINAL level's weights, applied to every
            # level (reference uses the loop-escaped `rendering['weights']`,
            # models.py:350-354).
            final_acc = jnp.sum(renderings[-1]["weights"], axis=-1,
                                keepdims=True)
            sky_opacity = 1.0 - final_acc
            for r in renderings:
                rgb_cc = apply_affine(affine, r["rgb"])
                if cfg.model_sky:
                    rgb_cc = rgb_cc + sky_opacity * apply_affine(
                        affine_sky, r["sky_rgbs"])
                r["rgb"] = rgb_cc
                r["affine_trans"] = affine
                if cfg.model_sky:
                    r["affine_trans_sky"] = affine_sky
        elif cfg.model_sky:
            # Sky without color correction: plain (1-acc) compositing.  The
            # reference only composites the sky inside the brightness branch
            # (models.py:350-354) — its shipped configs always enable both —
            # so this standalone path is a deliberate generalization.
            final_acc = jnp.sum(renderings[-1]["weights"], axis=-1,
                                keepdims=True)
            for r in renderings:
                r["rgb"] = r["rgb"] + (1.0 - final_acc) * r["sky_rgbs"]

        return renderings, ray_history
