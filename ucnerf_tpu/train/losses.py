"""All UC-NeRF training losses (TPU/JAX).

Functional parity with the reference
(``/root/reference/nerf/internal/train_utils.py:149-332``): data (charb / mse /
rawnerf), sky BCE, affine-identity, interlevel (mip-NeRF 360), anti-interlevel
(Zip-NeRF blurred), distortion, orientation, hash-decay, opacity and predicted
normals.  Each returns a scalar already multiplied by its config weight, so
the total loss is a plain sum.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ucnerf_tpu.configs import Config
from ucnerf_tpu.ops import mathx, stepfun


def compute_data_loss(batch, renderings, config: Config):
    """RGB reconstruction loss (train_utils.py:171-230).

    Returns (loss, stats) where stats carries per-level MSEs for PSNR logging.
    """
    data_losses = []
    mses = []
    lossmult = jnp.broadcast_to(batch["lossmult"], batch["rgb"][..., :3].shape)
    denom = lossmult.sum()
    for rendering in renderings:
        resid_sq = (rendering["rgb"] - batch["rgb"][..., :3]) ** 2
        mses.append((lossmult * resid_sq).sum() / denom)
        if config.data_loss_type == "mse":
            data_loss = resid_sq
        elif config.data_loss_type == "charb":
            data_loss = jnp.sqrt(resid_sq + config.charb_padding**2)
        elif config.data_loss_type == "rawnerf":
            rgb_clip = jnp.minimum(1.0, rendering["rgb"])
            resid_sq_clip = (rgb_clip - batch["rgb"][..., :3]) ** 2
            scaling_grad = 1.0 / (1e-3 + jax.lax.stop_gradient(rgb_clip))
            data_loss = resid_sq_clip * scaling_grad**2
        else:
            raise ValueError(config.data_loss_type)
        data_losses.append((lossmult * data_loss).sum() / denom)
    loss = (config.data_coarse_loss_mult * sum(data_losses[:-1]) +
            config.data_loss_mult * data_losses[-1])
    stats = {"mses": jnp.stack(mses)}
    return loss, stats


def sky_loss(batch, renderings, config: Config):
    """BCE pushing acc to 0 on sky pixels, 1 elsewhere (train_utils.py:149-157)."""
    total = 0.0
    target = 1.0 - batch["sky_segs"]
    for rendering in renderings:
        acc = jnp.clip(jnp.sum(rendering["weights"], axis=-1), 1e-3, 1 - 1e-3)
        bce = -(target * jnp.log(acc) + (1 - target) * jnp.log(1 - acc))
        total += bce.mean()
    return config.sky_weight * total


def identity_loss(renderings, config: Config):
    """L1 pull of the affine color transforms to identity
    (train_utils.py:159-169)."""
    affine = renderings[0]["affine_trans"]
    eye = jnp.eye(4)[None, :3, :]
    loss = jnp.abs(eye - affine)
    affine_sky = renderings[0].get("affine_trans_sky")
    if affine_sky is not None:
        loss = loss + jnp.abs(eye - affine_sky)
    return config.idt_weight * loss.mean()


def interlevel_loss(ray_history, config: Config):
    """mip-NeRF 360 proposal loss (train_utils.py:233-244)."""
    c = jax.lax.stop_gradient(ray_history[-1]["sdist"])
    w = jax.lax.stop_gradient(ray_history[-1]["weights"])
    total = 0.0
    for ray_results in ray_history[:-1]:
        cp = ray_results["sdist"]
        wp = ray_results["weights"]
        total += stepfun.lossfun_outer(c, w, cp, wp).mean()
    return config.interlevel_loss_mult * total


def anti_interlevel_loss(ray_history, config: Config):
    """Zip-NeRF anti-aliased interlevel loss (train_utils.py:247-270)."""
    c = jax.lax.stop_gradient(ray_history[-1]["sdist"])
    w = jax.lax.stop_gradient(ray_history[-1]["weights"])
    w_normalize = w / (c[..., 1:] - c[..., :-1])
    total = 0.0
    for i, ray_results in enumerate(ray_history[:-1]):
        cp = ray_results["sdist"]
        wp = ray_results["weights"]
        c_, w_ = stepfun.blur_stepfun(c, w_normalize, config.pulse_width[i])
        # Piecewise-linear PDF -> piecewise-quadratic CDF.
        area = 0.5 * (w_[..., 1:] + w_[..., :-1]) * (c_[..., 1:] - c_[..., :-1])
        cdf = jnp.concatenate(
            [jnp.zeros_like(area[..., :1]), jnp.cumsum(area, axis=-1)],
            axis=-1)
        cdf_interp = mathx.sorted_interp_quad(cp, c_, w_, cdf)
        w_s = jnp.diff(cdf_interp, axis=-1)
        total += (jnp.maximum(w_s - wp, 0.0) ** 2 / (wp + 1e-5)).mean()
    return config.anti_interlevel_loss_mult * total


def distortion_loss(ray_history, config: Config):
    """mip-NeRF 360 distortion regularizer (train_utils.py:273-279)."""
    c = ray_history[-1]["sdist"]
    w = ray_history[-1]["weights"]
    return config.distortion_loss_mult * stepfun.lossfun_distortion(c, w).mean()


def orientation_loss(batch, ray_history, config: Config, num_levels: int):
    """ref-NeRF orientation regularizer (train_utils.py:282-298)."""
    total = 0.0
    for i, ray_results in enumerate(ray_history):
        w = ray_results["weights"]
        n = ray_results[config.orientation_loss_target]  # [3, R, S]
        if n is None:
            raise ValueError("Normals cannot be None for orientation loss.")
        v = -batch["viewdirs"]  # [R, 3]
        n_dot_v = jnp.einsum("crs,rc->rs", n, v)
        loss = (w * jnp.maximum(n_dot_v, 0.0) ** 2).sum(axis=-1).mean()
        mult = (config.orientation_coarse_loss_mult if i < num_levels - 1
                else config.orientation_loss_mult)
        total += mult * loss
    return total


def predicted_normal_loss(ray_history, config: Config, num_levels: int):
    """ref-NeRF predicted-normal supervision (train_utils.py:316-332)."""
    total = 0.0
    for i, ray_results in enumerate(ray_history):
        w = ray_results["weights"]
        n = ray_results["normals"]  # [3, R, S]
        n_pred = ray_results["normals_pred"]
        if n is None or n_pred is None:
            raise ValueError("Normals required for predicted-normal loss.")
        loss = jnp.mean(
            (w * (1.0 - jnp.sum(n * n_pred, axis=0))).sum(axis=-1))
        mult = (config.predicted_normal_coarse_loss_mult if i < num_levels - 1
                else config.predicted_normal_loss_mult)
        total += mult * loss
    return total


def hash_decay_loss(ray_history, config: Config):
    """L2 decay of hash tables (train_utils.py:301-305)."""
    total = 0.0
    for ray_results in ray_history:
        total += config.hash_decay_mults * ray_results["loss_hash_decay"]
    return total


def opacity_loss(renderings, config: Config):
    """Entropy-style opacity regularizer (train_utils.py:308-313)."""
    total = 0.0
    for rendering in renderings:
        o = rendering["acc"]
        total += config.opacity_loss_mult * (-o * jnp.log(o + 1e-5)).mean()
    return total


def compute_all_losses(batch, renderings, ray_history, config: Config):
    """Assemble the full loss dict as the reference train loop does
    (train.py:170-218).  Returns (total, losses_dict, stats)."""
    losses: Dict[str, Any] = {}
    data_loss, stats = compute_data_loss(batch, renderings, config)
    losses["data"] = data_loss
    if config.model_sky:
        losses["sky_segments"] = sky_loss(batch, renderings, config)
    if config.brightness_correction:
        losses["identity"] = identity_loss(renderings, config)
    num_levels = config.model.num_levels
    if config.interlevel_loss_mult > 0 and num_levels > 1:
        losses["interlevel"] = interlevel_loss(ray_history, config)
    if config.anti_interlevel_loss_mult > 0 and num_levels > 1:
        losses["anti_interlevel"] = anti_interlevel_loss(ray_history, config)
    if config.distortion_loss_mult > 0:
        losses["distortion"] = distortion_loss(ray_history, config)
    if config.opacity_loss_mult > 0:
        losses["opacity"] = opacity_loss(renderings, config)
    if (config.orientation_coarse_loss_mult > 0 or
            config.orientation_loss_mult > 0):
        losses["orientation"] = orientation_loss(batch, ray_history, config,
                                                 num_levels)
    if config.hash_decay_mults > 0:
        losses["hash_decay"] = hash_decay_loss(ray_history, config)
    if (config.predicted_normal_coarse_loss_mult > 0 or
            config.predicted_normal_loss_mult > 0):
        losses["predicted_normals"] = predicted_normal_loss(
            ray_history, config, num_levels)
    total = sum(losses.values())
    return total, losses, stats
