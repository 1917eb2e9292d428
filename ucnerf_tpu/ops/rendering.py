"""Volume rendering core: hex multisampling, alpha compositing (TPU/JAX).

Functional parity with the reference (``/root/reference/nerf/internal/render.py``):
conical-frustum Gaussians (render.py:34-69), Zip-NeRF's hexagonal 6-point
multisampling ``cast_rays`` (render.py:94-152), ``compute_alpha_weights``
(render.py:155-174) and ``volumetric_rendering`` (render.py:177-244) with its
depth/acc/percentile outputs (including the acc<0.6 -> depth=300 sky clamp,
render.py:208-213).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ucnerf_tpu.ops import mathx, stepfun

EPS = mathx.EPS

# Hexagonal phase pattern (multiples of pi/3), Zip-NeRF Sec. 3.1.
_HEX_PATTERN = (0.0, 2.0, 4.0, 3.0, 5.0, 1.0)


def lift_gaussian(d, t_mean, t_var, r_var, diag):
    """Lift a Gaussian defined along a ray to 3D coordinates."""
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(jnp.sum(d**2, axis=-1, keepdims=True), EPS)
    if diag:
        d_outer_diag = d**2
        null_outer_diag = 1 - d_outer_diag / d_mag_sq
        t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
        xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
        return mean, t_cov_diag + xy_cov_diag
    d_outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(d.shape[-1])
    null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag, stable=True):
    """Approximate a conical frustum as a Gaussian (mip-NeRF Eq. 7)."""
    if stable:
        mu = (t0 + t1) / 2
        hw = (t1 - t0) / 2
        denom = jnp.maximum(3 * mu**2 + hw**2, EPS)
        t_mean = mu + (2 * mu * hw**2) / denom
        t_var = (hw**2) / 3 - (4 / 15) * hw**4 * (12 * mu**2 - hw**2) / denom**2
        r_var = (mu**2) / 4 + (5 / 12) * hw**2 - (4 / 15) * (hw**4) / denom
    else:
        t_mean = (3 * (t1**4 - t0**4)) / (4 * (t1**3 - t0**3))
        r_var = 3 / 20 * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_mosq = 3 / 5 * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_var = t_mosq - t_mean**2
    r_var = r_var * base_radius**2
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(d, t0, t1, radius, diag):
    """Approximate a cylinder as a Gaussian."""
    t_mean = (t0 + t1) / 2
    r_var = radius**2 / 4
    t_var = (t1 - t0) ** 2 / 12
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays(key, tdist, origins, directions, cam_dirs, radii,
              std_scale=0.5, rand_vec=None):
    """Zip-NeRF hexagonal 6-point multisampling of conical frustums.

    For each ray interval [t0, t1], places 6 sample points on a helix over the
    cone cross-section, with a camera-plane-aligned orthonormal basis
    (render.py:94-152).

    Args:
      key: PRNG key for the random rotation/flip and basis vector, or None for
        the deterministic eval pattern (alternate 30deg rotation + flip).
      tdist: [..., n+1] fencepost distances.
      origins/directions/cam_dirs: [..., 3].
      radii: [..., 1], base radius of the cone at dist 1.
      std_scale: multiplier on the per-sample Gaussian std.

    Returns:
      means [..., n, 6, 3], stds [..., n, 6], ts [..., n, 6].
    """
    t0 = tdist[..., :-1, None]
    t1 = tdist[..., 1:, None]
    radii = radii[..., None]

    t_m = (t0 + t1) / 2
    t_d = (t1 - t0) / 2

    j = jnp.arange(6, dtype=tdist.dtype)
    t = t0 + t_d / (t_d**2 + 3 * t_m**2) * (
        t1**2 + 2 * t_m**2 + 3 / 7**0.5 * (2 * j / 5 - 1) *
        jnp.sqrt((t_d**2 - t_m**2) ** 2 + 4 * t_m**4))

    deg = jnp.pi / 3 * jnp.asarray(_HEX_PATTERN, dtype=tdist.dtype)
    deg = jnp.broadcast_to(deg, t.shape)
    if key is not None:
        key_flip, key_rot, key_basis = jax.random.split(key, 3)
        # Randomly rotate and flip the hex pattern per interval.
        mask = jax.random.uniform(key_flip, t0.shape[:-1]) > 0.5
        deg = deg + 2 * jnp.pi * jax.random.uniform(
            key_rot, deg.shape[:-1])[..., None]
        deg = jnp.where(mask[..., None], deg, jnp.pi * 5 / 3 - deg)
    else:
        # Rotate 30 degrees and flip every other pattern.
        key_basis = jax.random.PRNGKey(0)
        mask = jnp.arange(t.shape[-2]) % 2 == 0
        mask = jnp.broadcast_to(mask, t.shape[:-1])
        deg = jnp.where(mask[..., None], deg, deg + jnp.pi / 6)
        deg = jnp.where(mask[..., None], deg, jnp.pi * 5 / 3 - deg)

    means_local = jnp.stack([
        radii * t * jnp.cos(deg) / 2**0.5,
        radii * t * jnp.sin(deg) / 2**0.5,
        t,
    ], axis=-1)
    stds = std_scale * radii * t / 2**0.5

    # Orthonormal basis with two vectors parallel to the image plane.
    # `rand_vec` is injectable for torch-oracle parity tests (the reference
    # draws it from the global torch RNG, render.py:140).
    if rand_vec is None:
        rand_vec = jax.random.normal(key_basis, cam_dirs.shape,
                                     cam_dirs.dtype)
    def normalize(v):
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    ortho1 = normalize(jnp.cross(cam_dirs, rand_vec))
    ortho2 = normalize(jnp.cross(cam_dirs, ortho1))

    # World offset = ortho1 * mx + ortho2 * my + directions * mz.
    basis = jnp.stack([ortho1, ortho2, directions], axis=-2)  # [..., 3(row), 3]
    means = jnp.einsum("...nsk,...kj->...nsj", means_local,
                       basis[..., :, :], precision=jax.lax.Precision.HIGHEST)
    means = means + origins[..., None, None, :]
    return means, stds, t


def cast_rays_cm(key, tdist, origins, directions, cam_dirs, radii,
                 std_scale=0.5, rand_vec=None):
    """Channel-major / hex-major twin of cast_rays for the TPU hot path.

    Identical math, but every large tensor is laid out with the sample axis
    minormost: a [R, S, 6(,3)] layout lane-pads the trailing 6 or 3 up to
    128 on TPU (a 21-42x HBM blowup at training sizes); [*, 6, R, S] tiles
    cleanly.

    Returns:
      means [3, 6, R, S], stds [6, R, S], ts [6, R, S].
    """
    r, s1 = tdist.shape
    s = s1 - 1
    t0 = tdist[None, :, :-1]  # [1, R, S]
    t1 = tdist[None, :, 1:]
    radii_b = radii.reshape(1, r, 1)

    t_m = (t0 + t1) / 2
    t_d = (t1 - t0) / 2

    j = jnp.arange(6, dtype=tdist.dtype).reshape(6, 1, 1)
    t = t0 + t_d / (t_d**2 + 3 * t_m**2) * (
        t1**2 + 2 * t_m**2 + 3 / 7**0.5 * (2 * j / 5 - 1) *
        jnp.sqrt((t_d**2 - t_m**2) ** 2 + 4 * t_m**4))  # [6, R, S]

    deg = (jnp.pi / 3) * jnp.asarray(_HEX_PATTERN,
                                     tdist.dtype).reshape(6, 1, 1)
    deg = jnp.broadcast_to(deg, (6, r, s))
    if key is not None:
        key_flip, key_rot, key_basis = jax.random.split(key, 3)
        mask = jax.random.uniform(key_flip, (r, s)) > 0.5
        deg = deg + 2 * jnp.pi * jax.random.uniform(key_rot, (r, s))[None]
        deg = jnp.where(mask[None], deg, jnp.pi * 5 / 3 - deg)
    else:
        key_basis = jax.random.PRNGKey(0)
        mask = (jnp.arange(s) % 2 == 0)[None, None, :]
        deg = jnp.where(mask, deg, deg + jnp.pi / 6)
        deg = jnp.where(mask, deg, jnp.pi * 5 / 3 - deg)

    mx = radii_b * t * jnp.cos(deg) / 2**0.5  # [6, R, S]
    my = radii_b * t * jnp.sin(deg) / 2**0.5
    mz = t
    stds = std_scale * radii_b * t / 2**0.5

    if rand_vec is None:
        rand_vec = jax.random.normal(key_basis, cam_dirs.shape,
                                     cam_dirs.dtype)
    def normalize(v):
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    ortho1 = normalize(jnp.cross(cam_dirs, rand_vec))  # [R, 3]
    ortho2 = normalize(jnp.cross(cam_dirs, ortho1))

    # world = o1*mx + o2*my + dir*mz + origin, per component: [3, 6, R, S].
    def comp(c):
        return (ortho1[:, c].reshape(1, r, 1) * mx
                + ortho2[:, c].reshape(1, r, 1) * my
                + directions[:, c].reshape(1, r, 1) * mz
                + origins[:, c].reshape(1, r, 1))
    means = jnp.stack([comp(0), comp(1), comp(2)], axis=0)
    return means, stds, t


def compute_alpha_weights(density, tdist, dirs, opaque_background=False):
    """Alpha-compositing weights from densities (render.py:155-174)."""
    t_delta = tdist[..., 1:] - tdist[..., :-1]
    delta = t_delta * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    density_delta = density * delta
    if opaque_background:
        density_delta = jnp.concatenate([
            density_delta[..., :-1],
            jnp.full_like(density_delta[..., -1:], jnp.inf)
        ], axis=-1)
    alpha = 1 - jnp.exp(-density_delta)
    trans = jnp.exp(-jnp.concatenate([
        jnp.zeros_like(density_delta[..., :1]),
        jnp.cumsum(density_delta[..., :-1], axis=-1)
    ], axis=-1))
    weights = alpha * trans
    return weights, alpha, trans


def volumetric_rendering_cm(rgbs_cm, weights, tdist, bg_rgbs, t_far,
                            compute_extras, extras=None):
    """Channel-major volumetric rendering: rgbs_cm [3, R, S], weights [R, S].

    Same outputs as volumetric_rendering; the composite over samples is an
    einsum so the [R, S, 3] layout never materializes."""
    rendering = {}
    acc = weights.sum(axis=-1)
    bg_w = jnp.maximum(1 - acc, 0.0)
    rgb = (jnp.einsum("rs,crs->rc", weights, rgbs_cm,
                      precision=jax.lax.Precision.HIGHEST)
           + bg_w[:, None] * bg_rgbs)
    t_mids = 0.5 * (tdist[..., :-1] + tdist[..., 1:])
    depth = jnp.clip(
        jnp.nan_to_num((weights * t_mids).sum(axis=-1) /
                       jnp.maximum(acc, EPS), nan=jnp.inf),
        tdist[..., 0], tdist[..., -1])
    depth = jnp.where(acc < 0.6, 300.0, depth)
    rendering["rgb"] = rgb
    rendering["depth"] = depth
    rendering["acc"] = acc

    if compute_extras:
        if extras is not None:
            for k, v in extras.items():
                if v is not None:
                    rendering[k] = jnp.einsum("rs,crs->rc", weights, v)
        expectation = lambda x: (weights * x).sum(axis=-1) / jnp.maximum(
            acc, EPS)
        rendering["distance_mean"] = jnp.clip(
            jnp.nan_to_num(jnp.exp(expectation(jnp.log(t_mids))),
                           nan=jnp.inf),
            tdist[..., 0], tdist[..., -1])
        t_aug = jnp.concatenate([tdist, t_far], axis=-1)
        weights_aug = jnp.concatenate([weights, bg_w[:, None]], axis=-1)
        ps = [5, 50, 95]
        distance_percentiles = stepfun.weighted_percentile(t_aug, weights_aug,
                                                           ps)
        for i, p in enumerate(ps):
            s = "median" if p == 50 else "percentile_" + str(p)
            rendering["distance_" + s] = distance_percentiles[..., i]
    return rendering


def volumetric_rendering(rgbs, weights, tdist, bg_rgbs, t_far, compute_extras,
                         extras=None):
    """Alpha-composite colors/depth/acc along rays (render.py:177-244).

    Returns a dict with 'rgb' [..., 3], 'depth', 'acc', and (when
    compute_extras) distance statistics and composited extras.  Replicates the
    sky-depth clamp: rays with acc < 0.6 get depth = 300.
    """
    rendering = {}
    acc = weights.sum(axis=-1)
    bg_w = jnp.maximum(1 - acc[..., None], 0.0)
    rgb = (weights[..., None] * rgbs).sum(axis=-2) + bg_w * bg_rgbs
    t_mids = 0.5 * (tdist[..., :-1] + tdist[..., 1:])

    depth = jnp.clip(
        jnp.nan_to_num((weights * t_mids).sum(axis=-1) /
                       jnp.maximum(acc, EPS), nan=jnp.inf),
        tdist[..., 0], tdist[..., -1])
    depth = jnp.where(acc < 0.6, 300.0, depth)
    rendering["rgb"] = rgb
    rendering["depth"] = depth
    rendering["acc"] = acc

    if compute_extras:
        if extras is not None:
            for k, v in extras.items():
                if v is not None:
                    rendering[k] = (weights[..., None] * v).sum(axis=-2)

        expectation = lambda x: (weights * x).sum(axis=-1) / jnp.maximum(
            acc, EPS)
        rendering["distance_mean"] = jnp.clip(
            jnp.nan_to_num(jnp.exp(expectation(jnp.log(t_mids))), nan=jnp.inf),
            tdist[..., 0], tdist[..., -1])

        # Extra far fencepost so the weight vector sums to exactly 1.
        t_aug = jnp.concatenate([tdist, t_far], axis=-1)
        weights_aug = jnp.concatenate([weights, bg_w], axis=-1)
        ps = [5, 50, 95]
        distance_percentiles = stepfun.weighted_percentile(t_aug, weights_aug,
                                                           ps)
        for i, p in enumerate(ps):
            s = "median" if p == 50 else "percentile_" + str(p)
            rendering["distance_" + s] = distance_percentiles[..., i]

    return rendering
