"""'Floaters no more' near-camera gradient down-scaling.

Identity in the forward pass; the backward pass multiplies the rgb/density
gradients by clamp(t_mean^2, 0, 1), suppressing updates from samples close to
the camera (reference ``train_utils.py:101-111``, applied at models.py:232-235
whenever brightness correction is enabled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def scale_gradients_by_distance(rgb, density, ray_dist):
    """Returns (rgb, density) unchanged; scales their cotangents by
    clamp(ray_dist^2, 0, 1) on the way back.

    Channel-major layout: rgb [3, *dims], density [*dims], ray_dist [*dims].
    """
    return rgb, density


def _fwd(rgb, density, ray_dist):
    return (rgb, density), ray_dist


def _bwd(ray_dist, cotangents):
    g_rgb, g_density = cotangents
    scaling = jnp.clip(jnp.square(ray_dist), 0.0, 1.0)
    return g_rgb * scaling[None], g_density * scaling, None


scale_gradients_by_distance.defvjp(_fwd, _bwd)
