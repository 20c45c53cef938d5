"""Volume rendering: alpha/transmittance/weights from per-sample density.

Reference: code/model/network.py:626-640 (volume_rendering) and the weight
sums at network.py:550-557,602-620.
"""

from __future__ import annotations

import jax.numpy as jnp


def volume_rendering_weights(z_vals: jnp.ndarray, density: jnp.ndarray) -> jnp.ndarray:
    """Compute rendering weights.

    z_vals:  (R, S) sorted sample depths.
    density: (R, S) per-sample density.
    Returns weights (R, S): alpha_i * T_i with a 1e10 tail interval so the
    last sample absorbs remaining transmittance (reference network.py:630-638).
    """
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1)
    free_energy = dists * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(free_energy[:, :1]), free_energy[:, :-1]], axis=-1
    )
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha * transmittance


def render_ray_outputs(
    weights: jnp.ndarray,
    z_vals: jnp.ndarray,
    rgb: jnp.ndarray,
    normals: jnp.ndarray,
    depth_scale: jnp.ndarray,
):
    """Weight-sum rgb/depth/normal maps.

    weights (R,S), z_vals (R,S), rgb (R,S,3), normals (R,S,3) already
    normalized, depth_scale (R,1) = z component of the unnormalized camera-ray
    direction so rendered distance becomes z-depth (reference network.py:552-557,602-605).
    """
    rgb_values = jnp.sum(weights[..., None] * rgb, axis=1)
    depth_values = jnp.sum(weights * z_vals, axis=1, keepdims=True) / (
        jnp.sum(weights, axis=1, keepdims=True) + 1e-8
    )
    depth_values = depth_scale * depth_values
    normal_map = jnp.sum(weights[..., None] * normals, axis=1)
    return rgb_values, depth_values, normal_map
