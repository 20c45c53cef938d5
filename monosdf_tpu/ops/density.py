"""SDF -> density transforms (VolSDF).

Reference: code/model/density.py:16-47.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_beta(beta_param: jnp.ndarray, beta_min: float = 1e-4) -> jnp.ndarray:
    """Learnable beta with a floor: |beta| + beta_min (reference density.py:28-30)."""
    return jnp.abs(beta_param) + beta_min


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """alpha * Laplace(0, beta).cdf(-sdf) with alpha = 1/beta.

    = (1/beta) * (0.5 + 0.5*sign(sdf)*expm1(-|sdf|/beta))
    (reference density.py:21-26). Positive SDF (outside) -> small density,
    negative (inside) -> ~alpha.
    """
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def abs_density(sdf: jnp.ndarray) -> jnp.ndarray:
    """NeRF++-style |sdf| density (reference density.py:33-35)."""
    return jnp.abs(sdf)


def simple_density(sdf: jnp.ndarray, noise: jnp.ndarray | None = None) -> jnp.ndarray:
    """NeRF-style relu density with optional pre-activation noise
    (reference density.py:38-47)."""
    if noise is not None:
        sdf = sdf + noise
    return jnp.maximum(sdf, 0.0)
