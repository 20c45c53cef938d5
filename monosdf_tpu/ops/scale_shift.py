"""Closed-form scale/shift least-squares solve (MiDaS-style).

Reference: code/model/loss.py:7-49. Solves min_{s,t} sum mask*(s*pred + t - target)^2
via the 2x2 normal equations.
"""

from __future__ import annotations

import jax.numpy as jnp


def _solve(a_00, a_01, a_11, b_0, b_1):
    det = a_00 * a_11 - a_01 * a_01
    valid = det != 0
    safe_det = jnp.where(valid, det, 1.0)
    x_0 = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 0.0)
    x_1 = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return x_0, x_1


def compute_scale_and_shift_1d(prediction, target, mask):
    """prediction/target/mask: (B, N). Returns scale (B,), shift (B,)
    (reference loss.py:29-49)."""
    a_00 = jnp.sum(mask * prediction * prediction, axis=1)
    a_01 = jnp.sum(mask * prediction, axis=1)
    a_11 = jnp.sum(mask, axis=1)
    b_0 = jnp.sum(mask * prediction * target, axis=1)
    b_1 = jnp.sum(mask * target, axis=1)
    return _solve(a_00, a_01, a_11, b_0, b_1)


def compute_scale_and_shift_2d(prediction, target, mask):
    """prediction/target/mask: (B, H, W). Returns scale (B,), shift (B,)
    (reference loss.py:7-27)."""
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))
    return _solve(a_00, a_01, a_11, b_0, b_1)
