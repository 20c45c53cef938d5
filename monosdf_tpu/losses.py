"""MonoSDF loss stack.

Reference: code/model/loss.py — MonoSDFLoss (:180-311) with the MiDaS
scale/shift-invariant depth loss (:7-176). Pixel-batch mode (the fork's
training mode) — the multi-scale gradient-matching term is disabled in that
mode in the reference too (loss.py:167-168).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .ops.scale_shift import compute_scale_and_shift_1d


@dataclasses.dataclass(frozen=True)
class LossConfig:
    rgb_loss: str = "l1"  # 'l1' | 'mse'
    eikonal_weight: float = 0.05
    smooth_weight: float = 0.005
    depth_weight: float = 0.1
    normal_l1_weight: float = 0.05
    normal_cos_weight: float = 0.05
    if_gamma_loss: bool = False
    if_scale_invariant_depth: bool = True
    end_step: int = -1  # > 0 enables exp(-10*step/end_step) cue decay


def srgb_gamma(x: jnp.ndarray) -> jnp.ndarray:
    """Piecewise sRGB gamma curve (reference loss.py:209-215)."""
    x_safe = jnp.maximum(x, 1e-8)
    return jnp.where(
        x <= 0.0031308, 12.92 * x, 1.055 * jnp.power(x_safe, 1.0 / 2.4) - 0.055
    )


def rgb_loss_fn(rgb_values, rgb_gt, kind: str):
    diff = rgb_values - rgb_gt.reshape(-1, 3)
    if kind == "l1":
        return jnp.mean(jnp.abs(diff))
    return jnp.mean(diff**2)


def eikonal_loss_fn(grad_theta):
    """mean((|grad| - 1)^2) (reference loss.py:222-224)."""
    return jnp.mean((_safe_norm(grad_theta, keepdims=False) - 1.0) ** 2)


def smooth_loss_fn(grad_theta, grad_theta_nei):
    """Unisurf-style normal smoothness (reference loss.py:226-234)."""
    n1 = grad_theta / (_safe_norm(grad_theta) + 1e-5)
    n2 = grad_theta_nei / (_safe_norm(grad_theta_nei) + 1e-5)
    return jnp.mean(_safe_norm(n1 - n2, keepdims=False))


def depth_loss_fn(depth_pred, depth_gt, mask, scale_invariant: bool):
    """Scale/shift-invariant masked MSE over the ray batch
    (reference loss.py:236-243 + :29-49,75-86). The monocular cue is scaled by
    the reference's hard-coded ``*50 + 0.5``."""
    pred = depth_pred.reshape(1, -1)
    mask = mask.reshape(1, -1).astype(pred.dtype)
    if scale_invariant:
        target = (depth_gt * 50.0 + 0.5).reshape(1, -1)
        scale, shift = compute_scale_and_shift_1d(pred, target, mask)
        pred_ssi = scale.reshape(1, -1) * pred + shift.reshape(1, -1)
    else:
        target = depth_gt.reshape(1, -1)
        pred_ssi = pred
    M = jnp.sum(mask, axis=1)
    res = pred_ssi - target
    image_loss = jnp.sum(mask * res * res, axis=1)
    divisor = jnp.sum(2.0 * M)
    return jnp.where(divisor == 0, 0.0, jnp.sum(image_loss) / jnp.maximum(divisor, 1.0))


def _safe_norm(v, axis=-1, keepdims=True, eps=1e-24):
    """Norm with a finite gradient at v=0 (jnp.linalg.norm backward at zero is
    0/0=NaN; masked normal rows are exactly zero)."""
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=keepdims), eps))


def _normalize(v, eps=1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    return v / jnp.maximum(_safe_norm(v), eps)


def normal_loss_fn(normal_pred, normal_gt):
    """L1 + cosine on normalized normals (reference loss.py:245-250).
    The caller pre-multiplies normal_pred by the mask (reference loss.py:282),
    which zeroes gradients for masked rays."""
    normal_gt = _normalize(normal_gt)
    normal_pred = _normalize(normal_pred)
    l1 = jnp.mean(jnp.sum(jnp.abs(normal_pred - normal_gt), axis=-1))
    cos = jnp.mean(1.0 - jnp.sum(normal_pred * normal_gt, axis=-1))
    return l1, cos


def monosdf_loss(
    cfg: LossConfig,
    model_outputs: dict,
    ground_truth: dict,
    step: jnp.ndarray | int = 0,
) -> dict:
    """Full training loss (reference loss.py:252-311).

    ground_truth: rgb (R,3), depth (R,1), normal (R,3), mask (R,1).
    """
    rgb_gt = ground_truth["rgb"]
    depth_gt = ground_truth["depth"]
    normal_gt = ground_truth["normal"]

    depth_pred = model_outputs["depth_values"]
    normal_pred = model_outputs["normal_map"]

    if cfg.if_gamma_loss:
        rgb_loss = rgb_loss_fn(
            srgb_gamma(model_outputs["rgb_values"]), srgb_gamma(rgb_gt), cfg.rgb_loss
        )
    else:
        rgb_loss = rgb_loss_fn(model_outputs["rgb_values"], rgb_gt, cfg.rgb_loss)

    if "grad_theta" in model_outputs:
        eikonal_loss = eikonal_loss_fn(model_outputs["grad_theta"])
        smooth_loss = smooth_loss_fn(
            model_outputs["grad_theta"], model_outputs["grad_theta_nei"]
        )
    else:
        eikonal_loss = jnp.asarray(0.0)
        smooth_loss = jnp.asarray(0.0)

    # Foreground mask: GT mask AND the ray crosses the surface (per-ray SDF
    # changes sign along the samples) — reference loss.py:274-276.
    sdf = model_outputs["sdf"]
    crosses = jnp.any(sdf > 0.0, axis=-1) & jnp.any(sdf < 0.0, axis=-1)
    mask = (ground_truth["mask"].reshape(-1) > 0.5) & crosses
    mask_f = mask.astype(depth_pred.dtype)

    depth_loss = depth_loss_fn(
        depth_pred, depth_gt, mask_f, cfg.if_scale_invariant_depth
    )
    normal_l1, normal_cos = normal_loss_fn(
        normal_pred * mask_f[:, None], normal_gt.reshape(-1, 3)
    )

    if cfg.end_step > 0:
        decay = jnp.exp(-10.0 * jnp.asarray(step, jnp.float32) / cfg.end_step)
    else:
        decay = 1.0

    loss = (
        rgb_loss
        + cfg.eikonal_weight * eikonal_loss
        + cfg.smooth_weight * smooth_loss
        + decay * cfg.depth_weight * depth_loss
        + decay * cfg.normal_l1_weight * normal_l1
        + decay * cfg.normal_cos_weight * normal_cos
    )

    return {
        "loss": loss,
        "rgb_loss": rgb_loss,
        "eikonal_loss": eikonal_loss,
        "smooth_loss": smooth_loss,
        "depth_loss": depth_loss,
        "normal_l1": normal_l1,
        "normal_cos": normal_cos,
    }
