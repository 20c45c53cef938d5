"""Mixed-precision (bf16 matmul / f32 accumulate) numerics tests."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monosdf_tpu.losses import LossConfig, monosdf_loss
from monosdf_tpu.models import MonoSDFConfig, init_monosdf, render_rays
from monosdf_tpu.models.fields import (
    ImplicitNetConfig,
    RenderingNetConfig,
    sdf_feat_grad,
    init_implicit_net,
)
from monosdf_tpu.ops.sampler import SamplerConfig


def _small_cfg(mp: bool):
    return MonoSDFConfig(
        implicit=ImplicitNetConfig(
            feature_vector_size=32, dims=(32, 32, 32, 32), skip_in=(2,),
            multires=4, sdf_bounding_sphere=1.1,
        ),
        rendering=RenderingNetConfig(
            feature_vector_size=32, dims=(32, 32), multires_view=2
        ),
        sampler=SamplerConfig(
            scene_bounding_sphere=1.1, N_samples=16, N_samples_eval=24,
            N_samples_extra=8, max_total_iters=2,
        ),
        scene_bounding_sphere=1.1,
        compute_dtype="bfloat16",
        mixed_precision=mp,
    )


def _rays(n=32, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(np.tile([[0.0, 0.0, -1.5]], (n, 1)), jnp.float32),
        "rays_d": jnp.asarray(d, jnp.float32),
        "depth_scale": jnp.ones((n, 1), jnp.float32),
        "pose": jnp.tile(jnp.eye(4)[None], (n, 1, 1)),
    }


class TestMixedPrecision:
    def test_forward_close_to_f32(self):
        cfg32, cfg16 = _small_cfg(False), _small_cfg(True)
        params = init_monosdf(jax.random.PRNGKey(0), cfg32)
        rays = _rays()
        o32 = render_rays(params, cfg32, rays, jax.random.PRNGKey(1), training=False)
        o16 = render_rays(params, cfg16, rays, jax.random.PRNGKey(1), training=False)
        assert o16["rgb_values"].dtype == jnp.float32  # outputs stay f32
        # bf16 matmuls: agreement to bf16-level tolerance
        np.testing.assert_allclose(
            np.asarray(o32["rgb_values"]), np.asarray(o16["rgb_values"]),
            atol=0.05,
        )

    def test_gradients_close_and_finite(self):
        cfg32, cfg16 = _small_cfg(False), _small_cfg(True)
        params = init_monosdf(jax.random.PRNGKey(0), cfg32)
        rays = _rays()
        gt = {
            "rgb": jnp.full((32, 3), 0.5),
            "depth": jnp.full((32, 1), 0.4),
            "normal": jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (32, 1)),
            "mask": jnp.ones((32, 1)),
        }
        lc = LossConfig()

        def loss_fn(p, cfg):
            out = render_rays(p, cfg, rays, jax.random.PRNGKey(1), training=True)
            return monosdf_loss(lc, out, gt, 0)["loss"]

        g32 = jax.grad(loss_fn)(params, cfg32)
        g16 = jax.grad(loss_fn)(params, cfg16)
        flat32 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g32)])
        flat16 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g16)])
        assert jnp.isfinite(flat16).all()
        # gradient direction agreement (cosine) — bf16 noise but same descent
        cos = jnp.dot(flat32, flat16) / (
            jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12
        )
        assert float(cos) > 0.98

    def test_sdf_grad_dtype_stays_f32(self):
        cfg = ImplicitNetConfig(
            feature_vector_size=16, dims=(16, 16), multires=2,
            sdf_bounding_sphere=0.0,
        )
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 3)), jnp.float32)
        sdf, feat, grad = sdf_feat_grad(params, cfg, x, dtype=jnp.bfloat16)
        assert sdf.dtype == jnp.float32
        assert grad.dtype == jnp.float32
        # against the f32 path
        sdf32, _, grad32 = sdf_feat_grad(params, cfg, x)
        np.testing.assert_allclose(np.asarray(sdf), np.asarray(sdf32), atol=0.02)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(grad32), atol=0.05)
