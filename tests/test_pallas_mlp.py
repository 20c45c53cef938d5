"""Fused Pallas SDF-MLP parity tests (interpret mode on CPU; the same code
path compiles with Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monosdf_tpu.models.fields import (
    ImplicitNetConfig,
    implicit_apply,
    init_implicit_net,
    sdf_value,
    sdf_value_pallas,
)
from monosdf_tpu.ops.pallas_mlp import (
    effective_linear_weights,
    fused_sdf_mlp,
)
from monosdf_tpu.ops.embedder import positional_encoding


def _cfg(dims=(64, 64, 64, 64), skip=(2,), multires=6, sphere=1.1):
    return ImplicitNetConfig(
        feature_vector_size=63, dims=dims, skip_in=skip, multires=multires,
        sdf_bounding_sphere=sphere,
    )


class TestFusedMLP:
    def test_matches_jnp_path(self):
        cfg = _cfg()
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (300, 3)), jnp.float32
        )
        ref = implicit_apply(params, cfg, x)
        inp = positional_encoding(x, cfg.multires)
        ws, bs = effective_linear_weights(params, cfg.num_layers)
        out = fused_sdf_mlp(ws, bs, inp, cfg.skip_in)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_no_skip(self):
        cfg = _cfg(dims=(32, 32), skip=())
        params = init_implicit_net(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (65, 3)), jnp.float32
        )
        ref = implicit_apply(params, cfg, x)
        inp = positional_encoding(x, cfg.multires)
        ws, bs = effective_linear_weights(params, cfg.num_layers)
        out = fused_sdf_mlp(ws, bs, inp, cfg.skip_in)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_reference_shape_8x256(self):
        cfg = ImplicitNetConfig(
            feature_vector_size=256, dims=(256,) * 8, skip_in=(4,), multires=6,
            sdf_bounding_sphere=1.1,
        )
        params = init_implicit_net(jax.random.PRNGKey(2), cfg)
        x = jnp.asarray(
            np.random.default_rng(2).uniform(-1, 1, (128, 3)), jnp.float32
        )
        ref = sdf_value(params, cfg, x)
        out = sdf_value_pallas(params, cfg, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_sdf_value_pallas_clamps(self):
        cfg = _cfg(sphere=1.1)
        params = init_implicit_net(jax.random.PRNGKey(3), cfg)
        # far outside the bounding sphere, the sphere SDF clamp must bite
        x = jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32)
        ref = sdf_value(params, cfg, x)
        out = sdf_value_pallas(params, cfg, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_batched_leading_dims(self):
        cfg = _cfg()
        params = init_implicit_net(jax.random.PRNGKey(4), cfg)
        x = jnp.asarray(
            np.random.default_rng(4).uniform(-1, 1, (4, 17, 3)), jnp.float32
        )
        ref = sdf_value(params, cfg, x)
        out = sdf_value_pallas(params, cfg, x)
        assert out.shape == ref.shape == (4, 17, 1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestSamplerBackend:
    def test_render_rays_pallas_sampler_close(self):
        from monosdf_tpu.models import MonoSDFConfig, init_monosdf, render_rays
        from monosdf_tpu.models.fields import RenderingNetConfig
        from monosdf_tpu.ops.sampler import SamplerConfig

        base = dict(
            implicit=_cfg(dims=(32, 32), skip=(), multires=4),
            rendering=RenderingNetConfig(
                feature_vector_size=63, dims=(32, 32), multires_view=2
            ),
            sampler=SamplerConfig(
                scene_bounding_sphere=1.1, N_samples=8, N_samples_eval=16,
                N_samples_extra=4, max_total_iters=2,
            ),
            scene_bounding_sphere=1.1,
        )
        cfg_j = MonoSDFConfig(**base, sampler_backend="jnp")
        cfg_p = MonoSDFConfig(**base, sampler_backend="pallas")
        params = init_monosdf(jax.random.PRNGKey(0), cfg_j)
        n = 8
        rng = np.random.default_rng(0)
        d = rng.normal(size=(n, 3))
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = {
            "rays_o": jnp.asarray(np.tile([[0, 0, -1.5]], (n, 1)), jnp.float32),
            "rays_d": jnp.asarray(d, jnp.float32),
            "depth_scale": jnp.ones((n, 1), jnp.float32),
            "pose": jnp.tile(jnp.eye(4)[None], (n, 1, 1)),
        }
        oj = render_rays(params, cfg_j, rays, jax.random.PRNGKey(1), training=False)
        op = render_rays(params, cfg_p, rays, jax.random.PRNGKey(1), training=False)
        np.testing.assert_allclose(
            np.asarray(oj["rgb_values"]), np.asarray(op["rgb_values"]), atol=1e-4
        )
