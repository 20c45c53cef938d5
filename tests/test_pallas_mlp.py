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


class TestGridSweepKernel:
    """sampler_backend='pallas' in GRID mode (sdf_value_pallas_grid): the
    hash encode stays XLA-side (probe waves 7/8 closed every in-kernel
    gather), the 2x256 trunk runs as one VMEM-resident kernel."""

    def _setup(self):
        from monosdf_tpu.ops.hashgrid import HashGridConfig, with_table_cache

        grid = HashGridConfig(
            num_levels=4, level_dim=2, base_resolution=16,
            log2_hashmap_size=12, desired_resolution=64, hash_scheme="add",
            layout="quad", scatter_impl="fold", sweep_oct_levels=2,
        )
        cfg = ImplicitNetConfig(
            feature_vector_size=16, dims=(32, 32), multires=6,
            inside_outside=False, bias=0.5, sdf_bounding_sphere=0.0,
            use_grid=True, grid=grid, divide_factor=1.1,
        )
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        params = {
            **params, "encoding": with_table_cache(params["encoding"], grid)
        }
        x = jax.random.uniform(
            jax.random.PRNGKey(1), (130, 3), minval=-1, maxval=1
        )
        return cfg, params, x

    def test_matches_jnp_f32(self):
        from monosdf_tpu.models.fields import sdf_value_pallas_grid

        cfg, params, x = self._setup()
        for ml in (None, 2):
            ref = sdf_value(params, cfg, x, max_level=ml)
            out = sdf_value_pallas_grid(params, cfg, x, max_level=ml)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5
            )

    def test_matches_jnp_bf16_band(self):
        """bf16 sweeps: same rounding-order deviation class as the shipped
        MLP-mode kernel (sweeps only place samples; no gradients flow)."""
        from monosdf_tpu.models.fields import sdf_value_pallas_grid

        cfg, params, x = self._setup()
        ref = sdf_value(params, cfg, x, dtype="bfloat16", max_level=2)
        out = sdf_value_pallas_grid(
            params, cfg, x, dtype="bfloat16", max_level=2
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.03)

    def test_step_runs_with_grid_pallas_sweeps(self):
        import numpy as _np

        from monosdf_tpu.data import (
            make_synthetic_sphere_scene, sample_ray_batch,
        )
        from monosdf_tpu.losses import LossConfig
        from monosdf_tpu.models import MonoSDFConfig, init_monosdf
        from monosdf_tpu.models.fields import RenderingNetConfig
        from monosdf_tpu.ops.hashgrid import HashGridConfig
        from monosdf_tpu.ops.sampler import SamplerConfig
        from monosdf_tpu.train import (
            OptimConfig, init_train_state, make_optimizer, make_train_step,
        )

        cfg = MonoSDFConfig(
            implicit=ImplicitNetConfig(
                feature_vector_size=16, dims=(32, 32), multires=6,
                inside_outside=False, bias=0.5, sdf_bounding_sphere=0.0,
                use_grid=True,
                grid=HashGridConfig(
                    num_levels=4, level_dim=2, base_resolution=16,
                    log2_hashmap_size=12, desired_resolution=64,
                    hash_scheme="add", layout="quad", scatter_impl="fold",
                    sweep_oct_levels=2,
                ),
            ),
            rendering=RenderingNetConfig(
                feature_vector_size=16, dims=(32, 32), multires_view=4
            ),
            sampler=SamplerConfig(
                N_samples=8, N_samples_eval=16, N_samples_extra=4,
                max_total_iters=2, intersection="cube",
            ),
            scene_bounding_sphere=1.1,
            sweep_max_level=2,
            sampler_backend="pallas",
        )
        params = init_monosdf(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(OptimConfig(decay_steps=1000, grid_mode=True))
        state = init_train_state(params, opt)
        step = jax.jit(make_train_step(cfg, LossConfig(), opt))
        scene = make_synthetic_sphere_scene(n_images=2, img_res=8)
        batch = jax.tree_util.tree_map(
            jnp.asarray, sample_ray_batch(scene, _np.random.default_rng(0), 16)
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert _np.isfinite(float(metrics["loss"]))
