"""Parity tests for the Pallas radiance-MLP VJP (ops/pallas_rgb_grad.py)
against the jnp rendering_apply path: forward, weight grads, and the INPUT
cotangent (normals / features / per-image codes).

Runs in interpret mode on CPU (conftest forces the cpu platform); the real
Mosaic compile is exercised on-chip by bench runs.
"""

import numpy as np
import pytest

import jax
from jax import flatten_util
import jax.numpy as jnp

from monosdf_tpu.models.fields import (
    RenderingNetConfig,
    init_rendering_net,
    rendering_apply,
    rendering_apply_pallas,
)


def _cfg(**kw):
    base = dict(
        feature_vector_size=32, dims=(48, 48), multires_view=2,
        d_in=9, d_out=3,
    )
    base.update(kw)
    return RenderingNetConfig(**base)


def _inputs(n=70, feat=32, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    nrm = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    f = jnp.asarray(rng.normal(size=(n, feat)) * 0.3, jnp.float32)
    return pts, nrm, jnp.asarray(dirs, jnp.float32), f


class TestForwardParity:
    @pytest.mark.parametrize("mode", ["idr", "nerf"])
    @pytest.mark.parametrize("hdr", [False, True])
    def test_rgb_matches(self, mode, hdr):
        # nerf mode's input is [view, feat] only -> d_in counts just the dirs
        cfg = _cfg(mode=mode, if_hdr=hdr, d_in=9 if mode == "idr" else 3)
        params = init_rendering_net(jax.random.PRNGKey(0), cfg)
        pts, nrm, dirs, f = _inputs()
        r1 = rendering_apply(params, cfg, pts, nrm, dirs, f)["rgb"]
        r2 = rendering_apply_pallas(params, cfg, pts, nrm, dirs, f)["rgb"]
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    def test_per_image_code(self):
        cfg = _cfg(per_image_code=True, code_dim=16, max_images=4)
        params = init_rendering_net(jax.random.PRNGKey(1), cfg)
        pts, nrm, dirs, f = _inputs()
        code = jnp.tile(params["embeddings"][1][None], (pts.shape[0], 1))
        r1 = rendering_apply(params, cfg, pts, nrm, dirs, f, code)["rgb"]
        r2 = rendering_apply_pallas(params, cfg, pts, nrm, dirs, f, code)["rgb"]
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


class TestBackwardParity:
    def test_weight_and_input_grads(self):
        cfg = _cfg()
        params = init_rendering_net(jax.random.PRNGKey(0), cfg)
        pts, nrm, dirs, f = _inputs(n=53, seed=2)
        tgt = jnp.asarray(np.random.default_rng(3).uniform(size=(53, 3)),
                          jnp.float32)

        def loss(p, nrm_, f_, impl):
            rgb = impl(p, cfg, pts, nrm_, dirs, f_)["rgb"]
            return jnp.mean(jnp.abs(rgb - tgt))

        g1 = jax.grad(loss, argnums=(0, 1, 2))(
            params, nrm, f, rendering_apply
        )
        g2 = jax.grad(loss, argnums=(0, 1, 2))(
            params, nrm, f, rendering_apply_pallas
        )
        for a, b in zip(g1, g2):
            fa, _ = flatten_util.ravel_pytree(a)
            fb, _ = flatten_util.ravel_pytree(b)
            np.testing.assert_allclose(
                np.asarray(fa), np.asarray(fb), atol=2e-5, rtol=1e-4
            )

    def test_bf16_mixed_precision_close(self):
        cfg = _cfg()
        params = init_rendering_net(jax.random.PRNGKey(4), cfg)
        pts, nrm, dirs, f = _inputs(n=64, seed=5)

        def loss(p, impl):
            rgb = impl(p, cfg, pts, nrm, dirs, f, dtype=jnp.bfloat16)["rgb"]
            return jnp.mean(rgb**2)

        r1 = rendering_apply(params, cfg, pts, nrm, dirs, f,
                             dtype=jnp.bfloat16)["rgb"]
        r2 = rendering_apply_pallas(params, cfg, pts, nrm, dirs, f,
                                    dtype=jnp.bfloat16)["rgb"]
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                                   atol=2e-3, rtol=2e-2)
        g1 = jax.grad(lambda p: loss(p, rendering_apply))(params)
        g2 = jax.grad(lambda p: loss(p, rendering_apply_pallas))(params)
        f1, _ = flatten_util.ravel_pytree(g1)
        f2, _ = flatten_util.ravel_pytree(g2)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                                   atol=5e-4, rtol=5e-2)


class TestRenderIntegration:
    rgb_backend = "pallas"

    def test_full_model_grads_match(self):
        """render_rays + loss param grads: jnp vs full-pallas diff path with
        per-image codes (the code embedding gradient flows through dh0)."""
        import dataclasses

        from monosdf_tpu.losses import LossConfig, monosdf_loss
        from monosdf_tpu.models import MonoSDFConfig, init_monosdf, render_rays
        from monosdf_tpu.models.fields import ImplicitNetConfig
        from monosdf_tpu.ops.sampler import SamplerConfig

        base = MonoSDFConfig(
            implicit=ImplicitNetConfig(
                feature_vector_size=32, dims=(32, 32, 32, 32), skip_in=(2,),
                multires=4, sdf_bounding_sphere=1.1,
            ),
            rendering=RenderingNetConfig(
                feature_vector_size=32, dims=(32, 32), multires_view=2,
                per_image_code=True, code_dim=8, max_images=4,
            ),
            sampler=SamplerConfig(
                scene_bounding_sphere=1.1, N_samples=16, N_samples_eval=24,
                N_samples_extra=8, max_total_iters=2,
            ),
            scene_bounding_sphere=1.1,
        )
        pall = dataclasses.replace(
            base, diff_backend="pallas", rgb_backend=self.rgb_backend
        )
        params = init_monosdf(jax.random.PRNGKey(0), base)
        rng = np.random.default_rng(0)
        n = 12
        d = rng.normal(size=(n, 3))
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = {
            "rays_o": jnp.asarray(np.tile([[0.0, 0.0, -1.5]], (n, 1)), jnp.float32),
            "rays_d": jnp.asarray(d, jnp.float32),
            "depth_scale": jnp.ones((n, 1), jnp.float32),
            "pose": jnp.tile(jnp.eye(4)[None], (n, 1, 1)),
        }
        gt = {
            "rgb": jnp.full((n, 3), 0.5),
            "depth": jnp.full((n, 1), 0.4),
            "normal": jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1)),
            "mask": jnp.ones((n, 1)),
        }
        lc = LossConfig()

        def loss_fn(p, cfg):
            code = jnp.tile(p["rendering"]["embeddings"][0][None], (n, 1))
            out = render_rays(p, cfg, rays, jax.random.PRNGKey(1),
                              training=True, image_code=code)
            return monosdf_loss(lc, out, gt, 0)["loss"]

        l1, g1 = jax.value_and_grad(loss_fn)(params, base)
        l2, g2 = jax.value_and_grad(loss_fn)(params, pall)
        assert abs(float(l1) - float(l2)) < 1e-4
        f1, _ = flatten_util.ravel_pytree(g1)
        f2, _ = flatten_util.ravel_pytree(g2)
        np.testing.assert_allclose(
            np.asarray(f1), np.asarray(f2), atol=5e-4, rtol=2e-3
        )


class TestRenderIntegrationFused(TestRenderIntegration):
    """Same full-model parity but through the wide-I/O 'fused' path: the SDF
    kernel's raw (N, 128) gradient block feeds radiance_norm, which
    normalizes in-kernel and routes the summed normal cotangents straight
    back (rgb_backend='fused')."""

    rgb_backend = "fused"
