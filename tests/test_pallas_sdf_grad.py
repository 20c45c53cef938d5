"""Parity tests for the Pallas hand-written SDF backward
(ops/pallas_sdf_grad.py) against the jnp reverse-over-forward path.

Runs in interpret mode on CPU (conftest forces the cpu platform); the real
Mosaic compile is exercised on-chip by bench/entry runs.
"""

import numpy as np
import pytest

import jax
from jax import flatten_util
import jax.numpy as jnp

from monosdf_tpu.models.fields import (
    ImplicitNetConfig,
    init_implicit_net,
    sdf_feat_grad,
    sdf_feat_grad_pallas,
    sdf_gradient,
    sdf_gradient_pallas,
)


def _cfg(skip=True, bounding=1.1):
    return ImplicitNetConfig(
        feature_vector_size=32,
        dims=(48, 48, 48, 48),
        skip_in=(2,) if skip else (),
        multires=4,
        sdf_bounding_sphere=bounding,
        inside_outside=True,
        bias=0.9,
    )


def _points(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1.0, 1.0, (n, 3)), jnp.float32)


class TestForwardParity:
    @pytest.mark.parametrize("skip", [True, False])
    @pytest.mark.parametrize("bounding", [1.1, 0.0])
    def test_outputs_match_jnp(self, skip, bounding):
        cfg = _cfg(skip, bounding)
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        x = _points()
        s1, f1, g1 = sdf_feat_grad(params, cfg, x)
        s2, f2, g2 = sdf_feat_grad_pallas(params, cfg, x)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)

    def test_unclamped_gradient_matches(self):
        cfg = _cfg()
        params = init_implicit_net(jax.random.PRNGKey(1), cfg)
        x = _points(40, seed=3)
        g1 = sdf_gradient(params, cfg, x)
        g2 = sdf_gradient_pallas(params, cfg, x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


class TestBackwardParity:
    """Parameter gradients through a loss that touches sdf, features AND the
    spatial gradient (the eikonal/normal-style second-order path)."""

    @pytest.mark.parametrize("skip", [True, False])
    def test_param_grads_match(self, skip):
        cfg = _cfg(skip)
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        x = _points(72, seed=1)
        tgt = jnp.asarray(
            np.random.default_rng(2).normal(size=(72, 3)), jnp.float32
        )

        def loss(p, impl):
            s, f, g = impl(p, cfg, x)
            eik = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
            return (
                jnp.mean(s**2)
                + 0.1 * jnp.mean((f - 0.3) ** 2)
                + 0.5 * eik
                + jnp.mean(jnp.abs(g - tgt))
            )

        g_jnp = jax.grad(loss)(params, sdf_feat_grad)
        g_pal = jax.grad(loss)(params, sdf_feat_grad_pallas)
        flat1, _ = flatten_util.ravel_pytree(g_jnp)
        flat2, _ = flatten_util.ravel_pytree(g_pal)
        np.testing.assert_allclose(
            np.asarray(flat1), np.asarray(flat2), atol=2e-4, rtol=1e-3
        )

    def test_eikonal_only_grads_match(self):
        cfg = _cfg()
        params = init_implicit_net(jax.random.PRNGKey(4), cfg)
        x = _points(48, seed=5)

        def loss(p, gradient_fn):
            g = gradient_fn(p, cfg, x)
            return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

        g_jnp = jax.grad(loss)(params, sdf_gradient)
        g_pal = jax.grad(loss)(params, sdf_gradient_pallas)
        flat1, _ = flatten_util.ravel_pytree(g_jnp)
        flat2, _ = flatten_util.ravel_pytree(g_pal)
        np.testing.assert_allclose(
            np.asarray(flat1), np.asarray(flat2), atol=2e-4, rtol=1e-3
        )

    def test_clamp_rows_split_population(self):
        """One kernel call serving clamped main rows + UNclamped appended
        rows (the folded eikonal batch) must match two separate calls, in
        values AND parameter gradients."""
        cfg = _cfg(bounding=0.9)  # small sphere so the clamp actually fires
        params = init_implicit_net(jax.random.PRNGKey(8), cfg)
        x_main = _points(48, seed=9) * 1.5  # some points outside the sphere
        x_eik = _points(24, seed=10) * 1.5
        x_all = jnp.concatenate([x_main, x_eik], axis=0)
        n = x_main.shape[0]

        def loss_folded(p):
            s, f, g = sdf_feat_grad_pallas(p, cfg, x_all, clamp_rows=n)
            ge = g[n:]
            return (
                jnp.mean(s[:n] ** 2)
                + jnp.mean(f[:n] ** 2)
                + jnp.mean(g[:n] ** 2)
                + jnp.mean((jnp.linalg.norm(ge, axis=-1) - 1.0) ** 2)
            )

        def loss_split(p):
            s, f, g = sdf_feat_grad_pallas(p, cfg, x_main)
            ge = sdf_gradient_pallas(p, cfg, x_eik)
            return (
                jnp.mean(s**2)
                + jnp.mean(f**2)
                + jnp.mean(g**2)
                + jnp.mean((jnp.linalg.norm(ge, axis=-1) - 1.0) ** 2)
            )

        v1, g1 = jax.value_and_grad(loss_folded)(params)
        v2, g2 = jax.value_and_grad(loss_split)(params)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        flat1, _ = flatten_util.ravel_pytree(g1)
        flat2, _ = flatten_util.ravel_pytree(g2)
        np.testing.assert_allclose(
            np.asarray(flat1), np.asarray(flat2), atol=1e-5, rtol=1e-4
        )

    def test_non_multiple_block_sizes(self):
        """N not a multiple of the kernel block: zero-padded rows must not
        pollute the weight gradients."""
        cfg = _cfg()
        params = init_implicit_net(jax.random.PRNGKey(6), cfg)
        x = _points(37, seed=7)

        def loss(p, impl):
            s, f, g = impl(p, cfg, x)
            return jnp.mean(s**2) + jnp.mean(g**2)

        g_jnp = jax.grad(loss)(params, sdf_feat_grad)
        g_pal = jax.grad(loss)(params, sdf_feat_grad_pallas)
        flat1, _ = flatten_util.ravel_pytree(g_jnp)
        flat2, _ = flatten_util.ravel_pytree(g_pal)
        np.testing.assert_allclose(
            np.asarray(flat1), np.asarray(flat2), atol=2e-4, rtol=1e-3
        )


class TestRenderIntegration:
    def test_render_rays_grads_match(self):
        from monosdf_tpu.losses import LossConfig, monosdf_loss
        from monosdf_tpu.models import MonoSDFConfig, init_monosdf, render_rays
        from monosdf_tpu.models.fields import RenderingNetConfig
        from monosdf_tpu.ops.sampler import SamplerConfig
        import dataclasses

        base = MonoSDFConfig(
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
        )
        pall = dataclasses.replace(base, diff_backend="pallas")
        params = init_monosdf(jax.random.PRNGKey(0), base)
        rng = np.random.default_rng(0)
        n = 16
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
            out = render_rays(p, cfg, rays, jax.random.PRNGKey(1), training=True)
            return monosdf_loss(lc, out, gt, 0)["loss"]

        (l1, g1) = jax.value_and_grad(loss_fn)(params, base)
        (l2, g2) = jax.value_and_grad(loss_fn)(params, pall)
        assert abs(float(l1) - float(l2)) < 1e-4
        f1, _ = flatten_util.ravel_pytree(g1)
        f2, _ = flatten_util.ravel_pytree(g2)
        np.testing.assert_allclose(
            np.asarray(f1), np.asarray(f2), atol=5e-4, rtol=2e-3
        )
