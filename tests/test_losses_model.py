"""Tests for the loss stack and the end-to-end MonoSDF forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosdf_tpu.losses import (
    LossConfig,
    monosdf_loss,
    srgb_gamma,
    eikonal_loss_fn,
    smooth_loss_fn,
    depth_loss_fn,
    normal_loss_fn,
)
from monosdf_tpu.models import MonoSDFConfig, init_monosdf, render_rays, rays_from_camera
from monosdf_tpu.models.fields import ImplicitNetConfig, RenderingNetConfig
from monosdf_tpu.ops.sampler import SamplerConfig


def tiny_cfg(**kw):
    return MonoSDFConfig(
        implicit=ImplicitNetConfig(
            feature_vector_size=16, dims=(32, 32), multires=6, inside_outside=True
        ),
        rendering=RenderingNetConfig(
            feature_vector_size=16, dims=(32, 32), multires_view=4
        ),
        sampler=SamplerConfig(
            N_samples=16, N_samples_eval=32, N_samples_extra=8,
            max_total_iters=2, intersection="cube",
        ),
        **kw,
    )


def make_rays(n=8):
    o = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    pose = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
    return {
        "rays_o": o, "rays_d": d,
        "depth_scale": jnp.ones((n, 1)), "pose": pose,
    }


class TestLosses:
    def test_gamma_golden(self):
        x = jnp.array([0.001, 0.5])
        out = np.asarray(srgb_gamma(x))
        np.testing.assert_allclose(out[0], 12.92 * 0.001, rtol=1e-6)
        np.testing.assert_allclose(out[1], 1.055 * 0.5 ** (1 / 2.4) - 0.055, rtol=1e-5)

    def test_eikonal_golden(self):
        g = jnp.array([[2.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        np.testing.assert_allclose(float(eikonal_loss_fn(g)), 0.5, rtol=1e-6)

    def test_smooth_zero_for_parallel(self):
        g = jnp.array([[0.0, 0.0, 2.0]])
        np.testing.assert_allclose(
            float(smooth_loss_fn(g, g * 3.0)), 0.0, atol=1e-4
        )

    def test_depth_scale_invariance(self):
        rng = np.random.default_rng(0)
        gt = jnp.asarray(rng.uniform(0.1, 1.0, (64, 1)).astype(np.float32))
        # pred is an affine transform of (gt*50+0.5): loss ~ 0
        pred = 3.0 * (gt * 50 + 0.5) + 1.7
        mask = jnp.ones((64, 1))
        loss = float(depth_loss_fn(pred, gt, mask, True))
        assert loss < 1e-6

    def test_normal_loss_perfect(self):
        n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
        l1, cos = normal_loss_fn(n * 2.0, n * 0.5)
        assert float(l1) < 1e-6 and float(cos) < 1e-6

    def test_full_loss_dict(self):
        R, S = 16, 8
        outputs = {
            "rgb_values": jnp.full((R, 3), 0.5),
            "depth_values": jnp.full((R, 1), 1.0),
            "normal_map": jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1)),
            "sdf": jnp.concatenate(
                [jnp.ones((R, S // 2)), -jnp.ones((R, S // 2))], axis=-1
            ),
            "grad_theta": jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (R, 1)),
            "grad_theta_nei": jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (R, 1)),
        }
        gt = {
            "rgb": jnp.full((R, 3), 0.6),
            "depth": jnp.full((R, 1), 0.01),
            "normal": jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (R, 1)),
            "mask": jnp.ones((R, 1)),
        }
        out = monosdf_loss(LossConfig(), outputs, gt, step=0)
        for k in ["loss", "rgb_loss", "eikonal_loss", "smooth_loss",
                  "depth_loss", "normal_l1", "normal_cos"]:
            assert k in out and np.isfinite(float(out[k])), k
        np.testing.assert_allclose(float(out["rgb_loss"]), 0.1, rtol=1e-5)

    def test_decay(self):
        cfg = LossConfig(end_step=100)
        outputs = {
            "rgb_values": jnp.zeros((4, 3)),
            "depth_values": jnp.ones((4, 1)),
            "normal_map": jnp.ones((4, 3)),
            "sdf": jnp.ones((4, 4)),
            "grad_theta": jnp.ones((4, 3)),
            "grad_theta_nei": jnp.ones((4, 3)),
        }
        gt = {
            "rgb": jnp.zeros((4, 3)),
            "depth": jnp.ones((4, 1)),
            "normal": jnp.ones((4, 3)),
            "mask": jnp.ones((4, 1)),
        }
        l0 = monosdf_loss(cfg, outputs, gt, step=0)
        l1 = monosdf_loss(cfg, outputs, gt, step=100)
        # depth/normal terms decay by e^-10
        assert float(l1["loss"]) <= float(l0["loss"])


class TestMonoSDFForward:
    def test_render_shapes_and_finite(self):
        cfg = tiny_cfg()
        params = init_monosdf(jax.random.PRNGKey(0), cfg)
        rays = make_rays(8)
        out = render_rays(params, cfg, rays, jax.random.PRNGKey(1), training=True)
        S = cfg.sampler.total_samples
        assert out["rgb_values"].shape == (8, 3)
        assert out["depth_values"].shape == (8, 1)
        assert out["normal_map"].shape == (8, 3)
        assert out["z_vals"].shape == (8, S)
        assert out["sdf"].shape == (8, S)
        assert out["weights"].shape == (8, S)
        assert out["grad_theta"].shape == (16, 3)  # 2*R
        assert out["grad_theta_nei"].shape == (16, 3)
        for k, v in out.items():
            assert bool(jnp.all(jnp.isfinite(v))), f"{k} has non-finite values"

    def test_eval_mode_no_eik(self):
        cfg = tiny_cfg()
        params = init_monosdf(jax.random.PRNGKey(0), cfg)
        out = render_rays(params, cfg, make_rays(4), jax.random.PRNGKey(1), training=False)
        assert "grad_theta" not in out

    def test_white_bkgd(self):
        cfg = tiny_cfg(white_bkgd=True)
        # white_bkgd disables the sphere clamp in the reference (network.py:490)
        object.__setattr__  # (frozen dataclass; construct fresh instead)
        cfg = MonoSDFConfig(
            implicit=ImplicitNetConfig(
                feature_vector_size=16, dims=(32, 32), multires=6,
                sdf_bounding_sphere=0.0, inside_outside=False,
            ),
            rendering=cfg.rendering, sampler=cfg.sampler, white_bkgd=True,
        )
        params = init_monosdf(jax.random.PRNGKey(0), cfg)
        out = render_rays(params, cfg, make_rays(4), jax.random.PRNGKey(1), training=False)
        assert bool(jnp.all(jnp.isfinite(out["rgb_values"])))

    def test_end_to_end_gradients(self):
        cfg = tiny_cfg()
        params = init_monosdf(jax.random.PRNGKey(0), cfg)
        rays = make_rays(8)
        gt = {
            "rgb": jnp.full((8, 3), 0.5),
            "depth": jnp.full((8, 1), 0.02),
            "normal": jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1)),
            "mask": jnp.ones((8, 1)),
        }

        def loss_fn(p):
            out = render_rays(p, cfg, rays, jax.random.PRNGKey(1), training=True)
            return monosdf_loss(LossConfig(), out, gt)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        leaves, _ = jax.tree_util.tree_flatten(grads)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        # beta (density) must receive gradient through volume rendering
        assert abs(float(grads["density"]["beta"])) > 0

    def test_rays_from_camera(self):
        K = jnp.asarray(np.array([
            [100.0, 0, 32, 0], [0, 100.0, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]
        ], dtype=np.float32))[None]
        pose = jnp.eye(4)[None]
        uv = jnp.array([[[32.0, 32.0], [0.0, 0.0]]])
        rays = rays_from_camera(uv, pose, K)
        assert rays["rays_o"].shape == (2, 3)
        np.testing.assert_allclose(np.asarray(rays["rays_d"][0]), [0, 0, 1], atol=1e-6)
        # center pixel: depth_scale = 1 (ray along z)
        np.testing.assert_allclose(float(rays["depth_scale"][0, 0]), 1.0, atol=1e-6)
        assert float(rays["depth_scale"][1, 0]) < 1.0
