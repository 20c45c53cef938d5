"""Unit tests for the numerics core: PE, density, volume rendering,
scale/shift solve, geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosdf_tpu.ops import (
    positional_encoding,
    pe_dim,
    laplace_density,
    get_beta,
    volume_rendering_weights,
    compute_scale_and_shift_1d,
    compute_scale_and_shift_2d,
    get_camera_params,
    get_sphere_intersections,
    near_far_from_cube,
    load_K_Rt_from_P,
    quat_to_rot,
    rot_to_quat,
    chunked_apply,
)


class TestEmbedder:
    def test_dims(self):
        assert pe_dim(6, 3) == 3 * (1 + 12)
        x = jnp.ones((5, 3))
        assert positional_encoding(x, 6).shape == (5, 39)
        assert positional_encoding(x, 0).shape == (5, 3)

    def test_ordering_and_values(self):
        # layout: [x, sin(x*1), cos(x*1), sin(x*2), cos(x*2), ...]
        x = jnp.array([[0.3, -0.7, 1.1]])
        out = np.asarray(positional_encoding(x, 2))
        xn = np.array([0.3, -0.7, 1.1])
        expected = np.concatenate(
            [xn, np.sin(xn), np.cos(xn), np.sin(2 * xn), np.cos(2 * xn)]
        )
        np.testing.assert_allclose(out[0], expected, rtol=1e-6)


class TestDensity:
    def test_laplace_golden(self):
        beta = jnp.asarray(0.1)
        # At sdf=0: alpha * 0.5 = 5.0
        np.testing.assert_allclose(laplace_density(jnp.asarray(0.0), beta), 5.0)
        # Deep inside (sdf -> -inf): alpha = 10
        np.testing.assert_allclose(
            laplace_density(jnp.asarray(-10.0), beta), 10.0, rtol=1e-5
        )
        # Far outside: -> 0
        np.testing.assert_allclose(
            laplace_density(jnp.asarray(10.0), beta), 0.0, atol=1e-6
        )
        # Laplace CDF identity: density(s) = (1/b) * cdf_laplace(-s)
        s = 0.05
        expected = (1 / 0.1) * 0.5 * np.exp(-s / 0.1)
        np.testing.assert_allclose(
            laplace_density(jnp.asarray(s), beta), expected, rtol=1e-6
        )

    def test_get_beta(self):
        np.testing.assert_allclose(get_beta(jnp.asarray(-0.1), 1e-4), 0.1001)


class TestVolumeRendering:
    def test_opaque_wall(self):
        # Huge density at one sample -> weight concentrates there.
        z = jnp.linspace(0.0, 2.0, 8)[None]
        density = jnp.zeros((1, 8)).at[0, 4].set(1e8)
        w = volume_rendering_weights(z, density)
        assert w[0, 4] > 0.99
        np.testing.assert_allclose(np.asarray(w[0, :4]), 0.0, atol=1e-6)

    def test_manual_formula(self):
        z = jnp.array([[0.0, 1.0, 2.0]])
        d = jnp.array([[0.5, 1.0, 2.0]])
        w = volume_rendering_weights(z, d)
        dists = np.array([1.0, 1.0, 1e10])
        fe = dists * np.array([0.5, 1.0, 2.0])
        T = np.exp(-np.cumsum(np.concatenate([[0.0], fe[:-1]])))
        alpha = 1 - np.exp(-fe)
        np.testing.assert_allclose(np.asarray(w[0]), alpha * T, rtol=1e-6)

    def test_weights_sum_to_one_with_tail(self):
        z = jnp.linspace(0.1, 3.0, 16)[None]
        density = jnp.full((1, 16), 0.3)
        w = volume_rendering_weights(z, density)
        # 1e10 tail absorbs all remaining transmittance
        np.testing.assert_allclose(np.asarray(w.sum()), 1.0, rtol=1e-5)


class TestScaleShift:
    def test_exact_recovery(self):
        rng = np.random.default_rng(0)
        pred = rng.normal(size=(2, 100)).astype(np.float32)
        target = 2.5 * pred + 0.7
        mask = np.ones_like(pred)
        s, t = compute_scale_and_shift_1d(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(s), 2.5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(t), 0.7, rtol=1e-3)

    def test_masked(self):
        pred = np.array([[1.0, 2.0, 100.0]], dtype=np.float32)
        target = np.array([[3.0, 5.0, -1.0]], dtype=np.float32)
        mask = np.array([[1.0, 1.0, 0.0]], dtype=np.float32)
        s, t = compute_scale_and_shift_1d(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(s), 2.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(t), 1.0, rtol=1e-5)

    def test_degenerate_returns_zero(self):
        pred = jnp.zeros((1, 4))
        s, t = compute_scale_and_shift_2d(
            pred.reshape(1, 2, 2), pred.reshape(1, 2, 2), jnp.zeros((1, 2, 2))
        )
        assert float(s[0]) == 0.0 and float(t[0]) == 0.0


class TestGeometry:
    def test_load_K_Rt_roundtrip(self):
        # Build P = K [R | t] and check recovery.
        K = np.array([[500.0, 0.0, 320.0], [0.0, 480.0, 240.0], [0.0, 0.0, 1.0]])
        angle = 0.3
        R = np.array(
            [
                [np.cos(angle), -np.sin(angle), 0],
                [np.sin(angle), np.cos(angle), 0],
                [0, 0, 1.0],
            ]
        )
        C = np.array([0.5, -0.2, 2.0])  # camera center in world
        t = -R @ C
        P = K @ np.concatenate([R, t[:, None]], axis=1)
        intr, pose = load_K_Rt_from_P(P)
        np.testing.assert_allclose(intr[:3, :3], K, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pose[:3, :3], R.T, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(pose[:3, 3], C, rtol=1e-5, atol=1e-6)

    def test_camera_rays_center_pixel(self):
        # Ray through the principal point goes along camera z axis.
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 500.0, 500.0, 320.0, 240.0
        pose = np.eye(4, dtype=np.float32)
        uv = jnp.array([[[320.0, 240.0]]])
        dirs, loc = get_camera_params(uv, jnp.asarray(pose)[None], jnp.asarray(K)[None])
        np.testing.assert_allclose(np.asarray(dirs[0, 0]), [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(loc[0]), [0, 0, 0], atol=1e-6)

    def test_sphere_intersections(self):
        cam = jnp.array([[0.0, 0.0, -2.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        ints = get_sphere_intersections(cam, d, r=1.0)
        np.testing.assert_allclose(np.asarray(ints[0]), [1.0, 3.0], rtol=1e-6)

    def test_cube_near_far(self):
        o = jnp.array([[0.0, 0.0, -2.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        near, far = near_far_from_cube(o, d, bound=1.0, min_near=0.0, max_far=10.0)
        np.testing.assert_allclose(float(near[0, 0]), 1.0, rtol=1e-5)
        np.testing.assert_allclose(float(far[0, 0]), 3.0, rtol=1e-5)
        # miss case
        o2 = jnp.array([[5.0, 5.0, -2.0]])
        near2, far2 = near_far_from_cube(o2, d, bound=1.0, max_far=1e9)
        assert float(near2[0, 0]) >= 1e8

    def test_quat_roundtrip(self):
        q = jnp.array([[0.9, 0.1, -0.2, 0.3]])
        q = q / jnp.linalg.norm(q)
        R = quat_to_rot(q)
        q2 = rot_to_quat(R)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), rtol=1e-5, atol=1e-6)
        # R is a rotation
        np.testing.assert_allclose(
            np.asarray(R[0] @ R[0].T), np.eye(3), atol=1e-6
        )


class TestChunking:
    def test_matches_unchunked(self):
        x = jnp.arange(23.0).reshape(23, 1)
        fn = lambda a: {"y": a * 2.0, "z": a.sum(-1)}
        out = chunked_apply(fn, 23, 8, x)
        np.testing.assert_allclose(np.asarray(out["y"]), np.asarray(x) * 2.0)
        assert out["z"].shape == (23,)
