"""Tests for the uniform + error-bounded ray samplers."""

import numpy as np
import jax
import jax.numpy as jnp

from monosdf_tpu.ops.sampler import (
    SamplerConfig,
    uniform_z_vals,
    error_bound_z_vals,
    _sample_pdf,
    _d_star,
)


def sphere_sdf(pts, r=0.5):
    return jnp.linalg.norm(pts, axis=-1) - r


class TestUniform:
    def test_eval_linspace(self):
        cfg = SamplerConfig(scene_bounding_sphere=1.0, intersection="none", far=4.0)
        o = jnp.zeros((3, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
        z, near, far = uniform_z_vals(o, d, cfg, 16, None, training=False)
        np.testing.assert_allclose(np.asarray(z[0]), np.linspace(0, 4, 16), rtol=1e-6)

    def test_train_stratified_in_range(self):
        cfg = SamplerConfig(scene_bounding_sphere=1.0, intersection="cube")
        o = jnp.array([[0.0, 0.0, -2.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        z, near, far = uniform_z_vals(o, d, cfg, 32, jax.random.PRNGKey(0), training=True)
        z = np.asarray(z[0])
        assert (np.diff(z) > -1e-6).all()
        assert z.min() >= 0.0 and z.max() <= float(far[0, 0]) + 1e-5
        # cube intersection far: exits cube at z=3
        np.testing.assert_allclose(float(far[0, 0]), 3.0, rtol=1e-5)


class TestSamplePdf:
    def test_concentrates_on_peak(self):
        bins = jnp.linspace(0, 1, 11)[None]
        pdf = jnp.zeros((1, 10)).at[0, 5].set(1.0) + 1e-8
        u = jnp.linspace(0.01, 0.99, 64)[None]
        s = np.asarray(_sample_pdf(bins, pdf, u)[0])
        assert (s >= 0.5 - 1e-3).all() and (s <= 0.6 + 1e-3).all()

    def test_uniform_pdf_is_identity(self):
        bins = jnp.linspace(0, 1, 11)[None]
        pdf = jnp.ones((1, 10))
        u = jnp.linspace(0.0, 1.0, 21)[None]
        s = np.asarray(_sample_pdf(bins, pdf, u)[0])
        np.testing.assert_allclose(s, np.linspace(0, 1, 21), atol=1e-5)


class TestDStar:
    def test_far_interval_uses_triangle_bound(self):
        # Two samples, both outside the surface with the same sign:
        # d* should be positive (bounded by min distance).
        z = jnp.array([[0.0, 1.0]])
        d = jnp.array([[2.0, 2.0]])  # sdf 2 at both ends, 1 apart
        ds = np.asarray(_d_star(z, d))
        assert ds.shape == (1, 1)
        assert 1.5 < ds[0, 0] <= 2.0  # heron height of isoceles triangle

    def test_sign_change_zeroes(self):
        z = jnp.array([[0.0, 1.0]])
        d = jnp.array([[0.5, -0.5]])
        ds = np.asarray(_d_star(z, d))
        assert ds[0, 0] == 0.0

    def test_degenerate_triangle(self):
        # b + c - a <= 0 (surface reachable inside interval): d* = 0
        z = jnp.array([[0.0, 2.0]])
        d = jnp.array([[0.5, 0.5]])
        ds = np.asarray(_d_star(z, d))
        assert ds[0, 0] == 0.0


class TestErrorBound:
    def _rays(self, n=16):
        key = jax.random.PRNGKey(0)
        # cameras on a shell, looking at origin
        o = jnp.tile(jnp.array([[0.0, 0.0, -1.05]]), (n, 1))
        target = jax.random.normal(key, (n, 3)) * 0.05
        d = target - o
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return o, d

    def test_shapes_and_sorted(self):
        cfg = SamplerConfig(
            scene_bounding_sphere=1.1, N_samples=64, N_samples_eval=128,
            N_samples_extra=32, max_total_iters=5, intersection="cube",
        )
        o, d = self._rays(8)
        z, z_eik = error_bound_z_vals(
            sphere_sdf, o, d, jnp.asarray(0.01), cfg, jax.random.PRNGKey(1), True
        )
        assert z.shape == (8, cfg.total_samples) == (8, 98)
        assert z_eik.shape == (8, 1)
        zn = np.asarray(z)
        assert (np.diff(zn, axis=-1) >= -1e-6).all(), "z_vals must be sorted"
        assert np.isfinite(zn).all()

    def test_concentrates_near_surface(self):
        """With a small beta, final samples should cluster near the sphere
        surface crossing (|sdf| small)."""
        cfg = SamplerConfig(
            scene_bounding_sphere=1.1, N_samples=64, N_samples_eval=128,
            N_samples_extra=0, max_total_iters=5, intersection="cube",
        )
        o, d = self._rays(4)
        z, _ = error_bound_z_vals(
            sphere_sdf, o, d, jnp.asarray(0.003), cfg, jax.random.PRNGKey(1), False
        )
        pts = o[:, None, :] + z[..., None] * d[:, None, :]
        sdf = np.asarray(sphere_sdf(pts))
        # At least half the samples within 0.1 of the surface
        frac_near = (np.abs(sdf) < 0.1).mean()
        assert frac_near > 0.5, f"only {frac_near:.2f} of samples near surface"

    def test_stop_gradient(self):
        cfg = SamplerConfig(N_samples=8, N_samples_eval=16, N_samples_extra=4,
                            max_total_iters=2, intersection="cube")
        o, d = self._rays(2)

        def f(r):
            def sdf_fn(p):
                return jnp.linalg.norm(p, axis=-1) - r
            z, _ = error_bound_z_vals(
                sdf_fn, o, d, jnp.asarray(0.01), cfg, jax.random.PRNGKey(0), True
            )
            return jnp.sum(z)

        g = jax.grad(f)(0.5)
        assert float(g) == 0.0, "sampler must be a stop-gradient region"

    def test_jit_compiles(self):
        cfg = SamplerConfig(N_samples=8, N_samples_eval=16, N_samples_extra=4,
                            max_total_iters=2, intersection="cube")
        o, d = self._rays(2)
        f = jax.jit(
            lambda o, d, k: error_bound_z_vals(
                sphere_sdf, o, d, jnp.asarray(0.01), cfg, k, True
            )
        )
        z1, e1 = f(o, d, jax.random.PRNGKey(0))
        z2, e2 = f(o, d, jax.random.PRNGKey(1))
        assert z1.shape == z2.shape
        assert not np.allclose(np.asarray(z1), np.asarray(z2))  # rng used


class TestInverseSphereBg:
    """NeRF++-style background support (reference ray_sampler.py:105-108,
    236-239, 257-260; carried unused from VolSDF — no shipped conf enables it)."""

    def test_bg_z_vals_range_and_scale(self):
        from monosdf_tpu.ops.sampler import inverse_sphere_bg_z_vals

        cfg = SamplerConfig(scene_bounding_sphere=2.0, N_samples_inverse_sphere=12,
                            inverse_sphere_bg=True)
        o = jnp.zeros((4, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
        z = inverse_sphere_bg_z_vals(o, d, cfg, None, training=False)
        assert z.shape == (4, 12)
        zn = np.asarray(z)
        # linspace(0,1) scaled by 1/R
        np.testing.assert_allclose(zn[0], np.linspace(0, 1, 12) / 2.0, rtol=1e-6)
        # training jitter stays in range and is random
        zt = inverse_sphere_bg_z_vals(o, d, cfg, jax.random.PRNGKey(0), training=True)
        assert (np.asarray(zt) >= 0).all() and (np.asarray(zt) <= 0.5 + 1e-6).all()

    def test_far_becomes_sphere_exit(self):
        """With inverse_sphere_bg, the extra-sample far is the sphere-exit
        distance, so no final z exceeds it."""
        cfg = SamplerConfig(
            scene_bounding_sphere=1.1, N_samples=8, N_samples_eval=16,
            N_samples_extra=4, max_total_iters=2, intersection="sphere",
            inverse_sphere_bg=True,
        )
        o = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (4, 1))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
        z, _ = error_bound_z_vals(
            sphere_sdf, o, d, jnp.asarray(0.01), cfg, jax.random.PRNGKey(0), True
        )
        exit_dist = 2.0 + 1.1  # |o| + R along the center ray
        assert float(np.asarray(z).max()) <= exit_dist + 1e-4


class TestMergeImpls:
    """The three sorted-merge implementations must agree exactly."""

    def _pairs(self, n=64, m=48, r=37, seed=0):
        rng = np.random.default_rng(seed)
        z_old = np.sort(rng.uniform(0, 4, (r, n)).astype(np.float32), -1)
        z_new = np.sort(rng.uniform(0, 4, (r, m)).astype(np.float32), -1)
        s_old = rng.normal(size=(r, n)).astype(np.float32)
        s_new = rng.normal(size=(r, m)).astype(np.float32)
        return tuple(jnp.asarray(a) for a in (z_old, s_old, z_new, s_new))

    def test_bitonic_matches_sort(self):
        from monosdf_tpu.ops.sampler import (
            _merge_sorted_bitonic,
            _merge_sorted_sort,
        )

        for nm in [(64, 48), (128, 128), (512, 128), (5, 3)]:
            args = self._pairs(*nm)
            z1, s1 = _merge_sorted_sort(*args)
            z2, s2 = _merge_sorted_bitonic(*args)
            np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
            # payload pairing must be preserved (keys are unique w.h.p.)
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    def test_full_sampler_same_output(self):
        import dataclasses

        from monosdf_tpu.ops.sampler import error_bound_z_vals

        cfg = SamplerConfig(
            scene_bounding_sphere=1.1, N_samples=16, N_samples_eval=24,
            N_samples_extra=8, max_total_iters=3,
        )
        rng = np.random.default_rng(1)
        n = 24
        d = rng.normal(size=(n, 3))
        d[:, 2] = np.abs(d[:, 2]) + 0.5
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.asarray(np.tile([[0.0, 0.0, -1.6]], (n, 1)), jnp.float32)
        dirs = jnp.asarray(d, jnp.float32)
        sdf_fn = lambda p: jnp.linalg.norm(p, axis=-1) - 0.5
        beta0 = jnp.asarray(0.1)
        key = jax.random.PRNGKey(0)
        z1, e1 = error_bound_z_vals(sdf_fn, o, dirs, beta0, cfg, key, True)
        cfg2 = dataclasses.replace(cfg, merge_impl="bitonic")
        z2, e2 = error_bound_z_vals(sdf_fn, o, dirs, beta0, cfg2, key, True)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
