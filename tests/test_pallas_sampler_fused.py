"""Parity tests for the fully-fused sampler-iteration kernel
(ops/pallas_sampler_fused.py) against the jnp machinery in ops/sampler.py
(the torch-parity oracle). Interpret mode on CPU.

Contracts:
* the in-kernel bitonic merge is EXACT (pure comparisons/selects);
* the bisected beta is EXACT at f32 (same arithmetic as the machinery
  kernel, which test_pallas_sampler.py pins to the oracle bitwise);
* the inverse-CDF draw matches to ~2e-5 except for rare interval-boundary
  flips (cumsum-order arithmetic) — quantile-bounded, max bounded by one
  interval width. All outputs are stop-gradient'ed sample positions, so
  this is the same accepted deviation class as machinery="pallas" bf16.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from monosdf_tpu.ops.density import laplace_density
from monosdf_tpu.ops.pallas_sampler_fused import sampler_fused_iter
from monosdf_tpu.ops.sampler import (
    SamplerConfig,
    _d_star,
    _error_bound,
    _merge_sorted_sort,
    _sample_pdf,
    error_bound_z_vals,
)


def _oracle_iteration(z_old, s_old, z_new, s_new, beta_prev, beta0, u,
                      eps, tiny, beta_iters, last):
    zm, sm = _merge_sorted_sort(z_old, s_old, z_new, s_new)
    dists = zm[:, 1:] - zm[:, :-1]
    dstar = _d_star(zm, sm)
    curr = _error_bound(beta0, sm, zm, dists, dstar)
    beta = jnp.where(curr <= eps, beta0, beta_prev)
    bmin = jnp.full_like(beta, beta0)
    bmax = beta
    for _ in range(beta_iters):
        bmid = 0.5 * (bmin + bmax)
        ok = _error_bound(bmid[:, None], sm, zm, dists, dstar) <= eps
        bmax = jnp.where(ok, bmid, bmax)
        bmin = jnp.where(ok, bmin, bmid)
    beta = bmax
    density = laplace_density(sm, beta[:, None])
    dt = jnp.concatenate([dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1)
    fe = dt * density
    shifted = jnp.concatenate(
        [jnp.zeros_like(fe[:, :1]), fe[:, :-1]], axis=-1
    )
    trans = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    if last:
        weights = (1.0 - jnp.exp(-fe)) * trans
        pdf = weights[:, :-1] + 1e-5
    else:
        eps_sec = (
            jnp.exp(-dstar / beta[:, None])
            * dists**2
            / (4.0 * beta[:, None] ** 2)
        )
        err_int = jnp.cumsum(eps_sec, axis=-1)
        pdf = (jnp.clip(jnp.exp(err_int), max=1e6) - 1.0) * trans[:, :-1] + tiny
    draw = _sample_pdf(zm, pdf, u)
    return zm, sm, beta, draw


class TestFusedIteration:
    def _inputs(self, R=128, N0=256, M0=128, M=128, seed=5):
        rng = np.random.default_rng(seed)
        z_old = jnp.asarray(
            np.sort(rng.uniform(0, 3.8, (R, N0)).astype(np.float32), -1)
        )
        s_old = jnp.asarray(rng.normal(0, 0.3, (R, N0)).astype(np.float32))
        z_new = jnp.asarray(
            np.sort(rng.uniform(0, 3.8, (R, M0)).astype(np.float32), -1)
        )
        s_new = jnp.asarray(rng.normal(0, 0.3, (R, M0)).astype(np.float32))
        beta_prev = jnp.asarray(
            rng.uniform(0.2, 0.8, (R,)).astype(np.float32)
        )
        u = jnp.asarray(
            np.sort(rng.uniform(0, 1, (R, M)).astype(np.float32), -1)
        )
        return z_old, s_old, z_new, s_new, beta_prev, u

    def test_merge_beta_exact_draw_close(self):
        z_old, s_old, z_new, s_new, beta_prev, u = self._inputs()
        beta0, eps, tiny = jnp.float32(0.05), 0.1, 1e-6
        for last in (False, True):
            zm, sm, beta_j, draw_j = _oracle_iteration(
                z_old, s_old, z_new, s_new, beta_prev, beta0, u,
                eps, tiny, 10, last,
            )
            zT, sT, bT, dT = sampler_fused_iter(
                z_old.T, s_old.T, z_new[:, ::-1].T, s_new[:, ::-1].T,
                beta_prev[None, :], beta0, u,
                eps=eps, add_tiny=tiny, last=last, beta_iters=10, dtype=None,
            )
            np.testing.assert_array_equal(np.asarray(zT.T), np.asarray(zm))
            np.testing.assert_array_equal(np.asarray(sT.T), np.asarray(sm))
            np.testing.assert_array_equal(
                np.asarray(bT[0]), np.asarray(beta_j)
            )
            d = np.abs(np.asarray(dT.T) - np.asarray(draw_j))
            assert np.quantile(d, 0.99) < 1e-4, (last, np.quantile(d, 0.99))
            max_interval = float(jnp.max(zm[:, 1:] - zm[:, :-1]))
            assert d.max() <= max_interval + 1e-6, (last, d.max())

    def test_first_iteration_no_merge(self):
        z_old, s_old, _, _, beta_prev, u = self._inputs(N0=128, M0=8)
        beta0, eps, tiny = jnp.float32(0.05), 0.1, 1e-6
        # oracle with an empty merge: machinery on z_old directly
        zm, sm, beta_j, draw_j = _oracle_iteration(
            z_old[:, :64], s_old[:, :64], z_old[:, 64:], s_old[:, 64:],
            beta_prev, beta0, u, eps, tiny, 10, False,
        )
        # kernel without z_new on the pre-merged state must agree
        zT, sT, bT, dT = sampler_fused_iter(
            zm.T, sm.T, None, None, beta_prev[None, :], beta0, u,
            eps=eps, add_tiny=tiny, last=False, beta_iters=10, dtype=None,
        )
        np.testing.assert_array_equal(np.asarray(zT.T), np.asarray(zm))
        np.testing.assert_array_equal(np.asarray(bT[0]), np.asarray(beta_j))
        d = np.abs(np.asarray(dT.T) - np.asarray(draw_j))
        assert np.quantile(d, 0.99) < 1e-4


class TestFullSamplerTracksOracle:
    def test_end_to_end(self):
        rng = np.random.default_rng(11)
        R = 128
        rays_o = jnp.asarray(
            np.tile([[0.0, 0.0, -1.5]], (R, 1)), jnp.float32
        )
        d = rng.normal(size=(R, 3))
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays_d = jnp.asarray(d, jnp.float32)

        def sdf_fn(pts):
            return jnp.linalg.norm(pts, axis=-1) - 0.5

        base = SamplerConfig(
            scene_bounding_sphere=1.1, N_samples=64, N_samples_eval=128,
            N_samples_extra=32, max_total_iters=5, intersection="cube",
        )
        for training in (False, True):
            z1, e1 = error_bound_z_vals(
                sdf_fn, rays_o, rays_d, jnp.float32(0.05), base,
                jax.random.PRNGKey(3), training=training,
            )
            span = float(jnp.max(z1) - jnp.min(z1))
            for mdt, tol in (("float32", 0.02), ("bfloat16", 0.05)):
                cfgf = dataclasses.replace(
                    base, machinery="pallas_fused", machinery_dtype=mdt
                )
                z2, e2 = error_bound_z_vals(
                    sdf_fn, rays_o, rays_d, jnp.float32(0.05), cfgf,
                    jax.random.PRNGKey(3), training=training,
                )
                err = float(jnp.max(jnp.abs(z1 - z2)))
                assert err < tol * span, (training, mdt, err, span)
                # structure: sorted, in [near, far]
                assert bool(jnp.all(z2[:, 1:] >= z2[:, :-1]))
                assert bool(jnp.all(e2 >= 0.0))
