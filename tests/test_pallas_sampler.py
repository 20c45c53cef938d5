"""Parity tests for the Pallas sampler-machinery kernel
(ops/pallas_sampler.py) against the jnp machinery in ops/sampler.py (the
torch-parity oracle). Interpret mode on CPU (conftest forces the platform)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from monosdf_tpu.ops.density import laplace_density
from monosdf_tpu.ops.pallas_sampler import sampler_iter_machinery
from monosdf_tpu.ops.sampler import (
    SamplerConfig,
    _d_star,
    _error_bound,
    error_bound_z_vals,
)


def _iteration_oracle(z, sdf, beta_prev, beta0, eps, add_tiny, beta_iters):
    """One sampler iteration's (beta, pdf_upsample, pdf_last) in pure jnp
    (mirrors the machinery block of error_bound_z_vals)."""
    dists = z[:, 1:] - z[:, :-1]
    dstar = _d_star(z, sdf)
    curr = _error_bound(beta0, sdf, z, dists, dstar)
    beta = jnp.where(curr <= eps, beta0, beta_prev)
    bmin = jnp.full_like(beta, beta0)
    bmax = beta
    for _ in range(beta_iters):
        bmid = 0.5 * (bmin + bmax)
        ok = _error_bound(bmid[:, None], sdf, z, dists, dstar) <= eps
        bmax = jnp.where(ok, bmid, bmax)
        bmin = jnp.where(ok, bmin, bmid)
    beta = bmax
    density = laplace_density(sdf, beta[:, None])
    dists_tail = jnp.concatenate(
        [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1
    )
    fe = dists_tail * density
    shifted = jnp.concatenate([jnp.zeros_like(fe[:, :1]), fe[:, :-1]], axis=-1)
    trans = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    eps_sec = (
        jnp.exp(-dstar / beta[:, None]) * dists**2 / (4.0 * beta[:, None] ** 2)
    )
    err_int = jnp.cumsum(eps_sec, axis=-1)
    bound = (jnp.clip(jnp.exp(err_int), max=1e6) - 1.0) * trans[:, :-1]
    weights = (1.0 - jnp.exp(-fe)) * trans
    return beta, bound + add_tiny, weights[:, :-1] + 1e-5, dists_tail, dstar


class TestIterationParity:
    def _inputs(self, R=64, N=256, seed=1):
        rng = np.random.default_rng(seed)
        z = jnp.asarray(np.sort(rng.uniform(0, 3.8, (R, N)).astype(np.float32), -1))
        sdf = jnp.asarray(rng.normal(0, 0.3, (R, N)).astype(np.float32))
        beta_prev = jnp.asarray(rng.uniform(0.2, 0.8, (R,)).astype(np.float32))
        return z, sdf, beta_prev

    def test_beta_and_pdfs_match_f32(self):
        z, sdf, beta_prev = self._inputs()
        beta0, eps, tiny = jnp.float32(0.05), 0.1, 1e-6
        beta_j, pdf_up, pdf_last, dists_tail, dstar = _iteration_oracle(
            z, sdf, beta_prev, beta0, eps, tiny, 10
        )
        dstar_t = jnp.pad(dstar, ((0, 0), (0, 1)))
        for last, ref in ((False, pdf_up), (True, pdf_last)):
            beta_k, pdf_k = sampler_iter_machinery(
                sdf, dists_tail, dstar_t, beta_prev[:, None], beta0, eps,
                tiny, last=last, dtype=None, block=64,
            )
            np.testing.assert_array_equal(
                np.asarray(beta_j), np.asarray(beta_k[:, 0])
            )
            np.testing.assert_allclose(
                np.asarray(ref), np.asarray(pdf_k[:, :-1]), atol=5e-6
            )

    def test_full_sampler_tracks_oracle(self):
        rng = np.random.default_rng(11)
        R = 64
        rays_o = jnp.asarray(np.tile([[0.0, 0.0, -1.5]], (R, 1)), jnp.float32)
        d = rng.normal(size=(R, 3))
        d[:, 2] = np.abs(d[:, 2]) + 1.0
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays_d = jnp.asarray(d, jnp.float32)

        def sdf_fn(pts):
            return jnp.linalg.norm(pts, axis=-1) - 0.5

        base = SamplerConfig(
            scene_bounding_sphere=1.1, N_samples=32, N_samples_eval=128,
            N_samples_extra=16, max_total_iters=3, intersection="cube",
        )
        z1, _ = error_bound_z_vals(
            sdf_fn, rays_o, rays_d, jnp.float32(0.05), base,
            jax.random.PRNGKey(3), training=False,
        )
        span = float(jnp.max(z1) - jnp.min(z1))
        for mdt, tol in (("float32", 1e-3), ("bfloat16", 0.05)):
            pal = dataclasses.replace(
                base, machinery="pallas", machinery_dtype=mdt
            )
            z2, _ = error_bound_z_vals(
                sdf_fn, rays_o, rays_d, jnp.float32(0.05), pal,
                jax.random.PRNGKey(3), training=False,
            )
            assert float(jnp.max(jnp.abs(z1 - z2))) < tol * span, mdt
