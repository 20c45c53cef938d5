"""Micro-timing of the error-bounded sampler's non-MLP machinery on the real
chip: cumsum lowering, _error_bound (the 11x-per-iteration bisection body),
sorted merges, inverse-CDF draws, final sort.

The whole timing chain lives inside ONE jitted fori_loop (per CLAUDE.md a
host fetch is the only sync, and per-op dispatch over the axon tunnel costs
~1 ms — chaining outside jit measures the tunnel, not the op).

Usage: python scripts/bench_sampler_machinery.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from monosdf_tpu.ops.sampler import (
    _d_star,
    _error_bound,
    _merge_sorted_bitonic,
    _merge_sorted_sort,
    _sample_pdf,
)

R = 1024
ITERS = 100


def timeit(name, fn, x, *rest):
    """fn(x, *rest) -> array; chained via a tiny data feedback on x."""

    def body(i, carry):
        out = fn(carry, *rest)
        fb = jnp.sum(out[:1, -1:]) if out.ndim > 1 else out[0]
        return carry + 1e-30 * fb

    run = jax.jit(lambda a: jax.lax.fori_loop(0, ITERS, body, a))
    np.asarray(run(x))  # compile + execute once
    t0 = time.perf_counter()
    np.asarray(run(x))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:55s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)

    for N in (256, 640):
        x = jnp.asarray(rng.uniform(0, 1, (R, N)).astype(np.float32))
        tri = jnp.tril(jnp.ones((N, N), jnp.float32))

        timeit(f"cumsum ({R},{N}) f32", lambda a: jnp.cumsum(a, axis=-1), x)
        timeit(
            f"cumsum-as-trimatmul ({R},{N}) HIGHEST",
            lambda a: jax.lax.dot_general(
                tri, a, (((0,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ).T,
            x,
        )
        timeit(
            f"cumsum-as-trimatmul2 ({R},{N}) HIGHEST",
            lambda a: jax.lax.dot_general(
                a, jnp.triu(jnp.ones((N, N), jnp.float32)),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ),
            x,
        )
        timeit(
            f"cumsum-as-trimatmul2 ({R},{N}) DEFAULT",
            lambda a: jax.lax.dot_general(
                a, jnp.triu(jnp.ones((N, N), jnp.float32)),
                (((1,), (0,)), ((), ())),
            ),
            x,
        )
        timeit(
            f"cumsum assoc_scan ({R},{N})",
            lambda a: jax.lax.associative_scan(jnp.add, a, axis=-1),
            x,
        )

    # _error_bound bisection body at each iteration shape
    for N in (128, 256, 384, 512, 640):
        z = jnp.asarray(np.sort(rng.uniform(0, 3, (R, N)).astype(np.float32), -1))
        sdf = jnp.asarray(rng.normal(0, 0.3, (R, N)).astype(np.float32))
        dists = z[:, 1:] - z[:, :-1]
        dstar = _d_star(z, sdf)

        def bisect11(sdf, z, dists, dstar):
            beta = jnp.full((R, 1), 0.05, jnp.float32)
            e = _error_bound(beta, sdf, z, dists, dstar)
            for _ in range(10):
                beta = beta * 0.9 + 1e-30 * e[:, None]
                e = _error_bound(beta, sdf, z, dists, dstar)
            return e[:, None]

        timeit(f"error_bound x11 ({R},{N})", bisect11, sdf, z, dists, dstar)

    # merges
    for N in (128, 256, 384, 512):
        z_old = jnp.asarray(np.sort(rng.uniform(0, 3, (R, N)).astype(np.float32), -1))
        s_old = jnp.asarray(rng.normal(0, 1, (R, N)).astype(np.float32))
        z_new = jnp.asarray(np.sort(rng.uniform(0, 3, (R, 128)).astype(np.float32), -1))
        s_new = jnp.asarray(rng.normal(0, 1, (R, 128)).astype(np.float32))
        timeit(
            f"merge sort ({N}+128)",
            lambda a, so, zn, sn: _merge_sorted_sort(a, so, zn, sn)[0],
            z_old, s_old, z_new, s_new,
        )
        timeit(
            f"merge bitonic ({N}+128)",
            lambda a, so, zn, sn: _merge_sorted_bitonic(a, so, zn, sn)[0],
            z_old, s_old, z_new, s_new,
        )

    # inverse-CDF draws
    for N, M in ((128, 128), (256, 128), (384, 128), (512, 128), (640, 64)):
        bins = jnp.asarray(np.sort(rng.uniform(0, 3, (R, N)).astype(np.float32), -1))
        pdf = jnp.asarray(rng.uniform(0, 1, (R, N - 1)).astype(np.float32))
        u = jnp.asarray(rng.uniform(0, 1, (R, M)).astype(np.float32))
        timeit(
            f"sample_pdf N={N} M={M}",
            lambda b, p, uu: _sample_pdf(b, p, uu),
            bins, pdf, u,
        )

    # final sort (98 wide)
    zf = jnp.asarray(rng.uniform(0, 3, (R, 98)).astype(np.float32))
    timeit("final sort (1024,98)", lambda a: jnp.sort(a, axis=-1), zf)


if __name__ == "__main__":
    main()
