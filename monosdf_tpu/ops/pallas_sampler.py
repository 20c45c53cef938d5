"""Pallas TPU kernel: the error-bounded sampler's per-iteration machinery.

One iteration of VolSDF Algorithm 1 (reference ray_sampler.py:140-228) runs
11 `_error_bound` evaluations (the beta bisection) plus the final
density/transmittance/pdf computation — as XLA ops that's ~150 small
fusions and 24 multi-pass cumsums per iteration (~1 ms/step over the 5
iterations). This kernel computes the WHOLE block per ray-row in VMEM:

* cumulative sums along the sample axis are (B, N) @ (N, N) triangular
  0/1 matmuls on the MXU (the triangles are built in-kernel from iotas);
* matmul operands run at the compute dtype (bf16 under the perf default):
  the products are error-BOUND quantities that only steer sample
  placement — the same deviation class as the bf16 sweeps, and all
  outputs are stop-gradient'ed by the sampler;
* the 10-step bisection is unrolled in-kernel (VPU exp + selects).

Semantics mirror ops/sampler.py's jnp machinery exactly (the jnp path
remains the torch-parity oracle; tests assert the kernel tracks it).
Inputs: sdf (R, N) and z-derived precomputables (dists with the 1e10 tail
already in lane N-1, d_star) — those are single cheap XLA fusions.
Outputs: the bisected beta (R, 1) and the next draw's pdf (R, N) (lanes
>= N-1 zeroed): bound_opacity + add_tiny for upsampling iterations,
weights[:-1] + 1e-5 for the final draw (``last``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


def sampler_iter_machinery(
    sdf: jnp.ndarray,
    dists_tail: jnp.ndarray,
    d_star: jnp.ndarray,
    beta_prev: jnp.ndarray,
    beta0: jnp.ndarray,
    eps: float,
    add_tiny: float,
    last: bool,
    beta_iters: int = 10,
    dtype=None,
    block: int = 256,
    interpret: bool | None = None,
):
    """(beta (R, 1), pdf (R, N)) for one sampler iteration.

    sdf (R, N); dists_tail (R, N): z[i+1]-z[i] with lane N-1 = 1e10
    (reference ray_sampler.py:348); d_star (R, N): the Theorem-1 bound per
    interval with lane N-1 = 0; beta_prev (R, 1); beta0 scalar (traced).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    R, N = sdf.shape
    assert N % _LANE == 0, N
    b = min(block, R)
    assert R % b == 0, (R, b)
    act = jnp.dtype(dtype) if dtype is not None else jnp.float32
    op = act

    beta0_op = jnp.reshape(beta0.astype(jnp.float32), (1, 1))

    def kernel(sdf_ref, dt_ref, ds_ref, bp_ref, b0_ref, beta_ref, pdf_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, N), 1)
        interior = (lane < N - 1).astype(jnp.float32)  # true intervals
        sdf_v = sdf_ref[:]
        dt = dt_ref[:]
        dstar = ds_ref[:]
        dists = dt * interior  # without the 1e10 tail
        b0 = b0_ref[0, 0]

        # triangular 0/1 cumsum operators, built from iotas
        k_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        l_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        T_strict = (k_i < l_i).astype(op)  # exclusive cumsum
        T_incl = (k_i <= l_i).astype(op)  # inclusive cumsum

        def csum(x, T):
            return jax.lax.dot_general(
                x.astype(op), T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def laplace(beta):
            # LaplaceDensity (reference density.py:21-26), alpha = 1/beta:
            # (0.5 + 0.5 sign(s) expm1(-|s|/beta)) written branchless as
            # where(s>0, 0.5 e, 1-0.5 e) with e = exp(-|s|/beta) — exact
            # (no expm1 cancellation; Mosaic has no expm1)
            s = sdf_v
            e = jnp.exp(-jnp.abs(s) / beta)
            inner = jnp.where(s > 0.0, 0.5 * e, 1.0 - 0.5 * e)
            return inner / beta

        def error_bound(beta):
            # reference ray_sampler.py:264-271
            dens = laplace(beta)
            fe = dists * dens
            integral = csum(fe, T_strict)
            eps_sec = jnp.exp(-dstar / beta) * (dists * dists) / (
                4.0 * beta * beta
            )
            err_int = csum(eps_sec, T_incl)
            bound = (jnp.minimum(jnp.exp(err_int), 1.0e6) - 1.0) * jnp.exp(
                -integral
            )
            return jnp.max(bound * interior, axis=1, keepdims=True)

        curr = error_bound(b0)
        beta = jnp.where(curr <= eps, b0, bp_ref[:])
        bmin = jnp.full_like(beta, b0)
        bmax = beta
        for _ in range(beta_iters):
            bmid = 0.5 * (bmin + bmax)
            ok = error_bound(bmid) <= eps
            bmax = jnp.where(ok, bmid, bmax)
            bmin = jnp.where(ok, bmin, bmid)
        beta = bmax
        beta_ref[:] = beta

        # density/transmittance with the bisected beta
        # (reference ray_sampler.py:346-355)
        dens = laplace(beta)
        fe_tail = dt * dens
        trans = jnp.exp(-csum(fe_tail, T_strict))
        if last:
            alpha = 1.0 - jnp.exp(-fe_tail)
            weights = alpha * trans
            pdf_ref[:] = (weights + 1e-5) * interior
        else:
            eps_sec = jnp.exp(-dstar / beta) * (dists * dists) / (
                4.0 * beta * beta
            )
            err_int = csum(eps_sec, T_incl)
            bound = (jnp.minimum(jnp.exp(err_int), 1.0e6) - 1.0) * trans
            pdf_ref[:] = (bound + add_tiny) * interior

    grid = (R // b,)
    row = lambda i: (i, 0)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, N), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        sdf.astype(jnp.float32),
        dists_tail.astype(jnp.float32),
        d_star.astype(jnp.float32),
        beta_prev.astype(jnp.float32),
        beta0_op,
    )
    return outs[0], outs[1]


def sampler_iter_machinery_nograd(*args, **kwargs):
    """AD-opaque wrapper (the sampler stop-gradients every output anyway)."""

    @jax.custom_jvp
    def f(sdf, dists_tail, d_star, beta_prev, beta0):
        return sampler_iter_machinery(
            sdf, dists_tail, d_star, beta_prev, beta0, **kwargs
        )

    @f.defjvp
    def f_jvp(primals, tangents):
        out = f(*primals)
        return out, jax.tree_util.tree_map(jnp.zeros_like, out)

    return f(*args)
