"""Pallas TPU kernel: one FULLY-fused error-bounded-sampler iteration.

The `machinery="pallas"` kernel (ops/pallas_sampler.py) fuses the beta
bisection + error bounds + pdf, but leaves three XLA op families between
kernels each iteration: the sorted merge of the cached sweep
(`_merge_sorted_*`, a (R, K) lax.sort), the inverse-CDF draw
(`_sample_pdf`, which materializes an (R, M, N) interval mask in HBM for
its MXU contraction), and the dists/d_star precompute fusions. Those are
the dominant slice of the step's small-op tail (VERDICT r1 #2). This
kernel absorbs ALL of one iteration's sampler math (reference
ray_sampler.py:110-262):

    merge(z_old, sdf_old, z_new, sdf_new)  ->  bisect beta  ->  pdf
    ->  inverse-CDF draw at u

per 128-ray block, in VMEM, in ONE kernel.

Layout: everything is SAMPLE-MAJOR (samples on sublanes, rays on lanes),
so the merge is a bitonic merge network over the sublane axis
(`pltpu.roll` + iota-mask selects — log2(K) compare-exchange stages on an
already-bitonic input), the cumulative sums are triangular (N, N) @ (N, R)
MXU matmuls, and the draw's interval location is a count
(sum_n cdf[n] <= u) followed by four `take_along_axis` sublane gathers
(Mosaic `tpu.dynamic_gather`). The caller supplies the NEXT iteration's
sweep points in the same layout, so the only transposes in the whole loop
are two trivial (R, N) ones at entry/exit.

The draw for upsampling iterations uses DESCENDING linspace u: the
interpolated z comes out descending, which is exactly the descending tail
a bitonic merge input needs — the next iteration's merge consumes it with
zero reordering (its sweep SDF arrives in the same order by construction).

Semantics mirror ops/sampler.py's jnp machinery (the torch-parity oracle);
deviations are the bf16 matmul-cumsum class already accepted for
machinery="pallas" (all outputs are stop-gradient'ed sample positions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def sampler_fused_iter(
    z: jnp.ndarray,
    sdf: jnp.ndarray,
    z_new: jnp.ndarray | None,
    sdf_new: jnp.ndarray | None,
    beta_prev: jnp.ndarray,
    beta0: jnp.ndarray,
    u: jnp.ndarray,
    *,
    eps: float,
    add_tiny: float,
    last: bool,
    beta_iters: int = 10,
    dtype=None,
    interpret: bool | None = None,
):
    """One fused sampler iteration, sample-major.

    z, sdf: (N0, R) sorted along axis 0 (cached state).
    z_new, sdf_new: (M0, R) DESCENDING along axis 0 (the previous
        iteration's draw + its sweep), or None on the first iteration.
    beta_prev: (1, R). beta0: scalar (traced). u: (R, 128) RAY-MAJOR draw
        positions, padded to 128 lanes (descending linspace for upsampling
        iterations, anything for `last`; pad entries draw garbage the
        caller slices off).
    Returns (z_merged (N, R), sdf_merged (N, R), beta (1, R),
    draw (128, R)) with N = N0 (+ M0 if merging); N must be a multiple
    of 128 (the draw's tile-gather width).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    N0, R = z.shape
    merging = z_new is not None
    M0 = z_new.shape[0] if merging else 0
    N = N0 + M0
    Kp = _next_pow2(N)
    pad = Kp - N
    assert R % _LANE == 0, R
    assert N % _LANE == 0, N
    assert u.shape == (R, _LANE), u.shape
    op = jnp.dtype(dtype) if dtype is not None else jnp.float32

    beta0_op = jnp.reshape(beta0.astype(jnp.float32), (1, 1))

    def kernel(*refs):
        if merging:
            (z_ref, s_ref, zn_ref, sn_ref, bp_ref, b0_ref, u_ref,
             zo_ref, so_ref, beta_ref, draw_ref, zbuf, sbuf) = refs
        else:
            (z_ref, s_ref, bp_ref, b0_ref, u_ref,
             zo_ref, so_ref, beta_ref, draw_ref, zbuf, sbuf) = refs

        b0 = b0_ref[0, 0]

        def roll_up(x, d, size):
            """result[i] = x[i + d] (cyclic): pltpu.roll needs shift >= 0."""
            return pltpu.roll(x, size - d, axis=0)

        def roll_dn(x, d):
            """result[i] = x[i - d] (cyclic)."""
            return pltpu.roll(x, d, axis=0)

        # ---- sorted merge: bitonic half-cleaner cascade over sublanes ----
        if merging:
            # [z_old asc | +inf pad | z_new desc] is bitonic; the +inf pad
            # sits at the peak and sorts to the tail (sliced off below).
            zbuf[0:N0, :] = z_ref[:]
            sbuf[0:N0, :] = s_ref[:]
            if pad:
                zbuf[N0:N0 + pad, :] = jnp.full(
                    (pad, _LANE), jnp.inf, jnp.float32
                )
                sbuf[N0:N0 + pad, :] = jnp.zeros((pad, _LANE), jnp.float32)
            zbuf[N0 + pad:Kp, :] = zn_ref[:]
            sbuf[N0 + pad:Kp, :] = sn_ref[:]
            zv = zbuf[:]
            sv = sbuf[:]
            sub = jax.lax.broadcasted_iota(jnp.int32, (Kp, _LANE), 0)
            d = Kp // 2
            while d >= 1:
                z_dn = roll_up(zv, d, Kp)  # partner at i + d
                z_up = roll_dn(zv, d)      # partner at i - d
                s_dn = roll_up(sv, d, Kp)
                s_up = roll_dn(sv, d)
                is_lo = (sub & d) == 0
                swap_lo = z_dn < zv
                swap_hi = z_up > zv
                zv = jnp.where(
                    is_lo, jnp.minimum(zv, z_dn), jnp.maximum(zv, z_up)
                )
                sv = jnp.where(
                    is_lo,
                    jnp.where(swap_lo, s_dn, sv),
                    jnp.where(swap_hi, s_up, sv),
                )
                d //= 2
            z_all = jax.lax.slice(zv, (0, 0), (N, _LANE))
            sdf_v = jax.lax.slice(sv, (0, 0), (N, _LANE))
        else:
            z_all = z_ref[:]
            sdf_v = s_ref[:]

        zo_ref[:] = z_all
        so_ref[:] = sdf_v

        sub_n = jax.lax.broadcasted_iota(jnp.int32, (N, _LANE), 0)
        interior = (sub_n < N - 1).astype(jnp.float32)

        # dists (with the reference's 1e10 tail in row N-1) and d_star
        # (VolSDF Thm 1, reference ray_sampler.py:140-153) from shifts.
        z_next = roll_up(z_all, 1, N)
        s_next = roll_up(sdf_v, 1, N)
        dists = (z_next - z_all) * interior
        dt = dists + (1.0 - interior) * 1.0e10
        a_ = dists
        b_ = jnp.abs(sdf_v)
        c_ = jnp.abs(s_next)
        first_cond = a_ * a_ + b_ * b_ <= c_ * c_
        second_cond = a_ * a_ + c_ * c_ <= b_ * b_
        sh = (a_ + b_ + c_) * 0.5
        area_sq = jnp.maximum(sh * (sh - a_) * (sh - b_) * (sh - c_), 0.0)
        heron_ok = b_ + c_ - a_ > 0
        heron = jnp.where(
            heron_ok,
            2.0 * jnp.sqrt(area_sq) / jnp.maximum(a_, 1e-12),
            0.0,
        )
        dstar = jnp.where(first_cond, b_, jnp.where(second_cond, c_, heron))
        same_sign = jnp.sign(s_next) * jnp.sign(sdf_v) == 1
        dstar = jnp.where(same_sign, dstar, 0.0) * interior

        # ---- machinery: bisection + bounds (pallas_sampler.py semantics,
        # transposed) --------------------------------------------------------
        k_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        l_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        L_strict = (l_i < k_i).astype(op)  # exclusive cumsum (lower tri)
        L_incl = (l_i <= k_i).astype(op)   # inclusive cumsum

        def csum(x, L):
            return jax.lax.dot_general(
                L, x.astype(op), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def laplace(beta):
            e = jnp.exp(-jnp.abs(sdf_v) / beta)
            inner = jnp.where(sdf_v > 0.0, 0.5 * e, 1.0 - 0.5 * e)
            return inner / beta

        def error_bound(beta):
            dens = laplace(beta)
            fe = dists * dens
            integral = csum(fe, L_strict)
            eps_sec = jnp.exp(-dstar / beta) * (dists * dists) / (
                4.0 * beta * beta
            )
            err_int = csum(eps_sec, L_incl)
            bound = (jnp.minimum(jnp.exp(err_int), 1.0e6) - 1.0) * jnp.exp(
                -integral
            )
            return jnp.max(bound * interior, axis=0, keepdims=True)

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

        dens = laplace(beta)
        fe_tail = dt * dens
        trans = jnp.exp(-csum(fe_tail, L_strict))
        if last:
            alpha = 1.0 - jnp.exp(-fe_tail)
            weights = alpha * trans
            pdf = (weights + 1e-5) * interior
        else:
            eps_sec = jnp.exp(-dstar / beta) * (dists * dists) / (
                4.0 * beta * beta
            )
            err_int = csum(eps_sec, L_incl)
            bound = (jnp.minimum(jnp.exp(err_int), 1.0e6) - 1.0) * trans
            pdf = (bound + add_tiny) * interior

        # ---- inverse-CDF draw (reference ray_sampler.py:191-228) ----------
        # Strategy shaped by two Mosaic limits: dynamic_gather cannot span
        # multiple vregs along the gather axis (8 sublanes / 128 lanes), and
        # there is no scatter. So the draw runs RAY-MAJOR: transpose pdf/z
        # to (rays, samples) via exact identity matmuls (0/1 products on
        # the MXU — bitwise-equal to a transpose), locate each u's interval
        # as a count over 128-lane tiles, then gather within each tile
        # (single-vreg lane gather) and select across the <= N/128 tiles.
        #
        # The draw cdf is f32 even under bf16 machinery: quantized cdf ties
        # make the count pick an interval whose upper cdf is below u, so
        # t=(u-lo)/denom extrapolates far past the bin (measured 3.5x the
        # ray span). f32 here is exactly the oracle's searchsorted
        # semantics; the bisection csums above stay at the machinery dtype.
        eyeN = (k_i == l_i).astype(jnp.float32)

        def t_rm(x):  # (N, lanes) -> (lanes, N), exact, on the MXU
            return jax.lax.dot_general(
                x.astype(jnp.float32), eyeN, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        pdfn = pdf / jnp.sum(pdf, axis=0, keepdims=True)
        pdfT = t_rm(pdfn)  # (b, N) ray-major
        zT = t_rm(z_all)
        U_strict = (k_i < l_i).astype(jnp.float32)
        U_incl = (k_i <= l_i).astype(jnp.float32)
        # cdf0T[r, n] = sum_{k<n} pdfn[k, r]  (== [0, cumsum][:N])
        cdf0T = jax.lax.dot_general(
            pdfT, U_strict, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cdfIT = jax.lax.dot_general(
            pdfT, U_incl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        uv = u_ref[:]  # (b, 128) ray-major draw positions (padded to 128)
        T = N // _LANE
        # ray-chunked count keeps the 3D compare masks small (a full
        # (128, 128, 128) i32 mask per tile blew the Mosaic VMEM stack);
        # sublane chunks/concats stay vreg-aligned.
        RC = 16
        cnt_rows = []
        for r0 in range(0, _LANE, RC):
            uc = jax.lax.slice(uv, (r0, 0), (r0 + RC, _LANE))  # (RC, 128)
            acc = jnp.zeros((RC, _LANE), jnp.int32)
            for t in range(T):
                c_t = jax.lax.slice(
                    cdf0T, (r0, t * _LANE), (r0 + RC, (t + 1) * _LANE)
                )  # (RC, 128) this ray-chunk's cdf tile
                le = (c_t[:, None, :] <= uc[:, :, None]).astype(jnp.int32)
                acc = acc + jnp.sum(le, axis=2)
            cnt_rows.append(acc)
        cnt = jnp.concatenate(cnt_rows, axis=0)
        below = jnp.clip(cnt - 1, 0, N - 2)
        t_sel = below // _LANE
        l_idx = below - t_sel * _LANE

        def tile_gather(arrT, idx):
            out = jnp.zeros((_LANE, _LANE), jnp.float32)
            for t in range(T):
                tile = jax.lax.slice(
                    arrT, (0, t * _LANE), (_LANE, (t + 1) * _LANE)
                )
                g = jnp.take_along_axis(tile, idx, axis=1)
                out = jnp.where(t_sel == t, g, out)
            return out

        g_zlo = tile_gather(zT, l_idx)
        g_clo = tile_gather(cdf0T, l_idx)
        g_chi = tile_gather(cdfIT, l_idx)
        # z[below + 1]: below+1 <= N-1 can cross a tile boundary
        t_hi = (below + 1) // _LANE
        l_hi = (below + 1) - t_hi * _LANE
        g_zhi = jnp.zeros((_LANE, _LANE), jnp.float32)
        for t in range(T):
            tile = jax.lax.slice(zT, (0, t * _LANE), (_LANE, (t + 1) * _LANE))
            g = jnp.take_along_axis(tile, l_hi, axis=1)
            g_zhi = jnp.where(t_hi == t, g, g_zhi)

        denom = g_chi - g_clo
        denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
        tt = (uv - g_clo) / denom
        draw_rm = g_zlo + tt * (g_zhi - g_zlo)  # (b, 128) ray-major
        # back to sample-major via the same exact identity-matmul transpose
        eyeB = (
            jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 1)
        ).astype(jnp.float32)
        draw_ref[:] = jax.lax.dot_general(
            draw_rm, eyeB, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grid = (R // _LANE,)
    col = lambda i: (0, i)
    in_specs = [
        pl.BlockSpec((N0, _LANE), col, memory_space=pltpu.VMEM),
        pl.BlockSpec((N0, _LANE), col, memory_space=pltpu.VMEM),
    ]
    operands = [z.astype(jnp.float32), sdf.astype(jnp.float32)]
    if merging:
        in_specs += [
            pl.BlockSpec((M0, _LANE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((M0, _LANE), col, memory_space=pltpu.VMEM),
        ]
        operands += [z_new.astype(jnp.float32), sdf_new.astype(jnp.float32)]
    in_specs += [
        pl.BlockSpec((1, _LANE), col, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_LANE, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands += [beta_prev.astype(jnp.float32), beta0_op,
                 u.astype(jnp.float32)]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((N, _LANE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, _LANE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANE, _LANE), col, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, R), jnp.float32),
            jax.ShapeDtypeStruct((N, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((_LANE, R), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Kp, _LANE), jnp.float32),
            pltpu.VMEM((Kp, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return outs[0], outs[1], outs[2], outs[3]


@functools.lru_cache(maxsize=None)
def _nograd_wrapper(merging: bool, kw_items: tuple):
    """Module-level custom_jvp wrappers, cached per (merging, kwargs) so
    repeated calls reuse the same jaxpr instead of retracing a fresh
    closure every iteration (the sampler stop-gradients every output
    anyway — tangents are zero by construction)."""
    kwargs = dict(kw_items)

    @jax.custom_jvp
    def f(*operands):
        if merging:
            z, sdf, z_new, sdf_new, beta_prev, beta0, u = operands
        else:
            z, sdf, beta_prev, beta0, u = operands
            z_new = sdf_new = None
        return sampler_fused_iter(
            z, sdf, z_new, sdf_new, beta_prev, beta0, u, **kwargs
        )

    @f.defjvp
    def f_jvp(primals, tangents):
        out = f(*primals)
        return out, jax.tree_util.tree_map(jnp.zeros_like, out)

    return f


def sampler_fused_iter_nograd(*args, **kwargs):
    """AD-opaque entry: dispatch to the cached custom_jvp wrapper."""
    z, sdf, z_new, sdf_new, beta_prev, beta0, u = args
    kw_items = tuple(sorted(kwargs.items(), key=lambda kv: kv[0]))
    if z_new is None:
        return _nograd_wrapper(False, kw_items)(z, sdf, beta_prev, beta0, u)
    return _nograd_wrapper(True, kw_items)(*args)
