"""Grid-mode differentiated SDF trunk kernel (diff_backend='pallas' with
use_grid=True).

The stacked-row structure of ops/pallas_sdf_grad.py — the primal row-block
(b, d) and the three stacked spatial-tangent row-blocks (3b, d) share every
matmul — applied to the hash-grid trunk (reference network.py:247-275,
2x256 on [PE | 32 grid features]). The hash-grid GATHER stays an XLA op:
probe waves 7/8 (PERFORMANCE.md) closed every in-kernel alternative (no
Mosaic gather primitive at useful sizes; per-row async-DMA pipelines 70x
slower than the XLA gather), so the layer-0 input and its three spatial
tangents are assembled XLA-SIDE via ``jax.linearize`` through the encode
and ship as ONE stacked (4N, 128) operand. Unlike the MLP kernel (whose
points are stop-gradient'ed), the VJP here EMITS the layer-0 input
cotangent ``da0`` — that is the path the hash-table gradient takes back
through the encode transpose (the corner-affine fold scatter) and what the
reference's second CUDA backward provides (hashencoder.cu:375-595).

No bounding-sphere clamp (reference ImplicitNetworkGrid does not clamp,
network.py:307-309) and no skip connections (grid trunks are 2 hidden
layers).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .pallas_sdf_grad import (
    _gate100,
    _lane_perm_const,
    _layer_dims,
    _mask_lanes,
    _pad_params,
    _r128,
    _unperm_last_grads,
)

_LANE = 128


def _stack4(arrs, b: int):
    """[4 x (n_pad, d)] -> (4*n_pad, d) in the kernel's block-interleaved
    stacked-row layout: block i owns rows [4b*i, 4b*(i+1)) as
    [primal(b); t0(b); t1(b); t2(b)]."""
    n_pad, d = arrs[0].shape
    s = jnp.stack(arrs, axis=0).reshape(4, n_pad // b, b, d)
    return jnp.transpose(s, (1, 0, 2, 3)).reshape(4 * n_pad, d)


def _unstack4(a, b: int):
    """Inverse of _stack4: (4*n_pad, d) -> 4 x (n_pad, d)."""
    n4, d = a.shape
    n_pad = n4 // 4
    s = a.reshape(n_pad // b, 4, b, d)
    s = jnp.transpose(s, (1, 0, 2, 3)).reshape(4, n_pad, d)
    return [s[k] for k in range(4)]


def _prep_a0(inp, tg, block: int, act_dtype):
    """Pad (N, Din) input + (3, N, Din) tangents to lanes d0p/rows n_pad and
    stack into the (4*n_pad, d0p) kernel operand."""
    N, Din = inp.shape
    d0p = _r128(Din)
    b = block
    n_pad = -(-max(N, 1) // b) * b
    arrs = [inp] + [tg[k] for k in range(3)]
    arrs = [
        jnp.pad(a.astype(act_dtype), ((0, n_pad - N), (0, d0p - Din)))
        for a in arrs
    ]
    return _stack4(arrs, b), n_pad, d0p


def _fwd_pallas_a0(ws, bs, inp, tg, dtype, block: int,
                   interpret: bool | None, save_z: bool):
    """(sdf (N,1) f32, feat (N, d_out-1) act, grad (N,3) f32)[, zs]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    N, Din = inp.shape
    L = len(ws)
    in_true, out_true, in_pad, out_pad, fpad = _layer_dims(ws, (), Din)
    act_dtype = jnp.dtype(dtype) if dtype is not None else jnp.float32
    op_dtype = act_dtype
    b = block

    wp, bp = _pad_params(ws, bs, in_true, out_true, in_pad, out_pad, fpad)
    a0_p, n_pad, d0p = _prep_a0(inp, tg, b, jnp.float32)

    def kernel(*refs):
        a0_ref = refs[0]
        w_refs = refs[1:1 + L]
        b_refs = refs[1 + L:1 + 2 * L]
        os_ref, of_ref, g_ref = refs[1 + 2 * L:4 + 2 * L]
        z_refs = refs[4 + 2 * L:]

        row = jax.lax.broadcasted_iota(jnp.int32, (4 * b, 1), 0)
        primal_row = (row < b).astype(jnp.float32)

        A = a0_ref[:].astype(jnp.float32)
        for l in range(L - 1):
            Z = jax.lax.dot_general(
                A.astype(op_dtype), w_refs[l][:].astype(op_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + primal_row * b_refs[l][:]
            if save_z:
                z_refs[l][:] = Z.astype(act_dtype)
            h, s = _gate100(Z[:b])
            h = _mask_lanes(h, out_true[l])
            T = jnp.concatenate([s, s, s], axis=0) * Z[b:]
            A = jnp.concatenate([h, T], axis=0).astype(act_dtype)

        # last layer split (permuted [features | sdf-block] layout)
        wl = w_refs[L - 1][:]
        Zp = jax.lax.dot_general(
            A[:b].astype(op_dtype), wl.astype(op_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + b_refs[L - 1][:]
        Zt = jax.lax.dot_general(
            A[b:].astype(op_dtype), wl[:, fpad:].astype(op_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        of_ref[:] = Zp[:, :fpad].astype(act_dtype)
        gcols = jnp.concatenate(
            [Zt[0:b, 0:1], Zt[b:2 * b, 0:1], Zt[2 * b:3 * b, 0:1]], axis=1
        )
        g_ref[:] = jnp.pad(gcols, ((0, 0), (0, _LANE - 3)))
        os_ref[:] = Zp[:, fpad:]  # lane 0 = sdf; others zero by padding

    grid = (n_pad // b,)
    in_specs = [
        pl.BlockSpec((4 * b, d0p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for l in range(L):
        in_specs.append(pl.BlockSpec(wp[l].shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for l in range(L):
        in_specs.append(pl.BlockSpec(bp[l].shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [
        pl.BlockSpec((b, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, fpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, fpad), act_dtype),
        jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
    ]
    if save_z:
        for l in range(L - 1):
            out_specs.append(pl.BlockSpec(
                (4 * b, out_pad[l]), lambda i: (i, 0), memory_space=pltpu.VMEM
            ))
            out_shape.append(
                jax.ShapeDtypeStruct((4 * n_pad, out_pad[l]), act_dtype)
            )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(a0_p, *wp, *bp)
    sdf = outs[0][:N, :1]
    feat = outs[1][:N, : out_true[-1] - 1]
    g = outs[2][:N, :3]
    if save_z:
        return sdf, feat, g, list(outs[3:])
    return sdf, feat, g


def _bwd_pallas_a0(ws, bs, inp, tg, zs, c_sdf, c_feat, c_grad, dtype,
                   block: int, interpret: bool | None):
    """Hand-written VJP: (dws, dbs, dinp (N, Din), dtg (3, N, Din)).

    The da0 output block is the layer-0 input cotangent at the stacked
    layout; its primal rows carry d loss/d[PE|features] (the table-gradient
    path back through the encode transpose) and its tangent row-blocks
    carry d loss/d(input tangents) (the second-order eikonal path)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    N, Din = inp.shape
    L = len(ws)
    in_true, out_true, in_pad, out_pad, fpad = _layer_dims(ws, (), Din)
    act_dtype = jnp.dtype(dtype) if dtype is not None else jnp.float32
    op_dtype = act_dtype
    b = block

    wp, bp = _pad_params(ws, bs, in_true, out_true, in_pad, out_pad, fpad)
    a0_p, n_pad, d0p = _prep_a0(inp, tg, b, jnp.float32)
    P = _lane_perm_const()

    cf_p = jnp.pad(c_feat.astype(act_dtype),
                   ((0, n_pad - N), (0, fpad - c_feat.shape[1])))
    cs_p = jnp.pad(c_sdf.astype(act_dtype), ((0, n_pad - N), (0, 0)))
    cg_p = jnp.pad(c_grad.astype(act_dtype),
                   ((0, n_pad - N), (0, _LANE - c_grad.shape[1])))

    def kernel(*refs):
        a0_ref, P_ref, cs_ref, cf_ref, cg_ref = refs[:5]
        rest = refs[5:]
        w_refs, rest = rest[:L], rest[L:]
        b_refs, rest = rest[:L], rest[L:]
        zin_refs, rest = rest[:L - 1], rest[L - 1:]
        dw_refs, rest = rest[:L], rest[L:]
        db_refs, rest = rest[:L], rest[L:]
        da0_ref = rest[0]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for l in range(L):
                dw_refs[l][:] = jnp.zeros_like(dw_refs[l])
                db_refs[l][:] = jnp.zeros_like(db_refs[l])

        def dot(a, w_, transpose_w=False):
            a = a.astype(op_dtype)
            w_ = w_.astype(op_dtype)
            dims = (
                (((1,), (1,)), ((), ()))
                if transpose_w
                else (((1,), (0,)), ((), ()))
            )
            return jax.lax.dot_general(
                a, w_, dims, preferred_element_type=jnp.float32
            )

        def dot_accum(a, ct):
            return jax.lax.dot_general(
                a.astype(op_dtype), ct.astype(op_dtype),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )

        A0 = a0_ref[:].astype(jnp.float32)

        def a_in_of(l):
            if l == 0:
                return A0
            Zp_ = zin_refs[l - 1][:].astype(jnp.float32)
            hp, sp = _gate100(Zp_[:b])
            hp = _mask_lanes(hp, out_true[l - 1])
            Tp = jnp.concatenate([sp, sp, sp], axis=0) * Zp_[b:]
            return jnp.concatenate([hp, Tp], axis=0)

        # last layer, split (see ops/pallas_sdf_grad.py _bwd_pallas)
        wl = w_refs[L - 1][:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, _LANE), 1)
        cs_in = cs_ref[:].astype(jnp.float32)
        cs_block = jnp.where(lane == 0, cs_in, 0.0)
        CTp = jnp.concatenate(
            [cf_ref[:].astype(jnp.float32), cs_block], axis=1
        )
        CTt = jnp.concatenate(
            [dot(cg_ref[:], P_ref[:, k * _LANE:(k + 1) * _LANE])
             for k in range(3)],
            axis=0,
        )
        A_in = a_in_of(L - 1)
        dw_last = dot_accum(A_in[:b], CTp)
        dw_last_t = dot_accum(A_in[b:], CTt)
        dw_refs[L - 1][:] += dw_last + jnp.pad(
            dw_last_t, ((0, 0), (fpad, 0))
        )
        db_refs[L - 1][:] += jnp.sum(CTp, axis=0, keepdims=True)
        ct_A = jnp.concatenate(
            [dot(CTp, wl, transpose_w=True),
             dot(CTt, wl[:, fpad:], transpose_w=True)],
            axis=0,
        )[:, :out_pad[L - 2]]

        for l in range(L - 2, -1, -1):
            Z = zin_refs[l][:].astype(jnp.float32)
            z, U = Z[:b], Z[b:]
            _, s = _gate100(z)
            s2 = 100.0 * s * (1.0 - s)
            ct_h, ct_T = ct_A[:b], ct_A[b:]
            ct_sum = (
                ct_T[0:b] * U[0:b]
                + ct_T[b:2 * b] * U[b:2 * b]
                + ct_T[2 * b:3 * b] * U[2 * b:3 * b]
            )
            ct_z = ct_h * s + ct_sum * s2
            ct_U = jnp.concatenate([s, s, s], axis=0) * ct_T
            CT = jnp.concatenate([ct_z, ct_U], axis=0)

            A_in = a_in_of(l)
            dw_refs[l][:] += dot_accum(A_in, CT)
            db_refs[l][:] += jnp.sum(CT[:b], axis=0, keepdims=True)

            ct_Ain = dot(CT, w_refs[l][:], transpose_w=True)
            if l > 0:
                ct_A = ct_Ain[:, :out_pad[l - 1]]
            else:
                da0_ref[:] = ct_Ain[:, :d0p]

    grid = (n_pad // b,)
    in_specs = [
        pl.BlockSpec((4 * b, d0p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(P.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, fpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [a0_p, P, cs_p, cf_p, cg_p]
    for l in range(L):
        in_specs.append(pl.BlockSpec(wp[l].shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    operands.extend(wp)
    for l in range(L):
        in_specs.append(pl.BlockSpec(bp[l].shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    operands.extend(bp)
    for l in range(L - 1):
        in_specs.append(pl.BlockSpec(
            (4 * b, out_pad[l]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ))
    operands.extend(zs)

    out_specs = [
        pl.BlockSpec(wp[l].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for l in range(L)
    ] + [
        pl.BlockSpec(bp[l].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for l in range(L)
    ] + [
        pl.BlockSpec((4 * b, d0p), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    out_shape = (
        [jax.ShapeDtypeStruct(wp[l].shape, jnp.float32) for l in range(L)]
        + [jax.ShapeDtypeStruct(bp[l].shape, jnp.float32) for l in range(L)]
        + [jax.ShapeDtypeStruct((4 * n_pad, d0p), jnp.float32)]
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)

    dws = [outs[l][: in_true[l], : out_true[l]] for l in range(L - 1)]
    dbs = [outs[L + l][0, : out_true[l]] for l in range(L - 1)]
    dw_last, db_last = _unperm_last_grads(
        outs[L - 1][: in_true[-1]], outs[2 * L - 1][0], out_true[-1], fpad
    )
    dws.append(dw_last)
    dbs.append(db_last)

    da0_blocks = _unstack4(outs[2 * L], block)
    dinp = da0_blocks[0][:N, :Din]
    dtg = jnp.stack([da0_blocks[k + 1][:N, :Din] for k in range(3)], axis=0)
    return dws, dbs, dinp, dtg


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def sdf_mlp_with_grad_in(ws, bs, inp, tg, dtype_name: str, block: int,
                         save_z: bool = True):
    """(sdf (N,1) f32, feat (N, d_out-1) act, grad (N,3) f32) of the grid
    trunk over a PRECOMPUTED layer-0 input.

    ws/bs: effective per-layer weights, natural column order. inp (N, Din):
    [PE(x) | grid features]; tg (3, N, Din): its three spatial basis
    tangents (from jax.linearize through the encode — XLA-side, sharing the
    gathered values). The VJP emits (dws, dbs, dinp, dtg): dinp/dtg carry
    the hash-table gradient back through the encode transpose."""
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    sdf, feat, g = _fwd_pallas_a0(
        list(ws), list(bs), inp, tg, dtype, block, None, save_z=False
    )
    return sdf, feat, g


def _fwd(ws, bs, inp, tg, dtype_name, block, save_z):
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    if save_z:
        sdf, feat, g, zs = _fwd_pallas_a0(
            list(ws), list(bs), inp, tg, dtype, block, None, save_z=True
        )
    else:
        sdf, feat, g = _fwd_pallas_a0(
            list(ws), list(bs), inp, tg, dtype, block, None, save_z=False
        )
        zs = None
    return (sdf, feat, g), (ws, bs, inp, tg, zs)


def _bwd(dtype_name, block, save_z, res, cts):
    ws, bs, inp, tg, zs = res
    c_sdf, c_feat, c_grad = cts
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    if zs is None:
        # recompute residuals (one extra forward) — save_z=True is the
        # measured default in the MLP kernel; keep parity here
        _, _, _, zs = _fwd_pallas_a0(
            list(ws), list(bs), inp, tg, dtype, block, None, save_z=True
        )
    dws, dbs, dinp, dtg = _bwd_pallas_a0(
        list(ws), list(bs), inp, tg, zs, c_sdf, c_feat, c_grad, dtype,
        block, None,
    )
    return (
        tuple(dw.astype(w.dtype) for dw, w in zip(dws, ws)),
        tuple(db.astype(b_.dtype) for db, b_ in zip(dbs, bs)),
        dinp.astype(inp.dtype),
        dtg.astype(tg.dtype),
    )


sdf_mlp_with_grad_in.defvjp(_fwd, _bwd)
