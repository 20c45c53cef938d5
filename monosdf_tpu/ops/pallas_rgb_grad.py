"""Pallas TPU kernel: custom-VJP radiance (rendering) MLP.

TPU-native replacement for XLA autodiff of the radiance network
(reference code/model/network.py:389-470, the plain ReLU trunk): the
backward recomputes the forward per row-block inside VMEM and runs the
reverse sweep without activation temps touching HBM. Unlike the SDF kernel
(ops/pallas_sdf_grad.py) the INPUT cotangent is produced in full — the
radiance inputs include the SDF spatial gradient (normals), the feature
vector, and the trainable per-image code, all of which require gradients.

Numerics mirror nn.apply_linear's mixed mode exactly: with ``dtype`` the
matmul operands are cast down, the MXU accumulates f32, inter-layer
activations (and the bias add) are rounded to ``dtype``; the last layer
emits f32 + f32 bias. The final nonlinearity (sigmoid / HDR relu) stays
outside in XLA.

Weight-norm stays outside: the kernel sees EFFECTIVE (W, b) from
``effective_linear_weights`` and JAX chains d(effective W)/d(g, v).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


def _r128(n: int) -> int:
    return -(-n // _LANE) * _LANE


def _pads(ws):
    in_true = [w.shape[0] for w in ws]
    out_true = [w.shape[1] for w in ws]
    for l in range(1, len(ws)):
        assert in_true[l] == out_true[l - 1], (l, in_true[l], out_true[l - 1])
    return in_true, out_true, [_r128(d) for d in in_true], [_r128(d) for d in out_true]


def mlp_reference(ws, bs, h0, dtype=None):
    """Pure-jnp mirror of the kernel (= rendering_apply's trunk on effective
    weights): ReLU between layers, raw pre-activation out."""
    L = len(ws)
    h = h0
    for l in range(L):
        if dtype is not None:
            out_dtype = dtype if l < L - 1 else jnp.float32
            z = jax.lax.dot_general(
                h.astype(dtype), ws[l].astype(dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype) + bs[l].astype(out_dtype)
        else:
            z = h @ ws[l] + bs[l]
        h = jax.nn.relu(z) if l < L - 1 else z
    return h.astype(jnp.float32)


def _prep(ws, bs, h0, block):
    N, d0 = h0.shape
    L = len(ws)
    in_true, out_true, in_pad, out_pad = _pads(ws)
    assert in_true[0] == d0
    b = block
    n_pad = -(-max(N, 1) // b) * b
    wp = [
        jnp.pad(ws[l].astype(jnp.float32),
                ((0, in_pad[l] - in_true[l]), (0, out_pad[l] - out_true[l])))
        for l in range(L)
    ]
    bp = [
        jnp.pad(bs[l].astype(jnp.float32), (0, out_pad[l] - out_true[l]))[None]
        for l in range(L)
    ]
    h0_p = jnp.pad(h0.astype(jnp.float32), ((0, n_pad - N), (0, in_pad[0] - d0)))
    return n_pad, wp, bp, h0_p, in_true, out_true, in_pad, out_pad


def _fwd_pallas(ws, bs, h0, dtype, block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    N = h0.shape[0]
    L = len(ws)
    b = block
    n_pad, wp, bp, h0_p, in_true, out_true, in_pad, out_pad = _prep(ws, bs, h0, b)
    act = jnp.dtype(dtype) if dtype is not None else jnp.float32
    op = act

    def kernel(*refs):
        h_ref = refs[0]
        w_refs = refs[1:1 + L]
        b_refs = refs[1 + L:1 + 2 * L]
        o_ref = refs[1 + 2 * L]
        A = h_ref[:]
        for l in range(L):
            acc = jax.lax.dot_general(
                A.astype(op), w_refs[l][:].astype(op), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if l < L - 1:
                y = acc.astype(act) + b_refs[l][:].astype(act)
                # Mosaic has no bf16 compare: gate in f32 (exact for relu)
                A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)
            else:
                A = acc + b_refs[l][:]
        o_ref[:] = A.astype(jnp.float32)

    in_specs = [pl.BlockSpec((b, in_pad[0]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for l in range(L):
        in_specs.append(pl.BlockSpec(wp[l].shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for l in range(L):
        in_specs.append(pl.BlockSpec(bp[l].shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    o = pl.pallas_call(
        kernel,
        grid=(n_pad // b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, out_pad[-1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad[-1]), jnp.float32),
        interpret=interpret,
    )(h0_p, *wp, *bp)
    return o[:N, : out_true[-1]]


def _bwd_pallas(ws, bs, h0, co, dtype, block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    N, d0 = h0.shape
    L = len(ws)
    b = block
    n_pad, wp, bp, h0_p, in_true, out_true, in_pad, out_pad = _prep(ws, bs, h0, b)
    act = jnp.dtype(dtype) if dtype is not None else jnp.float32
    op = act
    co_p = jnp.pad(co.astype(jnp.float32),
                   ((0, n_pad - N), (0, out_pad[-1] - co.shape[1])))

    def kernel(*refs):
        (h_ref, co_ref), rest = refs[:2], refs[2:]
        w_refs, rest = rest[:L], rest[L:]
        b_refs, rest = rest[:L], rest[L:]
        dw_refs, rest = rest[:L], rest[L:]
        db_refs, rest = rest[:L], rest[L:]
        dh_ref, rest = rest[0], rest[1:]
        y_refs = rest[: L - 1]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for l in range(L):
                dw_refs[l][:] = jnp.zeros_like(dw_refs[l])
                db_refs[l][:] = jnp.zeros_like(db_refs[l])

        def dot(a, w_, transpose_w=False):
            dims = (((1,), (1,)), ((), ())) if transpose_w else (((1,), (0,)), ((), ()))
            return jax.lax.dot_general(a.astype(op), w_.astype(op), dims,
                                       preferred_element_type=jnp.float32)

        # forward recompute, stashing post-bias pre-relu activations
        # (Mosaic has no bf16 compare: all gates run in f32, exact for relu)
        A = h_ref[:]
        for l in range(L - 1):
            acc = dot(A, w_refs[l][:])
            y = acc.astype(act) + b_refs[l][:].astype(act)
            y_refs[l][:] = y
            A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)

        # reverse sweep
        ct = co_ref[:]
        for l in range(L - 1, -1, -1):
            if l < L - 1:
                y = y_refs[l][:].astype(jnp.float32)
                ct = ct * (y > 0).astype(jnp.float32)
            A_in = (
                h_ref[:]
                if l == 0
                else jnp.maximum(y_refs[l - 1][:].astype(jnp.float32), 0.0)
            )
            dw_refs[l][:] += jax.lax.dot_general(
                A_in.astype(op), ct.astype(op), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            db_refs[l][:] += jnp.sum(ct, axis=0, keepdims=True)
            ct = dot(ct, w_refs[l][:], transpose_w=True)
        dh_ref[:] = ct

    in_specs = [
        pl.BlockSpec((b, in_pad[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, out_pad[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    for l in range(L):
        in_specs.append(pl.BlockSpec(wp[l].shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for l in range(L):
        in_specs.append(pl.BlockSpec(bp[l].shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [
        pl.BlockSpec(wp[l].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for l in range(L)
    ] + [
        pl.BlockSpec(bp[l].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for l in range(L)
    ] + [
        pl.BlockSpec((b, in_pad[0]), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    out_shape = (
        [jax.ShapeDtypeStruct(wp[l].shape, jnp.float32) for l in range(L)]
        + [jax.ShapeDtypeStruct(bp[l].shape, jnp.float32) for l in range(L)]
        + [jax.ShapeDtypeStruct((n_pad, in_pad[0]), jnp.float32)]
    )
    scratch_shapes = [pltpu.VMEM((b, out_pad[l]), act) for l in range(L - 1)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(h0_p, co_p, *wp, *bp)

    dws = [outs[l][: in_true[l], : out_true[l]] for l in range(L)]
    dbs = [outs[L + l][0, : out_true[l]] for l in range(L)]
    dh0 = outs[2 * L][:N, :d0]
    return dws, dbs, dh0


# ---------------------------------------------------------------------------
# Split-operand radiance kernel (v2)
#
# The concatenated-h0 kernel above leaves the XLA-side input assembly in
# place: a bf16 (N, 289) concatenate (0.35 ms/step), the feature split of
# its cotangent (0.20 ms), and the layout copies around the (N, 3) pieces.
# This variant takes the inputs as THREE aligned lane-blocks and splits the
# first layer's weight rows to match, so no wide concat ever materializes:
#
#   n128 (N, 128)  f32   normals on lanes 0-2 (the SDF kernel's grad output
#                        block, normalized lane-wise — never sliced to (N,3))
#   sv   (N, 128)  f32   [points (3) | view-PE (27)] on lanes 0-29
#   feat (N, 256)  act   the SDF kernel's feature output, fed through as-is
#   code (N, 128)  f32   optional per-image latent on lanes 0-31
#
# Z0 = n128 @ W0n + sv @ W0sv + feat @ W0f (+ code @ W0c) + b0. The VJP
# emits dW/db (natural row order), d_normals as the SAME (N, 128) block
# shape, d_feat (N, 256), and optionally d_code — points/view-dir
# cotangents are never formed (stop-gradient'ed data in the reference).
# ---------------------------------------------------------------------------


def _split_w0(w0, ds: int, dn_true: int = 3, code_dim: int = 0):
    """Natural-order W0 rows [points(3), viewPE(ds-3), normals(3), feat(F),
    code(C)] -> per-block padded rows (W0n, W0sv, W0f[, W0c])."""
    d_in, d_out = w0.shape
    F = d_in - ds - dn_true - code_dim
    out_p = _r128(d_out)
    w0n = jnp.zeros((_LANE, out_p), jnp.float32)
    w0n = w0n.at[:dn_true, :d_out].set(w0[ds:ds + dn_true].astype(jnp.float32))
    w0sv = jnp.zeros((_LANE, out_p), jnp.float32)
    w0sv = w0sv.at[:ds, :d_out].set(w0[:ds].astype(jnp.float32))
    w0f = jnp.pad(
        w0[ds + dn_true:ds + dn_true + F].astype(jnp.float32),
        ((0, _r128(F) - F), (0, out_p - d_out)),
    )
    parts = [w0n, w0sv, w0f]
    if code_dim:
        w0c = jnp.zeros((_LANE, out_p), jnp.float32)
        w0c = w0c.at[:code_dim, :d_out].set(
            w0[ds + dn_true + F:].astype(jnp.float32)
        )
        parts.append(w0c)
    return parts


def _merge_dw0(parts, ds: int, d_in: int, d_out: int, dn_true: int = 3,
               code_dim: int = 0):
    """Per-block dW0 grads -> natural row order (d_in, d_out)."""
    F = d_in - ds - dn_true - code_dim
    pieces = [
        parts[1][:ds, :d_out],          # points + viewPE
        parts[0][:dn_true, :d_out],     # normals
        parts[2][:F, :d_out],           # features
    ]
    if code_dim:
        pieces.append(parts[3][:code_dim, :d_out])
    return jnp.concatenate(pieces, axis=0)


def _radiance_fwd_pallas(ws, bs, n128, sv, feat, code, ds, dtype, block,
                         interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    N = n128.shape[0]
    L = len(ws)
    b = block
    n_pad = -(-max(N, 1) // b) * b
    act = jnp.dtype(dtype) if dtype is not None else jnp.float32
    op = act
    code_dim = 0 if code is None else code.shape[1]
    F = feat.shape[1]
    Fp = _r128(F)

    in_true, out_true, in_pad, out_pad = _pads(ws)
    w0_parts = _split_w0(ws[0], ds, 3, code_dim)
    wp = [
        jnp.pad(ws[l].astype(jnp.float32),
                ((0, in_pad[l] - in_true[l]), (0, out_pad[l] - out_true[l])))
        for l in range(1, L)
    ]
    bp = [
        jnp.pad(bs[l].astype(jnp.float32), (0, out_pad[l] - out_true[l]))[None]
        for l in range(L)
    ]

    def rowpad(a, width=None):
        w = a.shape[1] if width is None else width
        return jnp.pad(a, ((0, n_pad - N), (0, w - a.shape[1])))

    n_p = rowpad(n128.astype(jnp.float32))
    sv_p = rowpad(sv.astype(jnp.float32), _LANE)
    f_p = rowpad(feat.astype(act), Fp)
    x_ops = [n_p, sv_p, f_p]
    if code_dim:
        x_ops.append(rowpad(code.astype(jnp.float32), _LANE))
    n_x = len(x_ops)

    def kernel(*refs):
        x_refs = refs[:n_x]
        w0_refs = refs[n_x:n_x + n_x]
        w_refs = refs[n_x + n_x:n_x + n_x + L - 1]
        b_refs = refs[n_x + n_x + L - 1:n_x + n_x + 2 * L - 1]
        o_ref = refs[-1]

        def dot(a, w_):
            return jax.lax.dot_general(
                a.astype(op), w_.astype(op), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = dot(x_refs[0][:], w0_refs[0][:])
        for k in range(1, n_x):
            acc += dot(x_refs[k][:], w0_refs[k][:])
        y = acc.astype(act) + b_refs[0][:].astype(act)
        A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)
        for l in range(1, L):
            acc = dot(A, w_refs[l - 1][:])
            if l < L - 1:
                y = acc.astype(act) + b_refs[l][:].astype(act)
                A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)
            else:
                A = acc + b_refs[l][:]
        o_ref[:] = A.astype(jnp.float32)

    in_specs = (
        [pl.BlockSpec((b, x.shape[1]), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) for x in x_ops]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in w0_parts]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wp]
        + [pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for p in bp]
    )
    o = pl.pallas_call(
        kernel,
        grid=(n_pad // b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, out_pad[-1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad[-1]), jnp.float32),
        interpret=interpret,
    )(*x_ops, *w0_parts, *wp, *bp)
    return o[:N, : out_true[-1]]


def _radiance_bwd_pallas(ws, bs, n128, sv, feat, code, co, ds, dtype, block,
                         interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    N = n128.shape[0]
    L = len(ws)
    b = block
    n_pad = -(-max(N, 1) // b) * b
    act = jnp.dtype(dtype) if dtype is not None else jnp.float32
    op = act
    code_dim = 0 if code is None else code.shape[1]
    F = feat.shape[1]
    Fp = _r128(F)

    in_true, out_true, in_pad, out_pad = _pads(ws)
    w0_parts = _split_w0(ws[0], ds, 3, code_dim)
    wp = [
        jnp.pad(ws[l].astype(jnp.float32),
                ((0, in_pad[l] - in_true[l]), (0, out_pad[l] - out_true[l])))
        for l in range(1, L)
    ]
    bp = [
        jnp.pad(bs[l].astype(jnp.float32), (0, out_pad[l] - out_true[l]))[None]
        for l in range(L)
    ]

    def rowpad(a, width=None):
        w = a.shape[1] if width is None else width
        return jnp.pad(a, ((0, n_pad - N), (0, w - a.shape[1])))

    n_p = rowpad(n128.astype(jnp.float32))
    sv_p = rowpad(sv.astype(jnp.float32), _LANE)
    f_p = rowpad(feat.astype(act), Fp)
    x_ops = [n_p, sv_p, f_p]
    if code_dim:
        x_ops.append(rowpad(code.astype(jnp.float32), _LANE))
    n_x = len(x_ops)
    co_p = rowpad(co.astype(jnp.float32), out_pad[-1])

    # input-cotangent outputs: d_normals always; d_feat always; d_code when
    # present. Points/view-dirs are stop-gradient'ed data -> never formed.
    def kernel(*refs):
        x_refs = refs[:n_x]
        co_ref = refs[n_x]
        rest = refs[n_x + 1:]
        w0_refs, rest = rest[:n_x], rest[n_x:]
        w_refs, rest = rest[:L - 1], rest[L - 1:]
        b_refs, rest = rest[:L], rest[L:]
        dw0_refs, rest = rest[:n_x], rest[n_x:]
        dw_refs, rest = rest[:L - 1], rest[L - 1:]
        db_refs, rest = rest[:L], rest[L:]
        dn_ref, df_ref = rest[0], rest[1]
        rest = rest[2:]
        dc_ref = rest[0] if code_dim else None
        y_refs = (rest[1:] if code_dim else rest)[: L - 1]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for r in list(dw0_refs) + list(dw_refs) + list(db_refs):
                r[:] = jnp.zeros_like(r)

        def dot(a, w_, transpose_w=False):
            dims = (((1,), (1,)), ((), ())) if transpose_w else (((1,), (0,)), ((), ()))
            return jax.lax.dot_general(a.astype(op), w_.astype(op), dims,
                                       preferred_element_type=jnp.float32)

        def dot_accum(a, ct):
            return jax.lax.dot_general(
                a.astype(op), ct.astype(op), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # forward recompute, stashing post-bias pre-relu activations
        acc = dot(x_refs[0][:], w0_refs[0][:])
        for k in range(1, n_x):
            acc += dot(x_refs[k][:], w0_refs[k][:])
        y = acc.astype(act) + b_refs[0][:].astype(act)
        y_refs[0][:] = y
        A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)
        for l in range(1, L - 1):
            acc = dot(A, w_refs[l - 1][:])
            y = acc.astype(act) + b_refs[l][:].astype(act)
            y_refs[l][:] = y
            A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)

        # reverse sweep
        ct = co_ref[:]
        for l in range(L - 1, 0, -1):
            if l < L - 1:
                y = y_refs[l][:].astype(jnp.float32)
                ct = ct * (y > 0).astype(jnp.float32)
            A_in = jnp.maximum(y_refs[l - 1][:].astype(jnp.float32), 0.0)
            dw_refs[l - 1][:] += dot_accum(A_in, ct)
            db_refs[l][:] += jnp.sum(ct, axis=0, keepdims=True)
            ct = dot(ct, w_refs[l - 1][:], transpose_w=True)
        y = y_refs[0][:].astype(jnp.float32)
        ct = ct * (y > 0).astype(jnp.float32)
        for k in range(n_x):
            dw0_refs[k][:] += dot_accum(x_refs[k][:], ct)
        db_refs[0][:] += jnp.sum(ct, axis=0, keepdims=True)
        dn_ref[:] = dot(ct, w0_refs[0][:], transpose_w=True)
        df_ref[:] = dot(ct, w0_refs[2][:], transpose_w=True).astype(
            df_ref.dtype
        )
        if code_dim:
            dc_ref[:] = dot(ct, w0_refs[3][:], transpose_w=True)

    in_specs = (
        [pl.BlockSpec((b, x.shape[1]), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) for x in x_ops]
        + [pl.BlockSpec((b, out_pad[-1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in w0_parts]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wp]
        + [pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for p in bp]
    )
    out_specs = (
        [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for w in w0_parts]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wp]
        + [pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for p in bp]
        + [pl.BlockSpec((b, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec((b, Fp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + ([pl.BlockSpec((b, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)] if code_dim else [])
    )
    out_shape = (
        [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w0_parts]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wp]
        + [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in bp]
        + [jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
           jax.ShapeDtypeStruct((n_pad, Fp), act)]
        + ([jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32)]
           if code_dim else [])
    )
    scratch_shapes = [pltpu.VMEM((b, out_pad[l]), act) for l in range(L - 1)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*x_ops, co_p, *w0_parts, *wp, *bp)

    n_x_ = n_x
    dw0 = _merge_dw0(list(outs[:n_x_]), ds, in_true[0], out_true[0], 3,
                     code_dim)
    dws = [dw0] + [
        outs[n_x_ + l][: in_true[l + 1], : out_true[l + 1]]
        for l in range(L - 1)
    ]
    dbs = [outs[n_x_ + L - 1 + l][0, : out_true[l]] for l in range(L)]
    dn = outs[n_x_ + 2 * L - 1][:N]
    df = outs[n_x_ + 2 * L][:N, :F]
    dc = outs[n_x_ + 2 * L + 1][:N, :code_dim] if code_dim else None
    return dws, dbs, dn, df, dc


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def radiance_split(ws, bs, n128, sv, feat, code, ds: int, dtype_name: str,
                   block: int):
    """Split-operand radiance trunk: raw last-layer pre-activation (N, 3).

    ws/bs: EFFECTIVE weights, natural row order [points+viewPE (ds), normals
    (3), features, code]. n128 (N, 128) normals on lanes 0-2; sv (N, <=128)
    [points | viewPE]; feat (N, F); code (N, C) or None.

    The VJP emits weight/bias grads, d_normals as the same (N, 128) block,
    d_feat (N, F), d_code — and NO points/view cotangent (stop-gradient'ed
    data in every reference loss, network.py:502-624)."""
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    return _radiance_fwd_pallas(list(ws), list(bs), n128, sv, feat, code, ds,
                                dtype, block, None)


def _rs_fwd(ws, bs, n128, sv, feat, code, ds, dtype_name, block):
    out = radiance_split(ws, bs, n128, sv, feat, code, ds, dtype_name, block)
    return out, (ws, bs, n128, sv, feat, code)


def _rs_bwd(ds, dtype_name, block, res, co):
    ws, bs, n128, sv, feat, code = res
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    dws, dbs, dn, df, dc = _radiance_bwd_pallas(
        list(ws), list(bs), n128, sv, feat, code, co, ds, dtype, block, None
    )
    return (
        tuple(dw.astype(w.dtype) for dw, w in zip(dws, ws)),
        tuple(db.astype(b_.dtype) for db, b_ in zip(dbs, bs)),
        dn.astype(n128.dtype),
        jnp.zeros_like(sv),
        df.astype(feat.dtype),
        None if code is None else dc.astype(code.dtype),
    )


radiance_split.defvjp(_rs_fwd, _rs_bwd)


# ---------------------------------------------------------------------------
# Wide-I/O radiance kernel (v3): in-kernel gradient normalization
#
# Takes the SDF kernel's RAW (N, 128) gradient block (wide_grad=True) and
# normalizes it in-kernel (reference monosdf.py guarded-norm semantics:
# n = g / (sqrt(max(|g|^2, 1e-24)) + 1e-6)), emitting BOTH the radiance and
# the normalized normals as wide blocks. The VJP sums the two normal-
# consumer cotangents (radiance input + normal_map) and runs the normalize
# backward in-kernel, returning d_g at the same (N, 128) width — the whole
# gradient path flows kernel-to-kernel with no (N, 3) slice/pad/normalize
# chain on the XLA side (~1 ms/step of layout glue at 1024 rays).
# ---------------------------------------------------------------------------


def _normalize_wide(g):
    """Guarded lane-wise normalization of a (b, 128) grad block (lanes 0-2
    data, rest zero): n = g / (sqrt(max(sum g^2, 1e-24)) + 1e-6)."""
    s = jnp.sum(g * g, axis=1, keepdims=True)
    q = jnp.sqrt(jnp.maximum(s, 1e-24)) + 1e-6
    return g / q, s, q


def _radiance_norm_fwd_pallas(ws, bs, g128, sv, feat, code, ds, dtype, block,
                              interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    N = g128.shape[0]
    L = len(ws)
    b = block
    n_pad = -(-max(N, 1) // b) * b
    act = jnp.dtype(dtype) if dtype is not None else jnp.float32
    op = act
    code_dim = 0 if code is None else code.shape[1]
    F = feat.shape[1]
    Fp = _r128(F)

    in_true, out_true, in_pad, out_pad = _pads(ws)
    w0_parts = _split_w0(ws[0], ds, 3, code_dim)
    wp = [
        jnp.pad(ws[l].astype(jnp.float32),
                ((0, in_pad[l] - in_true[l]), (0, out_pad[l] - out_true[l])))
        for l in range(1, L)
    ]
    bp = [
        jnp.pad(bs[l].astype(jnp.float32), (0, out_pad[l] - out_true[l]))[None]
        for l in range(L)
    ]

    def rowpad(a, width=None):
        w = a.shape[1] if width is None else width
        return jnp.pad(a, ((0, n_pad - N), (0, w - a.shape[1])))

    # g stays f32 (the in-kernel normalization needs full precision);
    # sv/cotangents ship at the act dtype — every in-kernel use casts to
    # the matmul operand dtype anyway, and the pads/copies halve at bf16
    g_p = rowpad(g128.astype(jnp.float32), _LANE)
    sv_p = rowpad(sv.astype(act), _LANE)
    f_p = rowpad(feat.astype(act), Fp)
    x_ops = [g_p, sv_p, f_p]
    if code_dim:
        x_ops.append(rowpad(code.astype(jnp.float32), _LANE))
    n_x = len(x_ops)

    def kernel(*refs):
        x_refs = refs[:n_x]
        w0_refs = refs[n_x:2 * n_x]
        w_refs = refs[2 * n_x:2 * n_x + L - 1]
        b_refs = refs[2 * n_x + L - 1:2 * n_x + 2 * L - 1]
        o_ref, nrm_ref = refs[-2], refs[-1]

        def dot(a, w_):
            return jax.lax.dot_general(
                a.astype(op), w_.astype(op), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        n, _, _ = _normalize_wide(x_refs[0][:])
        nrm_ref[:] = n
        acc = dot(n, w0_refs[0][:])
        for k in range(1, n_x):
            acc += dot(x_refs[k][:], w0_refs[k][:])
        y = acc.astype(act) + b_refs[0][:].astype(act)
        A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)
        for l in range(1, L):
            acc = dot(A, w_refs[l - 1][:])
            if l < L - 1:
                y = acc.astype(act) + b_refs[l][:].astype(act)
                A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)
            else:
                A = acc + b_refs[l][:]
        o_ref[:] = A.astype(jnp.float32)

    in_specs = (
        [pl.BlockSpec((b, x.shape[1]), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) for x in x_ops]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in w0_parts]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wp]
        + [pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for p in bp]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, out_pad[-1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, out_pad[-1]), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
        ],
        interpret=interpret,
    )(*x_ops, *w0_parts, *wp, *bp)
    return outs[0][:N, : out_true[-1]], outs[1][:N]


def _radiance_norm_bwd_pallas(ws, bs, g128, sv, feat, code, co, cn, ds,
                              dtype, block, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    N = g128.shape[0]
    L = len(ws)
    b = block
    n_pad = -(-max(N, 1) // b) * b
    act = jnp.dtype(dtype) if dtype is not None else jnp.float32
    op = act
    code_dim = 0 if code is None else code.shape[1]
    F = feat.shape[1]
    Fp = _r128(F)

    in_true, out_true, in_pad, out_pad = _pads(ws)
    w0_parts = _split_w0(ws[0], ds, 3, code_dim)
    wp = [
        jnp.pad(ws[l].astype(jnp.float32),
                ((0, in_pad[l] - in_true[l]), (0, out_pad[l] - out_true[l])))
        for l in range(1, L)
    ]
    bp = [
        jnp.pad(bs[l].astype(jnp.float32), (0, out_pad[l] - out_true[l]))[None]
        for l in range(L)
    ]

    def rowpad(a, width=None):
        w = a.shape[1] if width is None else width
        return jnp.pad(a, ((0, n_pad - N), (0, w - a.shape[1])))

    # g stays f32 (the in-kernel normalization needs full precision);
    # sv/cotangents ship at the act dtype — every in-kernel use casts to
    # the matmul operand dtype anyway, and the pads/copies halve at bf16
    g_p = rowpad(g128.astype(jnp.float32), _LANE)
    sv_p = rowpad(sv.astype(act), _LANE)
    f_p = rowpad(feat.astype(act), Fp)
    x_ops = [g_p, sv_p, f_p]
    if code_dim:
        x_ops.append(rowpad(code.astype(jnp.float32), _LANE))
    n_x = len(x_ops)
    co_p = rowpad(co.astype(act), out_pad[-1])
    cn_p = rowpad(cn.astype(act), _LANE)

    def kernel(*refs):
        x_refs = refs[:n_x]
        co_ref, cn_ref = refs[n_x], refs[n_x + 1]
        rest = refs[n_x + 2:]
        w0_refs, rest = rest[:n_x], rest[n_x:]
        w_refs, rest = rest[:L - 1], rest[L - 1:]
        b_refs, rest = rest[:L], rest[L:]
        dw0_refs, rest = rest[:n_x], rest[n_x:]
        dw_refs, rest = rest[:L - 1], rest[L - 1:]
        db_refs, rest = rest[:L], rest[L:]
        dg_ref, df_ref = rest[0], rest[1]
        rest = rest[2:]
        dc_ref = rest[0] if code_dim else None
        y_refs = (rest[1:] if code_dim else rest)[: L - 1]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for r in list(dw0_refs) + list(dw_refs) + list(db_refs):
                r[:] = jnp.zeros_like(r)

        def dot(a, w_, transpose_w=False):
            dims = (((1,), (1,)), ((), ())) if transpose_w else (((1,), (0,)), ((), ()))
            return jax.lax.dot_general(a.astype(op), w_.astype(op), dims,
                                       preferred_element_type=jnp.float32)

        def dot_accum(a, ct):
            return jax.lax.dot_general(
                a.astype(op), ct.astype(op), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # forward recompute with the in-kernel normalization
        g = x_refs[0][:]
        n, s, q = _normalize_wide(g)
        acc = dot(n, w0_refs[0][:])
        for k in range(1, n_x):
            acc += dot(x_refs[k][:], w0_refs[k][:])
        y = acc.astype(act) + b_refs[0][:].astype(act)
        y_refs[0][:] = y
        A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)
        for l in range(1, L - 1):
            acc = dot(A, w_refs[l - 1][:])
            y = acc.astype(act) + b_refs[l][:].astype(act)
            y_refs[l][:] = y
            A = jnp.maximum(y.astype(jnp.float32), 0.0).astype(act)

        # reverse sweep through the trunk
        ct = co_ref[:]
        for l in range(L - 1, 0, -1):
            if l < L - 1:
                yv = y_refs[l][:].astype(jnp.float32)
                ct = ct * (yv > 0).astype(jnp.float32)
            A_in = jnp.maximum(y_refs[l - 1][:].astype(jnp.float32), 0.0)
            dw_refs[l - 1][:] += dot_accum(A_in, ct)
            db_refs[l][:] += jnp.sum(ct, axis=0, keepdims=True)
            ct = dot(ct, w_refs[l - 1][:], transpose_w=True)
        yv = y_refs[0][:].astype(jnp.float32)
        ct = ct * (yv > 0).astype(jnp.float32)
        # layer-0 weight grads need the actual matmul inputs (n for block 0)
        dw0_refs[0][:] += dot_accum(n, ct)
        for k in range(1, n_x):
            dw0_refs[k][:] += dot_accum(x_refs[k][:], ct)
        db_refs[0][:] += jnp.sum(ct, axis=0, keepdims=True)
        df_ref[:] = dot(ct, w0_refs[2][:], transpose_w=True).astype(
            df_ref.dtype
        )
        if code_dim:
            dc_ref[:] = dot(ct, w0_refs[3][:], transpose_w=True)

        # normalize backward: total normal cotangent = normal_map branch +
        # radiance-input branch, then d_g = c/q - g * (<c,g> / (q^2 r)) [s>eps]
        dn = cn_ref[:] + dot(ct, w0_refs[0][:], transpose_w=True)
        r = jnp.sqrt(jnp.maximum(s, 1e-24))
        live = (s > 1e-24).astype(jnp.float32)
        dot_cg = jnp.sum(dn * g, axis=1, keepdims=True)
        dg_ref[:] = dn / q - g * (dot_cg / (q * q * r)) * live

    in_specs = (
        [pl.BlockSpec((b, x.shape[1]), lambda i: (i, 0),
                      memory_space=pltpu.VMEM) for x in x_ops]
        + [pl.BlockSpec((b, out_pad[-1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((b, _LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in w0_parts]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wp]
        + [pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for p in bp]
    )
    out_specs = (
        [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for w in w0_parts]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in wp]
        + [pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for p in bp]
        + [pl.BlockSpec((b, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
           pl.BlockSpec((b, Fp), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + ([pl.BlockSpec((b, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)] if code_dim else [])
    )
    out_shape = (
        [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w0_parts]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wp]
        + [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in bp]
        + [jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32),
           jax.ShapeDtypeStruct((n_pad, Fp), act)]
        + ([jax.ShapeDtypeStruct((n_pad, _LANE), jnp.float32)]
           if code_dim else [])
    )
    scratch_shapes = [pltpu.VMEM((b, out_pad[l]), act) for l in range(L - 1)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*x_ops, co_p, cn_p, *w0_parts, *wp, *bp)

    dw0 = _merge_dw0(list(outs[:n_x]), ds, in_true[0], out_true[0], 3,
                     code_dim)
    dws = [dw0] + [
        outs[n_x + l][: in_true[l + 1], : out_true[l + 1]]
        for l in range(L - 1)
    ]
    dbs = [outs[n_x + L - 1 + l][0, : out_true[l]] for l in range(L)]
    dg = outs[n_x + 2 * L - 1][:N]
    df = outs[n_x + 2 * L][:N, :F]
    dc = outs[n_x + 2 * L + 1][:N, :code_dim] if code_dim else None
    return dws, dbs, dg, df, dc


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def radiance_norm(ws, bs, g128, sv, feat, code, ds: int, dtype_name: str,
                  block: int):
    """Wide-I/O radiance trunk with IN-KERNEL gradient normalization.

    g128 (N, 128): the SDF kernel's raw gradient block (wide_grad=True).
    Returns (rgb_pre (N, 3), normals128 (N, 128) f32). The VJP sums the
    cotangents of both normal consumers and emits d_g at (N, 128) — feed
    it straight back as the SDF kernel's c_grad."""
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    return _radiance_norm_fwd_pallas(list(ws), list(bs), g128, sv, feat,
                                     code, ds, dtype, block, None)


def _rn_fwd(ws, bs, g128, sv, feat, code, ds, dtype_name, block):
    out = radiance_norm(ws, bs, g128, sv, feat, code, ds, dtype_name, block)
    return out, (ws, bs, g128, sv, feat, code)


def _rn_bwd(ds, dtype_name, block, res, cts):
    ws, bs, g128, sv, feat, code = res
    co, cn = cts
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    dws, dbs, dg, df, dc = _radiance_norm_bwd_pallas(
        list(ws), list(bs), g128, sv, feat, code, co, cn, ds, dtype, block,
        None,
    )
    return (
        tuple(dw.astype(w.dtype) for dw, w in zip(dws, ws)),
        tuple(db.astype(b_.dtype) for db, b_ in zip(dbs, bs)),
        dg.astype(g128.dtype),
        jnp.zeros_like(sv),
        df.astype(feat.dtype),
        None if code is None else dc.astype(code.dtype),
    )


radiance_norm.defvjp(_rn_fwd, _rn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mlp_with_input_grad(ws, bs, h0, dtype_name: str, block: int):
    """ReLU-MLP forward (raw last-layer pre-activation) with a Pallas
    hand-written VJP producing weight, bias AND input cotangents.

    ws/bs: tuples of EFFECTIVE per-layer weights/biases. h0 (N, d0).
    dtype_name: '' for f32, else e.g. 'bfloat16' (apply_linear mixed mode).
    """
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    return _fwd_pallas(list(ws), list(bs), h0, dtype, block, None)


def _fwd(ws, bs, h0, dtype_name, block):
    out = mlp_with_input_grad(ws, bs, h0, dtype_name, block)
    return out, (ws, bs, h0)


def _bwd(dtype_name, block, res, co):
    ws, bs, h0 = res
    dtype = jnp.dtype(dtype_name) if dtype_name else None
    dws, dbs, dh0 = _bwd_pallas(list(ws), list(bs), h0, co, dtype, block, None)
    return (
        tuple(dw.astype(w.dtype) for dw, w in zip(dws, ws)),
        tuple(db.astype(b_.dtype) for db, b_ in zip(dbs, bs)),
        dh0.astype(h0.dtype),
    )


mlp_with_input_grad.defvjp(_fwd, _bwd)
