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
