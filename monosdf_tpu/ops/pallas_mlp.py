"""Pallas TPU kernel: fused SDF-MLP forward.

The error-bounded sampler evaluates the SDF network on ~650k points per
step with NO gradient flow (reference ray_sampler.py:130-131 runs under
torch.no_grad). XLA executes that as one HBM round-trip per layer
(~650k x 256 x 4B written+read between every matmul). This kernel keeps the
ENTIRE MLP in VMEM: weights (~2 MB for 8x256 layers) are loaded once and
stay resident across grid steps; per-block activations never leave VMEM, so
HBM traffic drops to reading the input points and writing one SDF scalar
per point.

Scope: inference-only (plain pallas_call, no custom VJP) — exactly the
sampler's no-grad sweep. The differentiated main forward keeps the jnp path
(autodiff + its reverse-over-forward eikonal semantics).

Layout notes (see /opt/skills/guides/pallas_guide.md):
* all feature dims padded to 128-lane multiples; padded weight rows/cols are
  zero so padding is semantically inert;
* matmuls via jnp.dot with preferred_element_type=f32 (MXU), activations
  softplus(beta=100) on the VPU;
* skip layers concatenate the (padded) embedded input / sqrt(2) exactly like
  the jnp path (reference network.py:88-89).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

_LANE = 128


def _pad_to(x: np.ndarray | jnp.ndarray, rows: int, cols: int):
    r, c = x.shape
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


def _softplus100(x):
    # softplus with beta=100 (reference network.py:77): overflow-safe
    return jnp.where(x > 0.2, x, jnp.log1p(jnp.exp(100.0 * jnp.minimum(x, 0.2))) / 100.0)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def pe_consts(multires: int, d0p: int):
    """Constant operands for computing the positional encoding (and its three
    basis-direction tangents) INSIDE a kernel from raw xyz lanes.

    Feeding kernels raw points instead of precomputed embeddings removes the
    (N, d0p) [and (3N, d0p) tangent] HBM round-trips plus the XLA-side trig /
    relayout work; in-kernel the encoding is one MXU op + one sin/cos pair.

    Returns (G, coefs):
    * ``G`` (LANE, d0p) f32: ``xs = x_pad @ G`` replicates each coordinate
      into its sin/cos lanes pre-scaled by the frequency. Scales are powers
      of two, so the products are EXACT in f32 (same mantissa) even through
      the MXU's split-float passes — use precision=HIGHEST.
    * ``coefs`` (16, d0p) f32 assembly rows (zero on pad lanes):
        emb = coefs[0]*xs + coefs[1]*sin(xs) + coefs[2]*cos(xs)
        t_k = coefs[3+3k] + coefs[4+3k]*cos(xs) + coefs[5+3k]*sin(xs)
      matching ops/embedder.py's layout [x, sin(2^0 x), cos(2^0 x), ...] and
      its per-coordinate derivative (d sin(fx)/dx = f cos(fx), etc.).
    """
    G = np.zeros((_LANE, d0p), np.float32)
    coefs = np.zeros((16, d0p), np.float32)
    for d in range(3):
        G[d, d] = 1.0
        coefs[0, d] = 1.0  # emb raw lane passes xs through
        coefs[3 + 3 * d, d] = 1.0  # t_d raw lane constant
    for f in range(multires):
        fr = float(2.0**f)
        for part in range(2):  # 0 = sin block, 1 = cos block
            for d in range(3):
                lane = 3 + 6 * f + 3 * part + d
                G[d, lane] = fr
                if part == 0:
                    coefs[1, lane] = 1.0  # emb sin mask
                    coefs[4 + 3 * d, lane] = fr  # t_d: +f*cos on sin lanes
                else:
                    coefs[2, lane] = 1.0  # emb cos mask
                    coefs[5 + 3 * d, lane] = -fr  # t_d: -f*sin on cos lanes
    # numpy in, jnp out per call: caching jnp arrays would leak tracers
    return jnp.asarray(G), jnp.asarray(coefs)


def positional_encoding_lanepad(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """XLA-side positional encoding emitted DIRECTLY at the 128-lane padded
    width a Pallas kernel consumes (pad lanes zero).

    ops/embedder.py's positional_encoding produces (N, 39) which XLA then
    lane-pads with a separate copy + pad op per consumer (~0.15 ms each at
    the sweep's 131k points); computing ``xs = x @ G[:3]`` (scales are
    powers of two — exact at HIGHEST precision) and assembling with the
    same pe_consts rows yields the (N, d0p) array natively. Bitwise equal
    to positional_encoding on the true lanes."""
    d0 = 3 * (1 + 2 * multires)
    d0p = _round_up(d0, _LANE)
    G, coefs = pe_consts(multires, d0p)
    xs = jax.lax.dot_general(
        x, G[:3], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return coefs[0:1] * xs + coefs[1:2] * jnp.sin(xs) + coefs[2:3] * jnp.cos(xs)


def positional_encoding_lanepad_sin(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Lane-padded positional encoding with ONE transcendental pass.

    positional_encoding_lanepad costs sin+cos over all 128 lanes (7x the
    39-lane encoding's transcendentals, measured +1.5 ms/step). This
    variant folds cos into the same sin via phase: on cos lanes the matmul
    produces f*x and a +pi/2 phase is added, so ``sin(xs + phase)`` covers
    both sin and cos lanes — 128 sin calls/point vs the 39-lane path's 78
    sin+cos, and the (N, 39) -> (N, 128) pad + layout copy per consumer
    disappears.

    NOT bitwise equal to positional_encoding: sin(f x + pi/2) differs from
    cos(f x) by ~1 ulp of the (rounded) phase add. Use only where a ~1e-7
    relative deviation is acceptable (the sampler's bf16 sweeps)."""
    d0 = 3 * (1 + 2 * multires)
    d0p = _round_up(d0, _LANE)
    G, coefs = pe_consts(multires, d0p)
    phase = (jnp.pi / 2.0) * coefs[2:3]  # +pi/2 on cos lanes only
    xs = jax.lax.dot_general(
        x, G[:3], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    sin_mask = coefs[1:2] + coefs[2:3]  # 1 on sin AND cos lanes
    return coefs[0:1] * xs + sin_mask * jnp.sin(xs + phase)


def kernel_pe(x_blk, G, coefs, tangents: bool):
    """In-kernel positional encoding from raw-xyz lanes.

    x_blk (b, LANE) with lanes 0-2 = xyz; returns emb (b, d0p) or, with
    ``tangents``, (emb, [t0, t1, t2]) — the embedding's basis-direction
    tangents (each (b, d0p))."""
    xs = jax.lax.dot_general(
        x_blk, G, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    s = jnp.sin(xs)
    c = jnp.cos(xs)
    emb = coefs[0:1] * xs + coefs[1:2] * s + coefs[2:3] * c
    if not tangents:
        return emb
    ts = [
        coefs[3 + 3 * k : 4 + 3 * k]
        + coefs[4 + 3 * k : 5 + 3 * k] * c
        + coefs[5 + 3 * k : 6 + 3 * k] * s
        for k in range(3)
    ]
    return emb, ts


def fused_sdf_mlp(
    weights: list,
    biases: list,
    x_embedded: jnp.ndarray,
    skip_in: tuple,
    block: int = 512,
    interpret: bool | None = None,
    dtype=None,
    multires: int | None = None,
    d0_true: int | None = None,
) -> jnp.ndarray:
    """Run the SDF MLP on embedded inputs (or raw points).

    weights[l]: (d_l, d_{l+1}) EFFECTIVE weights (weight-norm already
    applied); biases[l]: (d_{l+1},). x_embedded: (N, d_0) the PE(+grid)
    features — or, with ``multires`` set, raw (N, 3) points whose positional
    encoding is computed IN-KERNEL (pe_consts/kernel_pe; saves the (N, d0p)
    embedding HBM round-trip and the XLA-side trig). With ``d0_true`` set,
    x_embedded is ALREADY lane-padded to round_up(d0_true, 128) with zero
    pad lanes (positional_encoding_lanepad) — skips the XLA-side pad.
    skip_in: layer indices where the input is re-concatenated (reference
    network.py:88-89). Returns (N, d_last) — caller slices sdf/features.

    All activations up to the last layer get softplus(beta=100); the last
    layer is linear (reference network.py:79-96).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    n_layers = len(weights)
    if multires is not None:
        d0 = 3 * (1 + 2 * multires)
    elif d0_true is not None:
        d0 = d0_true
        assert x_embedded.shape[-1] == _round_up(d0, _LANE)
    else:
        d0 = x_embedded.shape[-1]
    d0p = _round_up(d0, _LANE)
    dims = [d0] + [w.shape[1] for w in weights]

    # per-layer true/padded widths (a uniform max width would make every
    # hidden matmul as wide as the skip-concat layer — 1.5x wasted MXU work,
    # and 3x on the final layer when the caller only reads the SDF column)
    in_dims = []
    d = d0
    for l in range(n_layers):
        if l in skip_in:
            d = dims[l] + d0  # concat with embedded input
        in_dims.append(d)
        d = dims[l + 1]
    in_pad = [_round_up(d, _LANE) for d in in_dims]
    out_pad = [_round_up(dims[l + 1], _LANE) for l in range(n_layers)]

    wp = [
        _pad_to(jnp.asarray(w, jnp.float32), in_pad[l], out_pad[l])
        for l, w in enumerate(weights)
    ]
    bp = [
        jnp.pad(jnp.asarray(b, jnp.float32), (0, out_pad[l] - b.shape[0]))[None]
        for l, b in enumerate(biases)
    ]

    N = x_embedded.shape[0]
    n_pad = _round_up(max(N, 1), block)
    if multires is not None:
        x_p = jnp.pad(
            x_embedded.astype(jnp.float32), ((0, n_pad - N), (0, _LANE - 3))
        )
        G, coefs = pe_consts(multires, d0p)
        pe_ops = [G, coefs]
    else:
        # ship the embedding at the compute dtype: the kernel casts matmul
        # operands there anyway, and the (N, 39) -> (N, 128) pad + layout
        # copy per sweep halves at bf16 (~0.4 ms/step over 5 sweeps)
        in_dtype = jnp.dtype(dtype) if dtype is not None else jnp.float32
        x_p = jnp.pad(
            x_embedded.astype(in_dtype),
            ((0, n_pad - N), (0, d0p - x_embedded.shape[-1])),
        )
        pe_ops = []

    sqrt2 = math.sqrt(2.0)
    skip_set = tuple(skip_in)
    n_pe = len(pe_ops)

    def kernel(x_ref, *refs):
        pe_refs = refs[:n_pe]
        refs = refs[n_pe:]
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers : 2 * n_layers]
        out_ref = refs[2 * n_layers]
        if multires is not None:
            x0 = kernel_pe(x_ref[:], pe_refs[0][:], pe_refs[1][:], tangents=False)
        else:
            x0 = x_ref[:]  # (block, d0p)
        h = x0
        width = d0
        for l in range(n_layers):
            if l in skip_set:
                # concat [h, x0]/sqrt(2); re-pad to the layer's input lanes
                cat = jnp.concatenate([h[:, :width], x0[:, :d0]], axis=-1)
                cat = jnp.pad(cat, ((0, 0), (0, in_pad[l] - width - d0)))
                h = cat / sqrt2
                width = width + d0
            wl = w_refs[l][:]
            hl = h[:, : wl.shape[0]]
            if dtype is not None:
                hl, wl = hl.astype(dtype), wl.astype(dtype)
            acc = jnp.dot(hl, wl, preferred_element_type=jnp.float32)
            acc = acc + b_refs[l][:]
            width = dims[l + 1]
            if l < n_layers - 1:
                acc = _softplus100(acc)
            # zero the padded lanes so later skips/matmuls stay exact
            # (identity when the layer fills its padded width)
            if width == acc.shape[1]:
                h = acc
            else:
                lane_idx = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
                h = jnp.where(lane_idx < width, acc, 0.0)
        out_ref[:] = h.astype(out_ref.dtype)

    grid = (n_pad // block,)
    in_specs = [
        pl.BlockSpec(
            (block, _LANE if multires is not None else d0p),
            lambda i: (i, 0), memory_space=pltpu.VMEM,
        )
    ]
    for op in pe_ops:
        in_specs.append(
            pl.BlockSpec(op.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for w in wp:
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    for b in bp:
        in_specs.append(
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block, out_pad[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        # the sweeps' consumer (the error-bound machinery) reads ONE lane of
        # this array — emit at the compute dtype to halve the HBM read
        # (values already passed through bf16 matmuls when dtype is set)
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, out_pad[-1]),
            jnp.dtype(dtype) if dtype is not None else jnp.float32,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_p, *pe_ops, *wp, *bp)
    return out[:N, : dims[-1]].astype(jnp.float32)


def fused_sdf_mlp_nograd(
    weights: list,
    biases: list,
    x_embedded: jnp.ndarray,
    skip_in: tuple,
    block: int = 512,
    dtype=None,
    multires: int | None = None,
    d0_true: int | None = None,
) -> jnp.ndarray:
    """AD-opaque fused MLP: pallas_call has no JVP rule, and the sampler
    caller stop-gradients the result anyway — declare a zero tangent so the
    kernel can live inside a differentiated program."""

    @jax.custom_jvp
    def f(ws, bs, x):
        return fused_sdf_mlp(
            ws, bs, x, skip_in, block=block, dtype=dtype, multires=multires,
            d0_true=d0_true,
        )

    @f.defjvp
    def f_jvp(primals, tangents):
        out = f(*primals)
        return out, jnp.zeros_like(out)

    return f(weights, biases, x_embedded)


def effective_linear_weights(params: dict, num_layers: int):
    """Resolve weight-norm (g, v) parameterization into effective (W, b)
    lists for the fused kernel (matches nn.apply_linear)."""
    ws, bs = [], []
    for l in range(num_layers - 1):
        p = params[f"lin{l}"]
        if "v" in p:
            v = p["v"]
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            w = v * (p["g"][None, :] / (norm + 1e-16))
        else:
            w = p["w"]
        ws.append(w)
        bs.append(p["b"])
    return ws, bs
