"""Pallas TPU scatter-accumulate for the hash-grid FOLD backward.

XLA's scatter-add on the v5e runs at ~12.8 ns per SCALAR regardless of index
distribution or row width (measured, scripts/probe_hash_primitives.py) — a
serialized lowering ~2500x off the random-access HBM roofline. This kernel
replaces it for the grid-mode table-gradient accumulation (the measured wall
of grid-mode training; the reference pays ~1 ms for the same updates with a
CUDA ``atomicAdd`` backward, hashencoder.cu:257-343):

* the fold backward (ops/hashgrid.py ``_quad_take_fold``) already collapses
  the 8 corner updates per (point, level) into ONE (8C)-channel row at the
  base cell index;
* each level's accumulator lives entirely in VMEM, packed ``P = 128 // (8C)``
  logical rows per physical (1, 128) row so the lane dimension is full;
* update values are pre-placed (one one-hot MXU/VPU contraction per level)
  at lane offset ``8C * (idx % P)`` so the kernel's inner loop is a clean
  full-lane read-modify-write at dynamic sublane ``idx // P``;
* indices stream through SMEM in grid-blocked chunks, values through VMEM;
  the accumulator block is revisited every grid step (constant index_map)
  and written back to HBM once.

Determinism: updates are applied in stream order within one core — fully
deterministic, unlike the reference's atomicAdd (SURVEY.md §5 race notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 1024


def _rmw_kernel(chunk: int, idx_ref, val_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, carry):
        r = idx_ref[j]
        out_ref[pl.ds(r, 1), :] += val_ref[pl.ds(j, 1), :].astype(jnp.float32)
        return carry

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _level_scatter(idx8, placed, rows_pad: int, interpret: bool):
    """Accumulate ``placed`` (N, 128) rows at dynamic sublane ``idx8`` (N,)
    into a zero-initialized (rows_pad, 128) f32 VMEM accumulator."""
    n = idx8.shape[0]
    assert n % _CHUNK == 0
    grid = n // _CHUNK
    return pl.pallas_call(
        functools.partial(_rmw_kernel, _CHUNK),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_CHUNK, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_pad, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )(idx8, placed)


def fold_scatter_table(row0, u_vals, cfg, interpret: bool | None = None):
    """Fold-scatter the per-(point, level) update rows into the full table.

    row0:   (L, B) int32 absolute table rows (level offsets included).
    u_vals: (L, B, 8C) update rows (any float dtype; accumulated in f32).
    Returns U (table_size, 8C) f32 — the same U the XLA fold scatter builds
    (ops/hashgrid.py ``_quad_take_fold``); the caller applies the corner
    rolls.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    L, B, W = u_vals.shape
    C = cfg.level_dim
    assert W == 8 * C
    assert 128 % W == 0, "8*level_dim must divide 128 lanes"
    P = 128 // W  # logical rows per physical (1, 128) row

    n = ((B + _CHUNK - 1) // _CHUNK) * _CHUNK
    pad = n - B

    levels = cfg.level_params()
    blocks = []
    for li, (off, hms, _, _) in enumerate(levels):
        local = row0[li] - off  # (B,) in [0, hms)
        sub = local % P
        r8 = local // P
        rows8 = (hms + P - 1) // P
        # physical rows padded to the f32 sublane tile (8) + 1 trash row
        # for the chunk-padding updates
        rows_pad = ((rows8 + 1 + 7) // 8) * 8
        oh = jax.nn.one_hot(sub, P, dtype=u_vals.dtype)  # (B, P)
        placed = jnp.einsum("bp,bw->bpw", oh, u_vals[li]).reshape(B, 128)
        if pad:
            r8 = jnp.concatenate(
                [r8, jnp.full((pad,), rows8, jnp.int32)], axis=0
            )
            placed = jnp.concatenate(
                [placed, jnp.zeros((pad, 128), placed.dtype)], axis=0
            )
        acc = _level_scatter(r8.astype(jnp.int32), placed, rows_pad, interpret)
        blocks.append(acc[:rows8].reshape(rows8 * P, W)[:hms])
    return jnp.concatenate(blocks, axis=0)
