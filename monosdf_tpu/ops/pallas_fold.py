"""Pallas kernels for the hash-grid fold backward and quad-table build.

Round-3 profiling showed the corner-affine fold backward's XLA glue (the
8 static per-level rolls over narrow (hms, C) table slices) costs ~100 ms
of the 361 ms grids step, and the quad-table build another ~30 ms — both
pure data movement that XLA executes through 2-of-128-lane views (the
"narrow-lane disease" of CLAUDE.md, 64x physical traffic). These kernels
do the same movement entirely in 128-lane form:

* every logical shift becomes a STATIC 0/1 lane-permute matmul (the MXU is
  the TPU's lane-shuffle engine) plus a row-offset,
* the per-level fold accumulates into a small VMEM scratch (~4.5 MB),
* the backward's scatter target uses a PHASE-PLANE row permutation
  (cells with the same ``(cell//8) % 8`` land in one contiguous plane) so
  every kernel read is a contiguous block — no strided slices, which
  probe wave 7 measured as pathologically slow in Mosaic.

Only the 2^19-hashmap levels go through the kernels (all hashed levels of
the flagship schedule share hms AND the additive shifts, so one kernel
instance serves all of them); dense levels keep the XLA path.

Reference semantics being reproduced: the hand-written CUDA backward's
per-corner atomicAdd accumulation (hashencoder.cu:257-343) and the
forward's 8-corner lookup (hashencoder.cu:103-254) — here as the
transpose/build of the corner-duplicated quad table (ops/hashgrid.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# =========================================================================
# Row-index permutations (shared contract between scatter/gather and the
# kernels; all pure index arithmetic on int32 arrays)
# =========================================================================


def fold_plane_rows(local, hms):
    """Plane-permuted packed row for the fold scatter: cell ``local`` of a
    level goes to plane ``(local//8) % 8``, in-plane row ``local//64``.
    Returns the row within the level's (hms//8)-row block."""
    R = hms // 64
    return ((local // 8) % 8) * R + local // 64


def quad_plane_row(local, hms):
    """Permuted quad-table row (in the level's hms-row block) under the
    4-plane build layout: cell j at plane (j//16)%4, in-plane row j//64,
    slot j%16."""
    return ((local // 16) % 4) * (hms // 4) + (local // 64) * 16 + local % 16


# =========================================================================
# Static matrix builders
# =========================================================================


@functools.lru_cache(maxsize=8)
def _fold_groups(deltas, hms):
    """For each input plane p, the list of (row_offset, matrix_index) pairs
    plus the stacked (G, 128, 128) f32 matrices implementing

        d[j, c] = sum_q U[(j - dq) mod hms, 16*(cell%8-of-source) + 2q + c]

    (the scatter puts each update at its BASE cell; corner q's block folds
    back to cell b + dq, so output cell j reads source cell j - dq) on the
    plane-separated packed input (see module docstring).
    Output row = in-plane row + Delta (mod hms//64)."""
    R = hms // 64
    acc: dict[tuple[int, int], np.ndarray] = {}
    for q, dq in enumerate(deltas):
        A, phi = divmod((-int(dq)) % hms, 8)
        for l in range(128):
            u, c = divmod(l, 2)
            beta = (u + phi) // 8
            k = (u + phi) % 8
            sigma = 16 * k + 2 * q + c
            p = (A + beta) % 8
            delta = (-((A + beta) // 8)) % R
            key = (p, delta)
            if key not in acc:
                acc[key] = np.zeros((128, 128), np.float32)
            acc[key][sigma, l] += 1.0
    keys = sorted(acc.keys())
    mats = np.stack([acc[k] for k in keys])
    plane_items = [[] for _ in range(8)]
    for gi, (p, delta) in enumerate(keys):
        plane_items[p].append((delta, gi))
    return plane_items, mats


@functools.lru_cache(maxsize=8)
def _build_groups(corner_deltas, hms):
    """For the quad build: out plane m, lane l = 8*k' + 2*delta_corner + c
    reads master flat position 2*(cell + d_corner) + c. Groups keyed by the
    source-row offset t = d//64 + carry; matrices (t, m) -> (128, 128)."""
    acc: dict[tuple[int, int], np.ndarray] = {}
    for delta_c, d in enumerate(corner_deltas):
        d = int(d) % hms
        A, phi = divmod(d, 64)
        for m in range(4):
            for kp in range(16):
                for c in range(2):
                    l = 8 * kp + 2 * delta_c + c
                    val = 32 * m + 2 * kp + 2 * phi + c
                    eps, sigma = divmod(val, 128)
                    t = A + eps
                    key = (t, m)
                    if key not in acc:
                        acc[key] = np.zeros((128, 128), np.float32)
                    acc[key][sigma, l] += 1.0
    keys = sorted(acc.keys())
    mats = np.stack([acc[k] for k in keys])
    items = [(t, m, gi) for gi, (t, m) in enumerate(keys)]
    return items, mats


# =========================================================================
# Fold kernel: plane-separated packed scatter table -> per-level gradient
# =========================================================================


def fold_hash_levels(u8h: jnp.ndarray, deltas, hms: int, tb: int = 512,
                     interpret: bool | None = None) -> jnp.ndarray:
    """u8h: (n_levels, 8, hms//64, 128) f32 — the plane-permuted packed
    scatter output for the uniform-hms hashed levels. Returns
    (n_levels, hms//64, 128) f32: the packed per-level table gradient
    (flat view of (hms, 2) per level).

    Grid iterates (level, in-plane tile); each step sees the SAME tile
    offset of all 8 planes (one 4-D block), so the per-plane matrix lists
    stay static. The OUTPUT block (extended by tb cyclic-tail rows) is the
    accumulator — VMEM is only 16 MB on the v5e, so a separate full-level
    scratch plus a resident out block doesn't fit; the tail fold happens in
    two wide XLA adds after the call.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n_levels = u8h.shape[0]
    R = hms // 64
    assert u8h.shape == (n_levels, 8, R, 128), u8h.shape
    assert R % tb == 0, (R, tb)
    n_tiles = R // tb
    plane_items, mats_np = _fold_groups(tuple(int(d) for d in deltas), hms)
    # pack each plane's matrices side by side for the one-wide-matmul form
    max_g = max(len(v) for v in plane_items) if plane_items else 1
    wide_np = np.zeros((8, 128, max_g * 128), np.float32)
    for p, items_p in enumerate(plane_items):
        for s, (_, gi) in enumerate(items_p):
            wide_np[p, :, 128 * s:128 * (s + 1)] = mats_np[gi]
    mats = jnp.asarray(wide_np)

    def kernel(u_ref, m_ref, out_ref):
        i = pl.program_id(0)
        j = i % n_tiles
        o0 = j * tb

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        zpad = jnp.zeros((8, 128), jnp.float32)
        for p in range(8):
            blk = u_ref[0, p]
            n_g = len(plane_items[p])
            if not n_g:
                continue
            # ONE wide matmul per plane (K=128, N=n_g*128 keeps the MXU
            # busy; n_g separate (tb,128)@(128,128) calls do not), then
            # n_g shifted accumulations of its lane slices
            contribs = jax.lax.dot(
                blk, m_ref[p], preferred_element_type=jnp.float32
            )
            for s, (delta, _) in enumerate(plane_items[p]):
                contrib = contribs[:, 128 * s:128 * (s + 1)]
                # Mosaic requires dynamic sublane starts provably 8-aligned
                # (f32 tiling): split delta into an aligned base plus a
                # static residual applied as a sublane roll of the padded
                # contribution (the pad rows land where the roll wraps)
                rho = delta % 8
                start8 = 8 * jax.lax.rem((o0 + delta - rho) // 8, R // 8)
                start8 = pl.multiple_of(start8, 8)
                buf = jnp.concatenate([contrib, zpad], axis=0)
                if rho:
                    buf = pltpu.roll(buf, rho, axis=0)
                cur = out_ref[0, pl.ds(start8, tb + 8), :]
                out_ref[0, pl.ds(start8, tb + 8), :] = cur + buf

    ext = pl.pallas_call(
        kernel,
        grid=(n_levels * n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, tb, 128),
                lambda i: (i // n_tiles, 0, i % n_tiles, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R + tb, 128),
            lambda i: (i // n_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_levels, R + tb, 128), jnp.float32),
        interpret=interpret,
    )(u8h, mats)
    head = ext[:, :tb] + ext[:, R:R + tb]
    return jnp.concatenate([head, ext[:, tb:R]], axis=1)


def fold_hash_levels_xla(u8h, deltas, hms):
    """Pure-jnp oracle for fold_hash_levels (tests only).

    u8h[lv, p, w, 16*k + ch] holds channel ch of cell 64*w + 8*p + k;
    the fold is d[j, c] = sum_q U[(j - dq) % hms, 2q + c].
    """
    n_levels = u8h.shape[0]
    R = hms // 64
    out = []
    for lv in range(n_levels):
        U = (
            u8h[lv]
            .reshape(8, R, 8, 16)
            .transpose(1, 0, 2, 3)  # [w, p, k, ch]
            .reshape(hms, 16)
        )
        d = jnp.zeros((hms, 2), jnp.float32)
        for q, dq in enumerate(deltas):
            d = d + jnp.roll(U[:, 2 * q:2 * q + 2], int(dq) % hms, axis=0)
        out.append(d.reshape(R, 128))
    return jnp.stack(out)


def build_quad_hash_xla(masterp, corner_deltas, hms):
    """Pure-jnp oracle for build_quad_hash (tests only)."""
    n_levels = masterp.shape[0]
    R = hms // 64
    out = []
    for lv in range(n_levels):
        T = masterp[lv].reshape(hms, 2)
        quad = jnp.concatenate(
            [jnp.roll(T, -(int(d) % hms), axis=0) for d in corner_deltas],
            axis=-1,
        )  # (hms, 8): cell j -> [T[j], T[j+1], T[j+s1], T[j+s1+1]]
        j = np.arange(hms)
        perm = quad_plane_row(j, hms)
        planes = jnp.zeros((hms, 8), quad.dtype).at[perm].set(quad)
        out.append(planes.reshape(4, R, 128))
    return jnp.stack(out)


# =========================================================================
# Quad-build kernel: packed master level -> 4-plane quad table
# =========================================================================


def build_quad_hash(masterp: jnp.ndarray, corner_deltas, hms: int,
                    tb: int = 1024, interpret: bool | None = None) -> jnp.ndarray:
    """custom_jvp front end for _build_quad_hash_impl: the build is LINEAR
    in the table, so its JVP is the build of the tangent (exact; dead
    tangent builds are DCE'd). Without this, tracing the pallas_call under
    jax.grad's forward pass trips Pallas-internal grid-context asserts."""
    f = _build_quad_jvp(tuple(int(d) for d in corner_deltas), hms, tb,
                        interpret)
    return f(masterp)


@functools.lru_cache(maxsize=16)
def _build_quad_jvp(corner_deltas, hms, tb, interpret):
    @jax.custom_jvp
    def f(m):
        return _build_quad_hash_impl(m, corner_deltas, hms, tb, interpret)

    @f.defjvp
    def _jvp(primals, tangents):
        (m,), (dm,) = primals, tangents
        return f(m), f(dm)

    return f


def _build_quad_hash_impl(masterp: jnp.ndarray, corner_deltas, hms: int,
                          tb: int = 1024,
                          interpret: bool | None = None) -> jnp.ndarray:
    """masterp: (n_levels, hms//64, 128) table-dtype — packed flat view of
    the (hms, 2) master table per hashed level. Returns
    (n_levels, 4, hms//64, 128): the plane-permuted packed quad table
    (cell j of plane (j//16)%4 at in-plane row j//64, lanes 8*(j%16)+ch).

    corner_deltas: the 4 quad corner offsets (0, 1, s1, s1+1).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n_levels = masterp.shape[0]
    R = hms // 64
    assert masterp.shape == (n_levels, R, 128), masterp.shape
    assert R % tb == 0
    n_tiles = R // tb
    items, mats_np = _build_groups(tuple(int(d) for d in corner_deltas), hms)
    dt = masterp.dtype
    # regroup by source-row offset t and pack the 4 output planes' matrices
    # side by side: one wide matmul per window. Matrices stay f32 (the
    # window is cast to f32 in-kernel anyway — Mosaic cannot rotate
    # non-32-bit data).
    by_t: dict[int, list] = {}
    for t, m, gi in items:
        by_t.setdefault(t, []).append((m, gi))
    tlist = sorted(by_t)
    wide_np = np.zeros((len(tlist), 128, 512), np.float32)
    for ti, t in enumerate(tlist):
        for m, gi in by_t[t]:
            wide_np[ti, :, 128 * m:128 * (m + 1)] = mats_np[gi]
    mats = jnp.asarray(wide_np)

    # extend each level by tb+8 rows (cyclic head) so shifted reads stay
    # in-bounds: aligned start <= R-8, window tb+8 <= R + tb
    ext = jnp.concatenate([masterp, masterp[:, :tb + 8]], axis=1)

    def kernel(m_ref, w_ref, out_ref):
        i = pl.program_id(0)
        o0 = (i % n_tiles) * tb
        planes = [jnp.zeros((tb, 128), jnp.float32) for _ in range(4)]
        for ti, t in enumerate(tlist):
            # aligned dynamic read + static sublane roll (see fold kernel)
            rho = t % 8
            start8 = 8 * jax.lax.rem((o0 + t - rho) // 8, R // 8)
            start8 = pl.multiple_of(start8, 8)
            window = m_ref[0, pl.ds(start8, tb + 8), :].astype(jnp.float32)
            if rho:
                # cyclic roll by (size - rho) == roll by -rho; the wrapped
                # head rows land past row tb and are sliced away. f32 cast
                # first: Mosaic cannot rotate non-32-bit data.
                window = pltpu.roll(window, tb + 8 - rho, axis=0)
            window = window[:tb]
            # one (tb,128)@(128,512) matmul per source window covers all 4
            # output planes (absent (t, m) pairs are zero columns)
            prod = jax.lax.dot(
                window, w_ref[ti], preferred_element_type=jnp.float32
            )
            for m in range(4):
                planes[m] = planes[m] + prod[:, 128 * m:128 * (m + 1)]
        for m in range(4):
            out_ref[0, m] = planes[m].astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n_levels * n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, R + tb, 128),
                lambda i: (i // n_tiles, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, tb, 128),
            lambda i: (i // n_tiles, 0, i % n_tiles, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_levels, 4, R, 128), dt),
        interpret=interpret,
    )(ext, mats)
