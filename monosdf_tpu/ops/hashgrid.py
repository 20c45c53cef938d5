"""Multiresolution hash-grid encoding (Instant-NGP style, smoothstep interp).

Pure-JAX implementation of the reference CUDA encoder
(code/hashencoder/src/hashencoder.cu + hashgrid.py):

* per-level scale ``exp2(level*S)*H - 1`` with S = log2(per_level_scale)
  (hashencoder.cu:152-153)
* dense linear indexing while ``res^D <= hashmap_size``, else xor-prime hash
  (hashencoder.cu:35-72)
* **smoothstep** corner weights ``s(v)=v^2(3-2v)`` — C^1, so second
  derivatives exist (hashencoder.cu:87-93); this is what lets the eikonal
  loss differentiate through the encoder
* inputs outside [0,1]^D produce zero output and zero gradient
  (hashencoder.cu:124-149)

Because this is plain jnp, JAX autodiff provides the first AND second
backward passes that the reference hand-writes in CUDA
(hashencoder.cu:257-595) — gradients scatter-add into the table via XLA's
deterministic segment-sum. A fused Pallas kernel can be slotted behind the
same API; this function is the parity oracle for it.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)
# Additive-scheme multipliers: the xor primes reduced mod 2^19. For every
# power-of-two hashmap level (all hashed levels of the flagship schedule)
# ``(y * p) % 2^k == (y * (p % 2^k)) % 2^k`` — identical mixing — while the
# reduced values keep ``x + y*P1 + z*P2`` below 2^32 for coords <= 2048, so
# uint32 arithmetic is exact and ``% hms`` is a true mod for ANY level size.
_ADD_MULTS = (1, 2654435761 % (1 << 19), 805459861 % (1 << 19))


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    per_level_scale: float = 2.0
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int | None = 2048
    # gather the table in this dtype. Measured on a v5e: the TPU row-gather
    # costs ~6.6 ns/row at 8B rows and ~4.6 ns/row at 4B rows (bf16 2ch) —
    # a 1.4x sweep-gather win; the corner combine stays f32 and the table
    # GRADIENT still accumulates in f32 (see _table_take).
    table_dtype: str = "float32"
    # Backward (table-gradient) scatter encoding (measured in scripts/
    # probe_hash_primitives.py on a v5e, 12.8M updates): XLA scatter-add of
    # (N, 2) f32 rows runs at ~62 ns/row ('rows', 807 ms) and is insensitive
    # to sorted/unique hints or batching; SCALAR rows run at ~12.8 ns, so
    # 'flat' (one scalar f32 scatter per channel, 2x ~165 ms) is the fastest
    # exact encoding. (A 'c64' complex64-packed encoding measured 1910 ms —
    # XLA decomposes complex scatters pathologically — and was removed in
    # round 4; PERFORMANCE.md keeps the record.)
    # 'fold' (quad/oct layouts only): the corner-AFFINE backward — one
    # (8C)-channel row per (point, level) at the base cell index, folded
    # with 8 static per-level rolls (see _quad_take_fold) — 8x fewer
    # scatter rows than the per-corner encodings, f32 gradients even for
    # bf16 tables. (The round-3 'fold_pallas' VMEM-RMW variant measured
    # 330 ns/update and was removed in round 4; see PERFORMANCE.md.)
    scatter_impl: str = "flat"
    # Corner-index scheme. 'xor' is the reference hash (hashencoder.cu:54-72).
    # 'add' replaces the xor mix with ``x + y*P1 + z*P2 (mod hms)`` — for
    # power-of-two hash levels this is the same family of multiplicative
    # mixing, and it makes the index AFFINE in the corner offsets, which is
    # what the 'quad' layout needs. Dense levels are identical under both.
    hash_scheme: str = "xor"
    # Table layout for the gather. 'rows': gather one (C,)-row per corner
    # (8 x L rows/point). 'quad': gather from a derived corner-duplicated
    # table whose row j packs the 4 (x0/x1, y0/y1) corner entries of cell j
    # — 2 rows of 4C channels per level-point. 'oct': row j packs ALL 8
    # corner entries — ONE row of 8C channels per level-point. Measured on
    # a v5e the row gather is latency-bound per ROW, nearly independent of
    # row width (probe waves 2/5), so quad cuts the sweep gather ~3x vs
    # rows and oct halves it again. 'quad'/'oct' require hash_scheme='add'.
    layout: str = "rows"
    # Round-4 Pallas kernels for the fold backward's roll/unpack glue and
    # the quad-table build (ops/pallas_fold.py): 'xla' keeps the in-graph
    # narrow-lane forms; 'pallas' routes the uniform-hms hashed levels
    # through 128-lane kernels (static lane-permute matmuls + VMEM
    # accumulation). fold_impl='pallas' requires scatter_impl='fold' and
    # layout='quad'; build_impl='pallas' additionally plane-permutes the
    # hashed levels' quad rows (the gather indices follow automatically).
    fold_impl: str = "xla"
    build_impl: str = "xla"
    # Store the master table parameter as ONE flat f32[(T*C,)] vector
    # (row-major flattening of the logical (T, C) table — checkpoint
    # moments stay bit-compatible since the fused optimizer ravels
    # anyway). The round-4 grids profile showed ~40 ms/step of 64x-padded
    # {1,0:T(8,128)} materializations of the (6.1M, 2) leaf around the
    # gradient assembly + Adam apply; with a 1-D leaf every elementwise
    # touch is dense. The quad build/fold kernels consume flat natively;
    # narrow (hms, C) views survive only for the small dense levels and
    # the non-flagship rows/oct paths.
    param_flat: bool = False
    # Split every fold-path table row-gather into K independent takes of
    # N/K rows (static slices of the index vector, concatenated after).
    # Probe wave 7 measured K=4 independent takes ~12% faster than one
    # (45.8 vs 52.0 ms for the same 4.2M rows) and XLA can overlap the
    # pieces with trunk compute independently. 1 = single take.
    gather_chunks: int = 1
    # Serve the sampler's coarse-level-only NO-GRAD sweeps
    # (MonoSDFConfig.sweep_max_level = K) from a derived OCT table of the
    # first K levels, built once per step alongside the quad cache: ONE
    # 8C-channel row per (point, level) instead of quad's two 4C rows —
    # the v5e row gather is latency-bound per ROW (probe waves 2/5), so
    # this halves the sweep-gather rows, the measured wall of the grids
    # step. Values are identical to the quad gather (same corners, same
    # weights; exactness-tested), so quality evidence transfers. 0 = off;
    # set equal to sweep_max_level (quad main layout only).
    sweep_oct_levels: int = 0

    @property
    def scale(self) -> float:
        if self.desired_resolution is not None:
            return float(
                np.exp2(
                    np.log2(self.desired_resolution / self.base_resolution)
                    / (self.num_levels - 1)
                )
            )
        return float(self.per_level_scale)

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def level_params(self):
        """Static per-level (offset, hashmap_size, resolution, scale) table
        (reference hashgrid.py:127-149 + hashencoder.cu:151-153)."""
        max_params = 2**self.log2_hashmap_size
        S = np.log2(self.scale)
        out = []
        offset = 0
        for lvl in range(self.num_levels):
            res_alloc = int(np.ceil(self.base_resolution * self.scale**lvl))
            params_in_level = min(max_params, res_alloc**self.input_dim)
            fscale = float(np.exp2(lvl * S) * self.base_resolution - 1.0)
            res_kernel = int(np.ceil(fscale)) + 1
            out.append((offset, params_in_level, res_kernel, fscale))
            offset += params_in_level
        return out

    @property
    def table_size(self) -> int:
        levels = self.level_params()
        off, size, _, _ = levels[-1]
        return off + size


def init_hashgrid(key, cfg: HashGridConfig) -> dict:
    """Embeddings ~ U(-1e-4, 1e-4) (reference hashgrid.py:147-149).
    With cfg.param_flat the same values ship as a row-major 1-D vector."""
    emb = jax.random.uniform(
        key, (cfg.table_size, cfg.level_dim), minval=-1e-4, maxval=1e-4
    )
    if cfg.param_flat:
        emb = emb.reshape(-1)
    return {"embeddings": emb}


def _emb2d(emb: jnp.ndarray, C: int) -> jnp.ndarray:
    """The logical (T, C) view of a possibly-flat embeddings leaf (pays a
    relayout on TPU — flagship paths avoid it and slice the flat vector)."""
    return emb.reshape(-1, C) if emb.ndim == 1 else emb


def _smoothstep(v):
    return v * v * (3.0 - 2.0 * v)


def _table_take(emb: jnp.ndarray, idx: jnp.ndarray, scatter_impl: str):
    """Row-gather ``emb[idx]`` with a custom-transpose scatter encoding.

    ``jax.custom_derivatives.linear_call`` keeps the op linear in ``emb``:
    forward-mode (the sdf spatial gradient's ``jax.linearize``) passes
    through untouched, reverse-mode uses our transpose, and the transpose's
    transpose is the gather again — so the eikonal grad-of-grad still
    traces, replacing the reference's hand-written second CUDA backward
    (hashencoder.cu:375-595).

    The transpose replaces XLA's default (N, C)-row scatter-add (measured
    ~62 ns/row on v5e) with scalar-row encodings (~12.8 ns/row). (A 'c64'
    encoding — both channels packed into one complex64 scalar — measured
    1910 ms/12.8M updates, XLA decomposes complex scatters pathologically;
    removed in round 4, record in PERFORMANCE.md.)
    """
    from jax.custom_derivatives import linear_call

    T, C = emb.shape

    def fwd(ix, e):
        return jnp.take(e, ix, axis=0)

    def bwd(ix, ct):  # ct: (N, C) in emb.dtype -> d_emb (T, C)
        ctf = ct.astype(jnp.float32)
        if scatter_impl == "flat":
            cols = [
                jnp.zeros((T,), jnp.float32).at[ix].add(
                    ctf[:, c], mode="promise_in_bounds"
                )
                for c in range(C)
            ]
            d = jnp.stack(cols, axis=-1)
        elif scatter_impl == "rows":  # XLA's native (N, C) row scatter
            d = jnp.zeros((T, C), jnp.float32).at[ix].add(
                ctf, mode="promise_in_bounds"
            )
        else:
            # fail loudly: a stale conf (e.g. the removed 'c64') silently
            # routing into 'rows' would run a measured-5x-slower path
            raise ValueError(
                f"unknown scatter_impl {scatter_impl!r} for the per-corner "
                "gather; valid here: 'flat', 'rows' ('fold' requires "
                "layout='quad'/'oct'; 'c64' was removed in round 4)"
            )
        return d.astype(emb.dtype)

    return linear_call(fwd, bwd, idx, emb)


def _chunked_take(table: jnp.ndarray, ix: jnp.ndarray, chunks: int):
    """``table[ix]`` as ``chunks`` independent row-gathers over static
    slices of the index vector (see HashGridConfig.gather_chunks). Exact:
    concatenation of the per-chunk takes in order."""
    if chunks <= 1:
        return jnp.take(table, ix, axis=0)
    n = ix.shape[0]
    bounds = [n * k // chunks for k in range(chunks + 1)]
    return jnp.concatenate(
        [
            jnp.take(table, ix[bounds[k]:bounds[k + 1]], axis=0)
            for k in range(chunks)
        ],
        axis=0,
    )


def _corner_index(pos_grid, hashmap_size: int, resolution: int, dense: bool):
    """pos_grid: (..., D) int32 corner coordinates -> flat table index (...,).

    Dense linear index when the level grid fits the table, else xor-prime
    hash; both reduced modulo hashmap_size (hashencoder.cu:54-72). Arithmetic
    is uint32 with natural wraparound, like the CUDA kernel.
    """
    pg = pos_grid.astype(jnp.uint32)
    if dense:
        D = pos_grid.shape[-1]
        strides = jnp.asarray(
            [resolution**d for d in range(D)], dtype=jnp.uint32
        )
        index = jnp.sum(pg * strides, axis=-1)
    else:
        primes = jnp.asarray(_PRIMES[: pos_grid.shape[-1]], dtype=jnp.uint32)
        index = pg[..., 0] * primes[0]
        for d in range(1, pos_grid.shape[-1]):
            index = index ^ (pg[..., d] * primes[d])
    return (index % jnp.uint32(hashmap_size)).astype(jnp.int32)


def _level_shifts(cfg: HashGridConfig):
    """Per-level affine corner strides (s1, s2) for the 'add' scheme:
    idx(x, y, z) = (x + y*s1 + z*s2) mod hms. Dense levels use the linear
    strides (res, res^2) — identical to the reference's dense rule; hashed
    levels use the reduced multiplicative constants (see _ADD_MULTS)."""
    out = []
    for off, hms, res, _ in cfg.level_params():
        if res ** cfg.input_dim <= hms:
            out.append((res, res * res))
        else:
            out.append((_ADD_MULTS[1] % hms, _ADD_MULTS[2] % hms))
    return out


def build_quad_table(params: dict, cfg: HashGridConfig) -> jnp.ndarray:
    """Derive the corner-duplicated gather table: (table_size, 4*C), where
    row j of level block l packs the entries of the 4 (x0/x1, y0/y1)
    corners of cell-row j: [T[j], T[j+1], T[j+s1], T[j+s1+1]] (cyclic per
    level, matching the additive index's mod-hms wraparound).

    Rebuilt from the master table every step: 16 static slices + rolls +
    one concat — pure sequential HBM bandwidth (~100 MB at bf16 for the
    flagship table), vs the ~6 ns/row cost of every random gather row it
    saves. Differentiable: the roll/concat transpose folds the duplicated
    gradient back into the master table automatically.
    """
    assert cfg.hash_scheme == "add", "quad layout requires the additive scheme"
    emb = params["embeddings"]
    C = cfg.level_dim
    flat = emb.ndim == 1
    shifts = _level_shifts(cfg)
    blocks = []
    for (off, hms, _, _), (s1, _) in zip(cfg.level_params(), shifts):
        # flat leaf: slice first, reshape the level block only (see
        # build_oct_table's layout note)
        if flat:
            blk = jax.lax.slice_in_dim(
                emb, C * off, C * (off + hms), axis=0
            ).reshape(hms, C)
        else:
            blk = jax.lax.slice_in_dim(emb, off, off + hms, axis=0)
        if cfg.table_dtype != "float32":
            blk = blk.astype(jnp.dtype(cfg.table_dtype))
        blocks.append(
            jnp.concatenate(
                [
                    # plain jnp.roll: in the BUILD the narrow (hms, C) roll
                    # is a compact HBM copy; the flat-wide variant pays a
                    # wide->narrow relayout per piece (probe wave 6:
                    # 30 -> 139 ms). _roll_rows is for the fold path only,
                    # where rolls feed WIDE adds.
                    blk,
                    jnp.roll(blk, -1, axis=0),
                    jnp.roll(blk, -(s1 % hms), axis=0),
                    jnp.roll(blk, -((s1 + 1) % hms), axis=0),
                ],
                axis=-1,
            )
        )
    return jnp.concatenate(blocks, axis=0)  # (T, 4C)


def _oct_deltas(s1: int, s2: int, hms: int):
    """Corner offsets, affine in the base cell index, in the channel-block
    order used by every fold/oct structure: z0 xy-corners then z1."""
    return tuple(
        d % hms
        for d in (0, 1, s1, s1 + 1, s2, s2 + 1, s1 + s2, s1 + s2 + 1)
    )


def _hash_group(cfg: HashGridConfig):
    """The uniform tail of hashed levels: (h0, n_hash, hms, (s1, s2)).

    All hashed levels of a schedule share hashmap_size (= 2^log2_hashmap_size)
    and the additive shifts (_ADD_MULTS mod hms), so one Pallas kernel
    instance serves the whole group. Returns n_hash = 0 when there is no
    eligible group (then callers keep the XLA path)."""
    levels = cfg.level_params()
    shifts = _level_shifts(cfg)
    D = cfg.input_dim
    h0 = next(
        (i for i, lv in enumerate(levels) if lv[2] ** D > lv[1]), len(levels)
    )
    if h0 == len(levels):
        return h0, 0, 0, (0, 0)
    hms = levels[h0][1]
    if any(lv[1] != hms for lv in levels[h0:]) or hms % 64 != 0:
        return len(levels), 0, 0, (0, 0)
    return h0, len(levels) - h0, hms, shifts[h0]


def _pick_tb(R: int) -> int:
    # 512 keeps the fold kernel's resident set (extended out block + 8-plane
    # input tile + matrices) comfortably under the v5e's 16 MB VMEM
    tb = min(512, R)
    while R % tb:
        tb //= 2
    return max(tb, 1)


def _kernels_eligible(cfg: HashGridConfig) -> bool:
    if cfg.level_dim != 2 or cfg.hash_scheme != "add":
        return False
    _, n_hash, _, _ = _hash_group(cfg)
    return n_hash > 0


def _roll_rows(x: jnp.ndarray, delta: int) -> jnp.ndarray:
    """Cyclic roll of the ROWS of a narrow (N, C) array, computed in a flat
    128-lane view when shapes allow.

    A (2^19, 2) table slice occupies 2 of 128 physical lanes, so a naive
    ``jnp.roll`` (and every other elementwise op on it) moves 64x its
    logical bytes — measured 117 ms of the grid backward's 164 ms fold
    transpose (probe wave 6). In the flat row-major view (N*C/128, 128) the
    same roll is: out_flat[k] = in_flat[k - delta*C], i.e. two WIDE row
    rolls (by q and q+1, q = (delta*C)//128), a lane rotation by r =
    (delta*C)%128, and a lane select — ~5 full-lane ops on 1/64th the
    physical traffic."""
    n, C = x.shape
    s = (delta % n) * C
    if s == 0:
        return x
    if (n * C) % 128 != 0:
        return jnp.roll(x, delta, axis=0)  # small odd-sized dense levels
    return _roll_flat(x.reshape(-1, 128), s).reshape(n, C)


def _roll_flat(flat: jnp.ndarray, s: int) -> jnp.ndarray:
    """Roll a flattened row-major sequence viewed as (M, 128) by s slots."""
    M = flat.shape[0]
    s = s % (M * 128)
    q, r = divmod(s, 128)
    a = jnp.roll(flat, q, axis=0)
    if r == 0:
        return a
    b = jnp.roll(flat, q + 1, axis=0)
    ar = jnp.roll(a, r, axis=1)
    br = jnp.roll(b, r, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return jnp.where(lane >= r, ar, br)


def _fold_transpose(cfg: HashGridConfig, row0, u_vals, out_dtype,
                    flat: bool = False):
    """The corner-affine FOLD scatter: transpose of an 8-corner gather.

    row0 (L, B): absolute base table rows; u_vals (L, B, 8C): per-corner
    cotangent blocks in _oct_deltas order. Scatters ONE row per (point,
    level) at the base index into an intermediate table U, then folds the 8
    corner blocks back with static per-level ``jnp.roll``s — 8x fewer
    scatter rows than the per-corner encoding, the measured wall of
    grid-mode training (the reference pays ~1 ms for the same updates with
    CUDA atomicAdd, hashencoder.cu:257-343).

    Scatter encoding (probe wave 4 on the v5e): XLA's row scatter costs
    ~120 ns/row at 16 channels but ~37 ns/row at 128 — so pack
    P = 128/(8C) logical table rows per physical row, pre-place each
    update's 8C channels at lane offset 8C*(local % P), and scatter one
    (N, 128) f32 row at packed row local//P. (The round-3 Pallas VMEM-RMW
    variant measured 330 ns/update and was removed in round 4 —
    PERFORMANCE.md keeps the record.) Accumulation is f32 end-to-end even
    for bf16 tables.
    """
    L, C = cfg.num_levels, cfg.level_dim
    levels = cfg.level_params()
    shifts = _level_shifts(cfg)
    if cfg.scatter_impl == "fold_pallas":
        raise ValueError(
            "scatter_impl='fold_pallas' (the Pallas VMEM-RMW scatter, "
            "measured 330 ns/update) was removed in round 4 — superseded "
            "by fold_impl='pallas' (ops/pallas_fold.py); record in "
            "PERFORMANCE.md"
        )

    u_vals = u_vals.astype(jnp.float32)
    W = 8 * C
    assert 128 % W == 0, (
        f"scatter_impl='fold' requires 8*level_dim to divide 128 "
        f"(level_dim={C} gives row width {W})"
    )
    if cfg.fold_impl == "pallas" and _kernels_eligible(cfg):
        return _fold_transpose_mixed(cfg, row0, u_vals, out_dtype, flat)
    blocks = _fold_xla_blocks(levels, shifts, row0, u_vals, C)
    d = jnp.concatenate(blocks, axis=0).astype(out_dtype)
    return d.reshape(-1) if flat else d


def _fold_xla_blocks(levels, shifts, row0, u_vals, C):
    """The in-graph XLA fold for a list of levels: packed 128-lane scatter
    + 8 narrow rolls per level. row0 (L, B) ABSOLUTE rows (master-table
    offsets of the FULL schedule included); u_vals (L, B, 8C) f32.
    Returns per-level (hms, C) f32 blocks.

    NOTE (probe wave 6 + full-step A/B): in ISOLATION the narrow (hms, C)
    rolls/adds cost 64x their logical traffic and a flat-wide rewrite
    measured 164 -> 86 ms — but IN-GRAPH XLA fuses the narrow rolls into
    shifted-read fusions and the wide rewrite's transposes act as fusion
    barriers: full grids step 361 ms (narrow) vs 430 ms (wide). The narrow
    form is kept for these levels; the uniform hashed group goes through
    the 128-lane Pallas kernel instead (ops/pallas_fold.py).
    """
    if not levels:
        return []
    W = 8 * C
    P = 128 // W
    off8 = []
    t8 = 0
    for _, hms, _, _ in levels:
        off8.append(t8)
        t8 += (hms + P - 1) // P
    off_arr = jnp.asarray([lv[0] for lv in levels], jnp.int32)
    off8_arr = jnp.asarray(off8, jnp.int32)
    local = row0 - off_arr[:, None]  # (L, B) in [0, hms)
    sub = local % P
    r8 = local // P + off8_arr[:, None]
    oh = jax.nn.one_hot(sub, P, dtype=jnp.float32)  # (L, B, P)
    placed = jnp.einsum("lbp,lbw->lbpw", oh, u_vals).reshape(-1, 128)
    U8 = jnp.zeros((t8, 128), jnp.float32).at[r8.reshape(-1)].add(
        placed, mode="promise_in_bounds"
    )
    blocks = []
    for li, ((off, hms, _, _), (s1, s2)) in enumerate(zip(levels, shifts)):
        rows8 = (hms + P - 1) // P
        U8l = jax.lax.slice_in_dim(U8, off8[li], off8[li] + rows8)
        Ul = U8l.reshape(rows8 * P, W)[:hms]
        d = jnp.zeros((hms, C), jnp.float32)
        for q, dq in enumerate(_oct_deltas(s1, s2, hms)):
            d = d + jnp.roll(Ul[:, q * C:(q + 1) * C], dq, axis=0)
        blocks.append(d)
    return blocks


def _fold_transpose_mixed(cfg: HashGridConfig, row0, u_vals, out_dtype,
                          flat: bool = False):
    """Fold transpose with the uniform hashed tail on the Pallas kernel
    (plane-permuted packed scatter + static lane-permute matmuls,
    ops/pallas_fold.py) and the dense prefix on the XLA path."""
    from .pallas_fold import fold_hash_levels, fold_plane_rows

    C = cfg.level_dim
    levels = cfg.level_params()
    shifts = _level_shifts(cfg)
    h0, n_hash, hms, (s1, s2) = _hash_group(cfg)

    blocks = _fold_xla_blocks(
        levels[:h0], shifts[:h0], row0[:h0], u_vals[:h0], C
    )

    R = hms // 64
    rows8 = 8 * R
    off_h = jnp.asarray([lv[0] for lv in levels[h0:]], jnp.int32)
    local = row0[h0:] - off_h[:, None]  # (n_hash, B)
    lih = jnp.arange(n_hash, dtype=jnp.int32)[:, None]
    r8h = lih * rows8 + fold_plane_rows(local, hms)
    oh = jax.nn.one_hot(local % 8, 8, dtype=jnp.float32)  # (n_hash, B, 8)
    placed = jnp.einsum("lbp,lbw->lbpw", oh, u_vals[h0:]).reshape(-1, 128)
    U8h = jnp.zeros((n_hash * rows8, 128), jnp.float32).at[
        r8h.reshape(-1)
    ].add(placed, mode="promise_in_bounds")
    deltas = _oct_deltas(s1, s2, hms)
    dh = fold_hash_levels(
        U8h.reshape(n_hash, 8, R, 128), deltas, hms, tb=_pick_tb(R)
    )
    if flat:
        # assemble the gradient as ONE 1-D vector: the hash kernel output
        # is already the flat packed stream; dense blocks flatten small
        parts = [b.reshape(-1) for b in blocks] + [dh.reshape(-1)]
        return jnp.concatenate(parts, axis=0).astype(out_dtype)
    blocks.append(dh.reshape(n_hash * hms, C))
    return jnp.concatenate(blocks, axis=0).astype(out_dtype)


def _build_quad_mixed(params: dict, cfg: HashGridConfig) -> jnp.ndarray:
    """build_quad_table with the uniform hashed tail produced by the Pallas
    build kernel (ops/pallas_fold.py) in the PLANE-PERMUTED row order
    (quad_plane_row); dense levels keep the XLA roll construction. Only
    valid together with permuted take rows (see _encode_quad)."""
    from .pallas_fold import build_quad_hash

    assert cfg.hash_scheme == "add"
    C = cfg.level_dim
    emb = params["embeddings"]
    flat = emb.ndim == 1
    levels = cfg.level_params()
    shifts = _level_shifts(cfg)
    h0, n_hash, hms, (s1, s2) = _hash_group(cfg)

    # dtype cast PER PIECE, after slicing/reshaping to the piece's final
    # layout: casting the whole flat vector up front hands XLA a bf16
    # flat tensor whose downstream canonicalization re-materialized a
    # narrow (T, 2) view (6.7 ms/step in the round-5 final profile); cast
    # on the wide (n_hash, R, 128) view instead and no narrow bf16
    # tensor ever exists
    def cast(a):
        if cfg.table_dtype != "float32":
            return a.astype(jnp.dtype(cfg.table_dtype))
        return a

    blocks = []
    for (off, lhms, _, _), (ls1, _) in zip(levels[:h0], shifts[:h0]):
        if flat:
            blk = cast(jax.lax.slice_in_dim(
                emb, C * off, C * (off + lhms), axis=0
            ).reshape(lhms, C))
        else:
            blk = cast(jax.lax.slice_in_dim(emb, off, off + lhms, axis=0))
        blocks.append(
            jnp.concatenate(
                [
                    blk,
                    jnp.roll(blk, -1, axis=0),
                    jnp.roll(blk, -(ls1 % lhms), axis=0),
                    jnp.roll(blk, -((ls1 + 1) % lhms), axis=0),
                ],
                axis=-1,
            )
        )
    off_h = levels[h0][0]
    if flat:
        embh = jax.lax.slice_in_dim(
            emb, C * off_h, C * (off_h + n_hash * hms), axis=0
        )
    else:
        embh = jax.lax.slice_in_dim(emb, off_h, off_h + n_hash * hms, axis=0)
    masterp = cast(embh.reshape(n_hash, hms // 64, 128))
    quad_h = build_quad_hash(
        masterp, (0, 1, s1, s1 + 1), hms, tb=_pick_tb(hms // 64)
    )
    blocks.append(quad_h.reshape(n_hash * hms, 4 * cfg.level_dim))
    return jnp.concatenate(blocks, axis=0)


def with_table_cache(params: dict, cfg: HashGridConfig) -> dict:
    """Precompute the derived quad gather table ONCE and stash it in the
    encoding params (stop_gradient'ed) for reuse by every encode call in
    the step — XLA does not CSE the Pallas build custom-calls, and even the
    XLA build is worth sharing. Only the quad+fold path consumes the cache;
    other layouts ignore it. Gradients are exact regardless: the fold
    transpose in _quad_take_fold is the table gradient path."""
    if cfg.layout == "oct" and cfg.scatter_impl == "fold":
        # full-schedule oct cache (VERDICT r4 #1a re-measure): ONE 8C-row
        # gather per level-point in the DIFFERENTIATED path too, instead of
        # quad's two 4C rows. The truncated coarse sweeps gather from the
        # same table's level-prefix rows (identical offsets), so no
        # separate sweep cache is needed. XLA build (8 rolls + concat per
        # level, sequential HBM); gradients still flow through the fold
        # transpose in _oct_take_fold.
        oct_t = build_oct_table(params, cfg)
        return {**params, "_oct_full": jax.lax.stop_gradient(oct_t)}
    if cfg.layout != "quad" or cfg.scatter_impl != "fold":
        return params
    if cfg.build_impl == "pallas" and _kernels_eligible(cfg):
        quad = _build_quad_mixed(params, cfg)
    else:
        quad = build_quad_table(params, cfg)
    out = {**params, "_quad": jax.lax.stop_gradient(quad)}
    if cfg.sweep_oct_levels > 0:
        # derived OCT table of the first K (coarse) levels for the no-grad
        # sampler sweeps: one 8C-row gather per level-point (see
        # HashGridConfig.sweep_oct_levels). Sequential HBM build (rolls
        # feeding a concat are compact), once per step.
        oct_t = build_oct_table(params, sweep_cfg(cfg))
        out["_oct_sweep"] = jax.lax.stop_gradient(oct_t)
    return out


def sweep_cfg(cfg: HashGridConfig) -> "HashGridConfig":
    """The truncated oct-layout config serving the coarse-level sampler
    sweeps: first ``sweep_oct_levels`` levels of the SAME geometry (scale
    pinned so level resolutions match the full schedule's prefix), oct
    layout, plain XLA take (no-grad path — the fold/build kernels and the
    plane permutation only matter for the differentiated quad path)."""
    import dataclasses as _dc

    return _dc.replace(
        cfg, num_levels=cfg.sweep_oct_levels, per_level_scale=cfg.scale,
        desired_resolution=None, layout="oct", build_impl="xla",
        fold_impl="xla",
    )


def _quad_take_fold(emb: jnp.ndarray, cfg: HashGridConfig, rows: jnp.ndarray,
                    quad_cache=None):
    """Quad-table row gather whose transpose is the corner-affine FOLD
    scatter (_fold_transpose). ``rows``: (2, L, B) absolute quad-table rows
    (level offsets included), with ``rows[1] == rows[0] + s2`` cyclically
    per level — or (3, L, B) when build_impl='pallas': two PERMUTED take
    rows (quad_plane_row order for hashed levels) plus the unpermuted base
    row for the fold. ``linear_call`` keeps the op linear in ``emb`` so the
    eikonal grad-of-grad still traces (transpose of the transpose is the
    gather) — replacing the reference's hand-written second CUDA backward
    (hashencoder.cu:375-595).
    """
    from jax.custom_derivatives import linear_call

    L, C = cfg.num_levels, cfg.level_dim
    use_pb = rows.shape[0] == 3

    def fwd(res, e):
        ix, quad = res
        if quad is None:
            if use_pb:
                quad = _build_quad_mixed({"embeddings": e}, cfg)
            else:
                quad = build_quad_table({"embeddings": e}, cfg)
        return _chunked_take(quad, ix[:2].reshape(-1), cfg.gather_chunks)

    def bwd(res, ct):  # ct (2*L*B, 4C) -> d_emb shaped like emb
        ix, _ = res
        B = ct.shape[0] // (2 * L)
        row0 = ix[-1].reshape(L, B) if use_pb else ix.reshape(2, L, B)[0]
        ctr = ct.reshape(2, L, B, 4 * C)
        u_vals = jnp.concatenate([ctr[0], ctr[1]], axis=-1)  # (L, B, 8C)
        return _fold_transpose(cfg, row0, u_vals, emb.dtype,
                               flat=emb.ndim == 1)

    # quad_cache: a PRECOMPUTED (stop_gradient'ed) quad table rides as a
    # linear_call residual so the per-step build is shared across all
    # encode calls (XLA does not CSE the Pallas build custom-calls). The
    # fwd is then formally independent of ``emb``, but bwd remains the
    # exact transpose of build∘take, so reverse-mode gradients (and the
    # eikonal grad-of-grad, whose x-linearization never carries emb
    # tangents) are unchanged — verified by tests/test_pallas_fold.py.
    return linear_call(fwd, bwd, (rows, quad_cache), emb)


def build_oct_table(params: dict, cfg: HashGridConfig) -> jnp.ndarray:
    """Derive the fully corner-duplicated gather table: (table_size, 8*C),
    where row j of level block l packs ALL 8 corner entries of cell j in
    _oct_deltas order — ONE 8C-channel gather row per (point, level),
    vs the quad layout's two. Same construction class as build_quad_table
    (8 static rolls + concat per level, sequential HBM) and differentiable
    the same way."""
    assert cfg.hash_scheme == "add", "oct layout requires the additive scheme"
    emb = params["embeddings"]
    C = cfg.level_dim
    flat = emb.ndim == 1
    shifts = _level_shifts(cfg)
    blocks = []
    for (off, hms, _, _), (s1, s2) in zip(cfg.level_params(), shifts):
        # flat leaf: slice the 1-D vector FIRST, then view the level block
        # as (hms, C) — reshaping the whole flat table to a narrow (T, 2)
        # view up front measured 6.7 ms/step on a v5e (round-5 profile),
        # even when the build (e.g. the coarse sweep cache) consumes only
        # a level prefix
        if flat:
            blk = jax.lax.slice_in_dim(
                emb, C * off, C * (off + hms), axis=0
            ).reshape(hms, C)
        else:
            blk = jax.lax.slice_in_dim(emb, off, off + hms, axis=0)
        if cfg.table_dtype != "float32":
            blk = blk.astype(jnp.dtype(cfg.table_dtype))
        blocks.append(
            jnp.concatenate(
                # plain jnp.roll — see build_quad_table's layout note
                [
                    jnp.roll(blk, -dq, axis=0)
                    for dq in _oct_deltas(s1, s2, hms)
                ],
                axis=-1,
            )
        )
    return jnp.concatenate(blocks, axis=0)  # (T, 8C)


def _oct_take_fold(emb: jnp.ndarray, cfg: HashGridConfig, rows: jnp.ndarray,
                   oct_cache=None):
    """Oct-table row gather (one row per level-point) whose transpose is the
    corner-affine FOLD scatter — the cotangent rows ARE the fold's update
    rows, no restructuring. ``rows``: (L, B) absolute base rows.
    ``oct_cache``: a precomputed (stop_gradient'ed) oct table riding as a
    linear_call residual (same sharing rationale as _quad_take_fold's
    quad_cache — the per-step build is shared across all encode calls)."""
    from jax.custom_derivatives import linear_call

    L, C = cfg.num_levels, cfg.level_dim

    def fwd(res, e):
        ix, oct_t = res
        if oct_t is None:
            oct_t = build_oct_table({"embeddings": e}, cfg)
        return _chunked_take(oct_t, ix.reshape(-1), cfg.gather_chunks)

    def bwd(res, ct):  # ct (L*B, 8C)
        ix, _ = res
        B = ct.shape[0] // L
        return _fold_transpose(
            cfg, ix.reshape(L, B), ct.reshape(L, B, 8 * C), emb.dtype,
            flat=emb.ndim == 1,
        )

    return linear_call(fwd, bwd, (rows, oct_cache), emb)


def _encode_core(cfg: HashGridConfig, x01: jnp.ndarray):
    """Shared per-level geometry: smoothstep weights + per-corner/cell
    integer coordinates. Returns (pos_grid (L,B,D) i32, w (L,B,D),
    in_bounds (1,B,1)), plus the static per-level constant arrays."""
    B, D = x01.shape
    assert D == cfg.input_dim
    levels = cfg.level_params()
    off_arr = jnp.asarray([lv[0] for lv in levels], jnp.int32)  # (L,)
    hms_arr = jnp.asarray([lv[1] for lv in levels], jnp.uint32)
    res_arr = jnp.asarray([lv[2] for lv in levels], jnp.int32)
    fscale_arr = jnp.asarray([lv[3] for lv in levels], x01.dtype)

    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # (B,)
    in_bounds = (1.0 - oob.astype(x01.dtype))[None, :, None]  # (1,B,1)

    pos = x01[None, :, :] * fscale_arr[:, None, None]  # (L,B,D)
    pos_grid = jnp.clip(
        jnp.floor(pos), 0, res_arr[:, None, None].astype(x01.dtype)
    ).astype(jnp.int32)
    frac = pos - pos_grid.astype(x01.dtype)
    w = _smoothstep(jnp.clip(frac, 0.0, 1.0))  # (L,B,D)
    return pos_grid, w, in_bounds, off_arr, hms_arr, res_arr


def _encode_quad(params: dict, cfg: HashGridConfig, x01: jnp.ndarray):
    """'quad' layout: 2 gathers of 16-byte rows per level-point from the
    corner-duplicated table (the measured v5e optimum; see HashGridConfig)."""
    B, D = x01.shape
    C = cfg.level_dim
    L = cfg.num_levels

    pos_grid, w, in_bounds, off_arr, hms_arr, _ = _encode_core(cfg, x01)
    shifts = _level_shifts(cfg)
    s1_arr = jnp.asarray([s[0] for s in shifts], jnp.uint32)
    s2_arr = jnp.asarray([s[1] for s in shifts], jnp.uint32)

    pg = pos_grid.astype(jnp.uint32)  # (L,B,D)
    # affine cell index; no uint32 overflow (coords <= 2048, mults < 2^19)
    base = (
        pg[..., 0]
        + pg[..., 1] * s1_arr[:, None]
        + pg[..., 2] * s2_arr[:, None]
    )  # (L,B)
    hms = hms_arr[:, None]
    local0 = (base % hms).astype(jnp.int32)
    local1 = ((base + s2_arr[:, None]) % hms).astype(jnp.int32)
    off = off_arr[:, None]
    use_pb = (
        cfg.build_impl == "pallas"
        and cfg.scatter_impl == "fold"
        and _kernels_eligible(cfg)
    )
    if use_pb:
        # hashed levels live in the Pallas build's plane-permuted row
        # order; the take indices follow the same permutation
        from .pallas_fold import quad_plane_row

        h0, _, hmsh, _ = _hash_group(cfg)
        hmask = (jnp.arange(L) >= h0)[:, None]
        row0p = jnp.where(hmask, quad_plane_row(local0, hmsh), local0) + off
        row1p = jnp.where(hmask, quad_plane_row(local1, hmsh), local1) + off
        rows = jnp.stack([row0p, row1p, local0 + off], axis=0)  # (3,L,B)
    else:
        rows = jnp.stack([local0 + off, local1 + off], axis=0)  # (2,L,B)

    if cfg.scatter_impl == "fold":
        vals = _quad_take_fold(
            params["embeddings"], cfg, rows, params.get("_quad")
        )
    else:
        quad = build_quad_table(params, cfg)
        vals = _table_take(quad, rows.reshape(-1), cfg.scatter_impl)
    vals = vals.reshape(2, L, B, 4, C)

    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]  # (L,B)
    quad_w = jnp.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=-1
    )  # (L,B,4)
    zw = jnp.stack([1.0 - wz, wz], axis=0)  # (2,L,B)
    level_out = jnp.einsum(
        "klbq,klbqc->lbc", zw[..., None] * quad_w[None], vals.astype(w.dtype)
    )  # (L,B,C)

    out = level_out * in_bounds
    return jnp.moveaxis(out, 0, 1).reshape(B, L * C)


def _encode_oct(params: dict, cfg: HashGridConfig, x01: jnp.ndarray):
    """'oct' layout: ONE gather of a (8C)-channel row per level-point from
    the fully corner-duplicated table — half the quad layout's gather rows
    (the v5e row gather is latency-bound per ROW, nearly width-independent;
    probe waves 2/5). With scatter_impl='fold*' the take's transpose is the
    corner-affine fold scatter directly."""
    B, D = x01.shape
    C = cfg.level_dim
    L = cfg.num_levels

    pos_grid, w, in_bounds, off_arr, hms_arr, _ = _encode_core(cfg, x01)
    shifts = _level_shifts(cfg)
    s1_arr = jnp.asarray([s[0] for s in shifts], jnp.uint32)
    s2_arr = jnp.asarray([s[1] for s in shifts], jnp.uint32)

    pg = pos_grid.astype(jnp.uint32)  # (L,B,D)
    base = (
        pg[..., 0]
        + pg[..., 1] * s1_arr[:, None]
        + pg[..., 2] * s2_arr[:, None]
    )  # (L,B)
    rows = (base % hms_arr[:, None]).astype(jnp.int32) + off_arr[:, None]

    if cfg.scatter_impl == "fold":
        # cache preference: the FULL-schedule oct cache serves every call
        # (truncated sweep schedules gather its level-prefix rows — the
        # per-level offsets of a schedule prefix are identical); the
        # quad-mode "_oct_sweep" cache only matches the truncated
        # (sweep_cfg) schedule it was built for
        cache = params.get("_oct_full")
        if cache is None:
            cache = params.get("_oct_sweep")
            if cache is not None and cfg.num_levels != cfg.sweep_oct_levels:
                cache = None
        vals = _oct_take_fold(params["embeddings"], cfg, rows, cache)
    else:
        oct_t = build_oct_table(params, cfg)
        vals = _table_take(oct_t, rows.reshape(-1), cfg.scatter_impl)
    vals = vals.reshape(L, B, 8, C)

    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]  # (L,B)
    quad_w = jnp.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=-1
    )  # (L,B,4)
    oct_w = jnp.concatenate(
        [quad_w * (1.0 - wz)[..., None], quad_w * wz[..., None]], axis=-1
    )  # (L,B,8) in _oct_deltas corner order
    level_out = jnp.einsum("lbq,lbqc->lbc", oct_w, vals.astype(w.dtype))

    out = level_out * in_bounds
    return jnp.moveaxis(out, 0, 1).reshape(B, L * C)


def hash_encode_01(params: dict, cfg: HashGridConfig, x01: jnp.ndarray) -> jnp.ndarray:
    """Encode points already mapped to [0,1]^D. x01: (B, D) -> (B, L*C).

    Output layout is level-major per point: [B, L*C] with level blocks of C,
    matching the reference's permute at hashgrid.py:44.

    TPU-shaped: all levels are processed as one vectorized (L, B, D) batch
    and the 8 corner lookups collapse into a SINGLE flat gather of
    (8, L, B) indices from the table — one fused HBM gather kernel instead
    of levels x corners separate takes (and one deterministic scatter-add in
    the transpose/backward). With ``layout='quad'`` the gather drops to
    (2, L, B) wide rows from the corner-duplicated table.
    """
    if cfg.layout == "quad":
        return _encode_quad(params, cfg, x01)
    if cfg.layout == "oct":
        return _encode_oct(params, cfg, x01)
    assert cfg.layout == "rows", cfg.layout
    if cfg.scatter_impl == "fold":
        raise ValueError("scatter_impl='fold*' requires layout='quad'/'oct'")

    emb = params["embeddings"]
    if cfg.table_dtype != "float32":
        emb = emb.astype(jnp.dtype(cfg.table_dtype))
    emb = _emb2d(emb, cfg.level_dim)
    B, D = x01.shape
    C = cfg.level_dim
    L = cfg.num_levels

    pos_grid, w, in_bounds, off_arr, hms_arr, res_arr = _encode_core(cfg, x01)
    levels = cfg.level_params()
    dense_mask = jnp.asarray(
        [lv[2] ** D <= lv[1] for lv in levels], bool
    )  # (L,)
    # dense strides (res^0, res^1, res^2); only meaningful where dense
    res_u = res_arr.astype(jnp.uint32)
    strides = jnp.stack(
        [jnp.ones_like(res_u)] + [res_u ** d for d in range(1, D)], axis=-1
    )  # (L, D)

    # corner indices for all 8 corners at once -> (8,L,B)
    corner_bits = np.array(
        [[(corner >> d) & 1 for d in range(D)] for corner in range(1 << D)],
        dtype=np.int32,
    )  # (8,D)
    cg = (pos_grid[None] + jnp.asarray(corner_bits)[:, None, None, :]).astype(
        jnp.uint32
    )  # (8,L,B,D)
    dense_idx = jnp.sum(cg * strides[None, :, None, :], axis=-1)  # (8,L,B)
    if cfg.hash_scheme == "add":
        shifts = _level_shifts(cfg)
        s1_arr = jnp.asarray([s[0] for s in shifts], jnp.uint32)
        s2_arr = jnp.asarray([s[1] for s in shifts], jnp.uint32)
        hash_idx = (
            cg[..., 0]
            + cg[..., 1] * s1_arr[None, :, None]
            + cg[..., 2] * s2_arr[None, :, None]
        )
    else:
        assert cfg.hash_scheme == "xor", cfg.hash_scheme
        primes = jnp.asarray(_PRIMES[:D], jnp.uint32)
        hash_idx = cg[..., 0] * primes[0]
        for d in range(1, D):
            hash_idx = hash_idx ^ (cg[..., d] * primes[d])
    idx = jnp.where(dense_mask[None, :, None], dense_idx, hash_idx)
    idx = (idx % hms_arr[None, :, None]).astype(jnp.int32) + off_arr[None, :, None]

    vals = _table_take(emb, idx.reshape(-1), cfg.scatter_impl).reshape(8, L, B, C)

    # corner weights: prod over D of (w if bit else 1-w) -> (8,L,B)
    bits = jnp.asarray(corner_bits, bool)[:, None, None, :]  # (8,1,1,D)
    cw = jnp.prod(jnp.where(bits, w[None], 1.0 - w[None]), axis=-1)
    level_out = jnp.sum(cw[..., None] * vals, axis=0)  # (L,B,C)

    out = level_out * in_bounds  # (L,B,C)
    return jnp.moveaxis(out, 0, 1).reshape(B, L * C)


def hash_encode(params: dict, cfg: HashGridConfig, x: jnp.ndarray, size: float = 1.0):
    """Encode real-world points in [-size, size]^D (reference hashgrid.py:154-163)."""
    x01 = (x + size) / (2.0 * size)
    prefix = x.shape[:-1]
    out = hash_encode_01(params, cfg, x01.reshape(-1, cfg.input_dim))
    return out.reshape(*prefix, cfg.output_dim)
