"""Microbenchmarks for hash-grid encoder primitives on the real TPU.

Motivated by the grid-mode profile (1479 ms/step): the XLA row-gather runs at
~6 ns/row (5 sweeps x 102 ms) and the backward scatter-add at ~60 ns/update
(779 ms). This probes every candidate replacement so the kernel design is
driven by measured rates, not guesses:

  * XLA take (f32 / bf16 table)
  * XLA scatter-add (random, sorted, sorted+unique indices)
  * lax.sort_key_val at the backward's update count
  * cumsum (for sort+prefix segment reductions)
  * Pallas dynamic_gather (axis 0 / axis 1), several operand heights
  * Pallas dynamic-slice store (contiguous run scatter)

Timing discipline per CLAUDE.md: chain ITERS iterations inside one jit
(fori_loop), fetch one scalar; fresh process, nothing else on the box.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 6_098_108        # flagship table entries
N_GATHER = 16_777_216  # sweep corner-lookups (131072 pts x 8 x 16)
N_SCATTER = 12_845_056  # diff-path corner-updates (100352 pts x 8 x 16)


def timed(fn, *args, iters=3, warmup=1):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    _ = float(jax.numpy.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jax.numpy.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma-separated probe names")
    args, _ = ap.parse_known_args()
    only = set(filter(None, args.only.split(",")))

    import jax
    import jax.numpy as jnp
    import numpy as np

    results = {}

    def report(name, ms, detail=""):
        results[name] = round(ms, 3)
        print(f"{name:36s} {ms:10.3f} ms  {detail}", flush=True)

    def want(name):
        return not only or name in only

    key = jax.random.PRNGKey(0)
    ITERS = 3

    # ---- XLA gather -----------------------------------------------------
    if want("xla_take"):
        for dt_name in ("float32", "bfloat16"):
            emb = jnp.zeros((T, 2), jnp.dtype(dt_name)) + 0.5
            idx = jax.random.randint(key, (N_GATHER,), 0, T, jnp.int32)

            @jax.jit
            def take_loop(emb, idx):
                def body(i, acc):
                    v = jnp.take(emb, idx + i, axis=0, mode="clip")
                    return acc + v.astype(jnp.float32).sum()
                return jax.lax.fori_loop(0, ITERS, body, 0.0)

            ms = timed(take_loop, emb, idx, iters=ITERS)
            report(f"xla_take_{dt_name}", ms, f"{N_GATHER} rows")

    # ---- XLA scatter-add -------------------------------------------------
    if want("xla_scatter"):
        vals = jnp.ones((N_SCATTER, 2), jnp.float32)
        idx_rand = jax.random.randint(key, (N_SCATTER,), 0, T, jnp.int32)
        idx_sorted = jnp.sort(idx_rand)

        def mk(sorted_, unique):
            @jax.jit
            def f(idx, vals):
                z = jnp.zeros((T, 2), jnp.float32)
                out = z.at[idx].add(
                    vals, indices_are_sorted=sorted_, unique_indices=unique,
                    mode="promise_in_bounds",
                )
                return out.sum()
            return f

        report("xla_scatter_random", timed(mk(False, False), idx_rand, vals, iters=1))
        report("xla_scatter_sorted", timed(mk(True, False), idx_sorted, vals, iters=1))
        idx_unique = jnp.arange(N_SCATTER, dtype=jnp.int32) % T
        report(
            "xla_scatter_sorted_unique",
            timed(mk(True, True), jnp.sort(idx_unique), vals, iters=1),
        )

    # ---- sort / cumsum ----------------------------------------------------
    if want("sort"):
        keys = jax.random.randint(key, (N_SCATTER,), 0, T, jnp.int32)
        v0 = jnp.ones((N_SCATTER,), jnp.float32)
        v1 = jnp.ones((N_SCATTER,), jnp.float32)

        @jax.jit
        def sort1(keys, v0):
            k, a = jax.lax.sort_key_val(keys, v0)
            return k[-1].astype(jnp.float32) + a[0]

        @jax.jit
        def sort2(keys, v0, v1):
            k, a, b = jax.lax.sort((keys, v0, v1), dimension=0, num_keys=1)
            return k[-1].astype(jnp.float32) + a[0] + b[0]

        report("sort_key_1val_12.8M", timed(sort1, keys, v0, iters=1))
        report("sort_key_2val_12.8M", timed(sort2, keys, v0, v1, iters=1))

        @jax.jit
        def csum(v0):
            return jnp.cumsum(v0)[-1]

        report("cumsum_12.8M", timed(csum, v0, iters=1))

    # ---- Pallas dynamic_gather --------------------------------------------
    if want("pl_gather"):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def probe_dg(rows, reps, axis):
            tbl = jax.random.normal(key, (rows, 128), jnp.float32)
            hi = rows if axis == 0 else 128
            idx = jax.random.randint(key, (rows, 128), 0, hi, jnp.int32)

            def kern(tbl_ref, idx_ref, out_ref):
                def body(i, acc):
                    g = jnp.take_along_axis(
                        tbl_ref[:], idx_ref[:] + (i - i), axis=axis
                    )
                    return acc + g
                out_ref[:] = jax.lax.fori_loop(0, reps, body,
                                               jnp.zeros_like(tbl_ref[:]))

            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            jf = jax.jit(lambda t, i: f(t, i).sum())
            try:
                ms = timed(jf, tbl, idx, iters=1) / reps
                per = ms * 1e6 / (rows * 128)
                report(f"pl_dyngather_ax{axis}_{rows}x128", ms,
                       f"{per:.3f} ns/elem ({reps} reps in kernel)")
            except Exception as e:
                report(f"pl_dyngather_ax{axis}_{rows}x128", float("nan"),
                       f"FAILED: {type(e).__name__}: {str(e)[:160]}")

        for rows in (8, 512, 4096, 8192):
            probe_dg(rows, reps=32, axis=0)
        probe_dg(512, reps=32, axis=1)

    # ---- Pallas dynamic-slice store (contiguous run scatter) --------------
    if want("pl_store"):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(off_ref, val_ref, out_ref):
            out_ref[:] = jnp.zeros_like(out_ref)

            def body(i, _):
                start = off_ref[i]
                out_ref[pl.ds(start, 8), :] += val_ref[pl.ds(8 * i, 8), :]
                return 0

            jax.lax.fori_loop(0, off_ref.shape[0], body, 0)

        n_runs, rows = 512, 4096
        offs = jnp.sort(jax.random.randint(key, (n_runs,), 0, rows - 8, jnp.int32))
        vals = jnp.ones((8 * n_runs, 128), jnp.float32)
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda o, v: f(o, v).sum())
        try:
            ms = timed(jf, offs, vals, iters=1)
            report("pl_dynslice_store_512x8rows", ms,
                   f"{ms * 1e6 / n_runs:.1f} ns/run")
        except Exception as e:
            report("pl_dynslice_store_512x8rows", float("nan"),
                   f"FAILED: {type(e).__name__}: {str(e)[:160]}")

    print(json.dumps(results))


if __name__ == "__main__" and not any(
    w in sys.argv
    for w in ("--wave2", "--wave3", "--wave4", "--wave5", "--wave6", "--wave7",
       "--wave8")
):
    main()


def main2():
    """Second probe wave: coherence / row-shape / table-size sensitivity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    results = {}

    def report(name, ms, detail=""):
        results[name] = round(ms, 3)
        print(f"{name:40s} {ms:10.3f} ms  {detail}", flush=True)

    key = jax.random.PRNGKey(0)
    ITERS = 3

    emb = jnp.zeros((T, 2), jnp.float32) + 0.5
    embf = jnp.zeros((2 * T,), jnp.float32) + 0.5
    emb_bf = emb.astype(jnp.bfloat16)

    def take_loop(emb, idx):
        def body(i, acc):
            v = jnp.take(emb, idx + i, axis=0, mode="clip")
            return acc + v.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    jt = jax.jit(take_loop)

    idx_rand = jax.random.randint(key, (N_GATHER,), 0, T, jnp.int32)
    report("take_f32_random", timed(jt, emb, idx_rand, iters=ITERS))

    idx_sorted = jnp.sort(idx_rand)
    report("take_f32_sorted", timed(jt, emb, idx_sorted, iters=ITERS))

    # ray-coherent: 128k rays x 128 consecutive-ish cells each
    base = jax.random.randint(key, (N_GATHER // 128, 1), 0, T - 512, jnp.int32)
    walk = jnp.cumsum(
        jax.random.randint(key, (N_GATHER // 128, 128), 0, 4, jnp.int32), axis=1
    )
    idx_coh = (base + walk).reshape(-1)
    report("take_f32_raywalk", timed(jt, emb, idx_coh, iters=ITERS))

    # small table (cache?)
    small = jnp.zeros((4096, 2), jnp.float32) + 0.5
    idx_small = jax.random.randint(key, (N_GATHER,), 0, 4096, jnp.int32)
    report("take_f32_smalltable4k", timed(jt, small, idx_small, iters=ITERS))

    mid = jnp.zeros((524288, 2), jnp.float32) + 0.5
    idx_mid = jax.random.randint(key, (N_GATHER,), 0, 524288, jnp.int32)
    report("take_f32_midtable512k", timed(jt, mid, idx_mid, iters=ITERS))

    # flat scalar-row gather
    idx_flat = jax.random.randint(key, (N_GATHER,), 0, 2 * T, jnp.int32)
    report("take_f32_flat1d", timed(jt, embf, idx_flat, iters=ITERS))

    # pair gather: half the indices, slice (2, 2) via take of reshaped (T//2, 4)
    emb_pairs = emb.reshape(T // 2, 4)
    idx_half = jax.random.randint(key, (N_GATHER // 2,), 0, T // 2, jnp.int32)
    report("take_f32_pairrows_half", timed(jt, emb_pairs, idx_half, iters=ITERS),
           "8.4M rows of 4ch")
    emb_p_bf = emb_pairs.astype(jnp.bfloat16)
    report("take_bf16_pairrows_half", timed(jt, emb_p_bf, idx_half, iters=ITERS))
    emb_q_bf = emb_bf.reshape(T // 4, 8)
    idx_q = jax.random.randint(key, (N_GATHER // 4,), 0, T // 4, jnp.int32)
    report("take_bf16_quadrows_quarter", timed(jt, emb_q_bf, idx_q, iters=ITERS),
           "4.2M rows of 8ch bf16")

    # scatter shapes
    vals2 = jnp.ones((N_SCATTER, 2), jnp.float32)
    idxs = jax.random.randint(key, (N_SCATTER,), 0, T, jnp.int32)

    def sc2(idx, vals):
        z = jnp.zeros((T, 2), jnp.float32)
        return z.at[idx].add(vals, mode="promise_in_bounds").sum()

    def sc_flat(idx, vals):
        z = jnp.zeros((2 * T,), jnp.float32)
        return z.at[idx].add(vals, mode="promise_in_bounds").sum()

    def sc_small(idx, vals):
        z = jnp.zeros((4096, 2), jnp.float32)
        return z.at[idx].add(vals, mode="promise_in_bounds").sum()

    report("scatter2ch_random", timed(jax.jit(sc2), idxs, vals2, iters=1))
    vflat = jnp.ones((N_SCATTER,), jnp.float32)
    report("scatter_flat_scalar", timed(jax.jit(sc_flat), idx_flat[:N_SCATTER], vflat, iters=1),
           "12.8M scalar rows")
    idx_sm = jax.random.randint(key, (N_SCATTER,), 0, 4096, jnp.int32)
    report("scatter_small4k", timed(jax.jit(sc_small), idx_sm, vals2, iters=1))
    # wide rows: scatter 1.6M rows of (1, 16)
    vals16 = jnp.ones((N_SCATTER // 8, 16), jnp.float32)
    def sc16(idx, vals):
        z = jnp.zeros((T // 8, 16), jnp.float32)
        return z.at[idx].add(vals, mode="promise_in_bounds").sum()
    idx16 = jax.random.randint(key, (N_SCATTER // 8,), 0, T // 8, jnp.int32)
    report("scatter_16ch_eighth", timed(jax.jit(sc16), idx16, vals16, iters=1),
           "1.6M rows of 16ch")

    # row-parallel 2D sort: (128, 100352) keys + payload
    k2d = jax.random.randint(key, (128, 100352), 0, 524288, jnp.int32)
    v2d = jnp.ones((128, 100352), jnp.float32)

    def sort2d(k, v):
        ks, vs = jax.lax.sort((k, v), dimension=1, num_keys=1)
        return ks[0, -1].astype(jnp.float32) + vs[0, 0]

    report("sort2d_128x100k_1val", timed(jax.jit(sort2d), k2d, v2d, iters=1))

    def csum2d(v):
        return jnp.cumsum(v, axis=1)[0, -1]

    report("cumsum2d_128x100k", timed(jax.jit(csum2d), v2d, iters=1))

    import json
    print(json.dumps(results))


if __name__ == "__main__" and "--wave2" in sys.argv:
    main2()
    sys.exit(0)


def main3():
    """Third wave: scatter encodings (complex64 channel-packing, bf16 rows,
    batched-per-level) and matching gather forms."""
    import jax
    import jax.numpy as jnp

    results = {}

    def report(name, ms, detail=""):
        results[name] = round(ms, 3)
        print(f"{name:40s} {ms:10.3f} ms  {detail}", flush=True)

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N_SCATTER,), 0, T, jnp.int32)

    # complex64: both channels ride one scalar row (complex built IN-jit;
    # eager complex ops are unimplemented on the axon backend)
    vr = jnp.ones((N_SCATTER,), jnp.float32)

    def sc_c64(idx, v):
        vc = jax.lax.complex(v, v * 2.0)
        z = jnp.zeros((T,), jnp.complex64)
        acc = z.at[idx].add(vc, mode="promise_in_bounds")
        return jnp.real(acc).sum() + jnp.imag(acc).sum()

    try:
        report("scatter_c64_flat", timed(jax.jit(sc_c64), idx, vr, iters=1))
    except Exception as e:
        report("scatter_c64_flat", float("nan"), str(e)[:120])

    # bf16 (T, 2) rows = 4-byte rows
    vb = jnp.ones((N_SCATTER, 2), jnp.bfloat16)

    def sc_bf(idx, v):
        z = jnp.zeros((T, 2), jnp.bfloat16)
        return z.at[idx].add(v, mode="promise_in_bounds").astype(jnp.float32).sum()

    report("scatter_bf16_2ch", timed(jax.jit(sc_bf), idx, vb, iters=1))

    # batched per-level scatter (16 rows, 800k updates each into 524288)
    idx2 = jax.random.randint(key, (16, N_SCATTER // 16), 0, 524288, jnp.int32)
    v2 = jnp.ones((16, N_SCATTER // 16), jnp.float32)

    def sc_batched(idx, v):
        def one(ix, vv):
            return jnp.zeros((524288,), jnp.float32).at[ix].add(
                vv, mode="promise_in_bounds"
            )
        return jax.vmap(one)(idx, v).sum()

    report("scatter_f32_batched16", timed(jax.jit(sc_batched), idx2, v2, iters=1))

    # gather complex64 flat (8-byte scalar rows); complex built in-jit
    embr = jnp.zeros((T,), jnp.float32) + 0.5
    idxg = jax.random.randint(key, (N_GATHER,), 0, T, jnp.int32)

    def take_c64(embr, i):
        emb = jax.lax.complex(embr, embr)
        def body(k, acc):
            v = jnp.take(emb, i + k, axis=0, mode="clip")
            return acc + jnp.real(v).sum() + jnp.imag(v).sum()
        return jax.lax.fori_loop(0, 3, body, 0.0)

    try:
        report("take_c64_flat", timed(jax.jit(take_c64), embr, idxg, iters=3))
    except Exception as e:
        report("take_c64_flat", float("nan"), str(e)[:120])

    # gather bf16 16ch rows (32B), 2.1M rows
    emb16 = jnp.zeros((T // 8, 16), jnp.bfloat16) + 0.5
    idx16 = jax.random.randint(key, (N_GATHER // 8,), 0, T // 8, jnp.int32)

    def take16(emb, i):
        def body(k, acc):
            return acc + jnp.take(emb, i + k, axis=0, mode="clip").astype(
                jnp.float32).sum()
        return jax.lax.fori_loop(0, 3, body, 0.0)

    report("take_bf16_16ch_2.1M", timed(jax.jit(take16), emb16, idx16, iters=3),
           "2.1M rows of 32B")

    import json
    print(json.dumps(results))


if __name__ == "__main__" and "--wave3" in sys.argv:
    main3()
    sys.exit(0)


N_FOLD = 1_605_632  # fold-scatter rows: 100,352 diff points x 16 levels


def main4():
    """Fourth wave: the corner-affine FOLD scatter designs.

    With the additive hash scheme every corner offset is affine in the base
    cell index, so the backward can scatter ONE row per (point, level) —
    8 corners x C channels packed as row channels — and fold corners back
    with 8 static per-level rolls. This wave prices the candidate encodings
    of that single row-scatter:

      * XLA row scatter at widths 16 (f32/bf16) and 128 (pre-placed lanes)
      * Pallas RMW loop: VMEM-resident (rows, 128) f32 accumulator,
        per-update dynamic-sublane `out[pl.ds(row,1),:] += val` — indices
        stream through SMEM blocks, values through VMEM blocks
      * VMEM capacity check (32/64/96 MB scratch)
      * 2D row-parallel sort + cumsum (the sorted-segment fallback)
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {}

    def report(name, ms, detail=""):
        results[name] = round(ms, 3)
        print(f"{name:44s} {ms:10.3f} ms  {detail}", flush=True)

    key = jax.random.PRNGKey(0)

    # ---- XLA wide-row scatters (full fold table: T rows of 16ch) ----------
    for width, dt in ((16, jnp.float32), (16, jnp.bfloat16), (128, jnp.float32)):
        n = N_FOLD
        idx = jax.random.randint(key, (n,), 0, T, jnp.int32)
        vals = jnp.ones((n, width), dt)

        def sc(idx, vals, width=width, dt=dt):
            z = jnp.zeros((T, width), dt)
            return z.at[idx].add(vals, mode="promise_in_bounds").astype(
                jnp.float32
            ).sum()

        try:
            ms = timed(jax.jit(sc), idx, vals, iters=1)
            report(
                f"xla_scatter_{width}ch_{dt.__name__}", ms,
                f"{ms*1e6/n:.1f} ns/row, {n} rows",
            )
        except Exception as e:
            report(f"xla_scatter_{width}ch_{dt.__name__}", float("nan"),
                   f"FAILED {type(e).__name__}: {str(e)[:120]}")

    # ---- VMEM capacity ------------------------------------------------------
    for mb in (32, 64, 96, 110):
        rows = mb * 1024 * 1024 // (128 * 4)

        def kern(out_ref):
            out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[0, 0] = 1.0

        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024
                ),
            )
            v = float(jax.jit(lambda: f()[0, 0])())
            report(f"vmem_alloc_{mb}MB", 0.0, f"ok v={v}")
        except Exception as e:
            report(f"vmem_alloc_{mb}MB", float("nan"),
                   f"FAILED {type(e).__name__}: {str(e)[:120]}")

    # ---- Pallas RMW scatter loop -------------------------------------------
    # accumulator (rows,128) f32 in VMEM; idx chunks in SMEM; val chunks VMEM
    def probe_rmw(n_upd, acc_rows, chunk, val_dt, tag, conflict=False):
        n_upd = (n_upd // chunk) * chunk
        if conflict:
            idx = jnp.zeros((n_upd,), jnp.int32)
        else:
            idx = jax.random.randint(key, (n_upd,), 0, acc_rows, jnp.int32)
        vals = jnp.ones((n_upd, 128), val_dt)
        grid = n_upd // chunk

        def kern(idx_ref, val_ref, out_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            def body(j, _):
                r = idx_ref[j]
                out_ref[pl.ds(r, 1), :] += val_ref[pl.ds(j, 1), :].astype(
                    jnp.float32
                )
                return 0

            jax.lax.fori_loop(0, chunk, body, 0)

        f = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((chunk, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((acc_rows, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((acc_rows, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
        )
        jf = jax.jit(lambda i_, v_: f(i_, v_).sum())
        try:
            ms = timed(jf, idx, vals, iters=1)
            report(f"pl_rmw_{tag}", ms, f"{ms*1e6/n_upd:.1f} ns/update, "
                   f"{n_upd} upd -> {acc_rows}x128")
        except Exception as e:
            report(f"pl_rmw_{tag}", float("nan"),
                   f"FAILED {type(e).__name__}: {str(e)[:200]}")

    probe_rmw(100_352, 4096, 1024, jnp.bfloat16, "100k_4krows_bf16")
    probe_rmw(100_352, 65536, 1024, jnp.bfloat16, "100k_64krows_bf16")
    probe_rmw(100_352, 65536, 1024, jnp.float32, "100k_64krows_f32")
    probe_rmw(802_816, 65536, 2048, jnp.bfloat16, "800k_64krows_bf16")
    probe_rmw(100_352, 65536, 1024, jnp.bfloat16, "100k_conflict", conflict=True)

    # ---- 2D row-parallel sort/cumsum (16 levels as rows) -------------------
    k2d = jax.random.randint(key, (16, 100_352), 0, 524288, jnp.int32)
    v2d = jnp.ones((16, 100_352), jnp.float32)

    def sort2d(k, v):
        ks, vs = jax.lax.sort((k, v), dimension=1, num_keys=1)
        return ks[0, -1].astype(jnp.float32) + vs[0, 0]

    report("sort2d_16x100k_1val", timed(jax.jit(sort2d), k2d, v2d, iters=1))

    def csum2d(v):
        return jnp.cumsum(v, axis=1)[0, -1]

    report("cumsum2d_16x100k", timed(jax.jit(csum2d), v2d, iters=1))

    print(json.dumps(results))


if __name__ == "__main__" and "--wave4" in sys.argv:
    main4()
    sys.exit(0)


def main5():
    """Fifth wave: oct-layout gather rates + production-shape packed scatter."""
    import jax
    import jax.numpy as jnp

    results = {}

    def report(name, ms, detail=""):
        results[name] = round(ms, 3)
        print(f"{name:44s} {ms:10.3f} ms  {detail}", flush=True)

    key = jax.random.PRNGKey(0)

    def take_loop(emb, idx, iters=3):
        def body(k, acc):
            return acc + jnp.take(emb, idx + k, axis=0, mode="clip").astype(
                jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, 0.0)

    jt = jax.jit(take_loop)

    # oct layout: 1 gather of (16ch bf16 = 32B) per level-point
    emb16 = jnp.zeros((T, 16), jnp.bfloat16) + 0.5
    for n, tag in ((2_097_152, "sweep131k"), (1_605_632, "diff100k")):
        idx = jax.random.randint(key, (n,), 0, T, jnp.int32)
        ms = timed(jt, emb16, idx, iters=3)
        report(f"take_oct_bf16_16ch_{tag}", ms, f"{ms*1e6/n:.2f} ns/row, {n} rows")

    # quad layout reference: 2 gathers of (8ch bf16 = 16B) per level-point
    emb8 = jnp.zeros((T, 8), jnp.bfloat16) + 0.5
    idx = jax.random.randint(key, (4_194_304,), 0, T, jnp.int32)
    ms = timed(jt, emb8, idx, iters=3)
    report("take_quad_bf16_8ch_4.2M", ms, f"{ms*1e6/4_194_304:.2f} ns/row")

    # production-shape packed fold scatter: (1.6M, 128) f32 -> (763k, 128)
    t8 = 762_264
    n = 1_605_632
    idx = jax.random.randint(key, (n,), 0, t8, jnp.int32)
    vals = jnp.ones((n, 128), jnp.float32)

    def sc(idx, vals):
        z = jnp.zeros((t8, 128), jnp.float32)
        return z.at[idx].add(vals, mode="promise_in_bounds").sum()

    ms = timed(jax.jit(sc), idx, vals, iters=1)
    report("xla_scatter_packed_prod", ms, f"{ms*1e6/n:.1f} ns/row")

    print(json.dumps(results))


if __name__ == "__main__" and "--wave5" in sys.argv:
    main5()
    sys.exit(0)


def main6():
    """Sixth wave: (a) ray-COHERENT gather rates for quad vs oct rows —
    the random-index wave-5 rates understate in-situ performance; (b) one
    full _fold_transpose at production shape — the exact backward the fold
    path pays (placement einsum + packed scatter + unpack + rolls)."""
    import jax
    import jax.numpy as jnp

    results = {}

    def report(name, ms, detail=""):
        results[name] = round(ms, 3)
        print(f"{name:44s} {ms:10.3f} ms  {detail}", flush=True)

    key = jax.random.PRNGKey(0)

    def take_loop(emb, idx, iters=3):
        def body(k, acc):
            return acc + jnp.take(emb, idx + k, axis=0, mode="clip").astype(
                jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, 0.0)

    jt = jax.jit(take_loop)

    # coherent "ray walk": 16384 rays x 128 samples advancing 0..3 cells
    def coherent_idx(n_rows, tmax):
        rays = n_rows // 128
        base = jax.random.randint(key, (rays, 1), 0, tmax - 512, jnp.int32)
        walk = jnp.cumsum(
            jax.random.randint(key, (rays, 128), 0, 4, jnp.int32), axis=1
        )
        return (base + walk).reshape(-1)

    emb16 = jnp.zeros((T, 16), jnp.bfloat16) + 0.5
    idx = coherent_idx(2_097_152, T)
    ms = timed(jt, emb16, idx, iters=3)
    report("take_oct_16ch_coherent_2.1M", ms, f"{ms*1e6/2_097_152:.2f} ns/row")

    emb8 = jnp.zeros((T, 8), jnp.bfloat16) + 0.5
    idx = coherent_idx(4_194_304, T)
    ms = timed(jt, emb8, idx, iters=3)
    report("take_quad_8ch_coherent_4.2M", ms, f"{ms*1e6/4_194_304:.2f} ns/row")

    # one full fold transpose at the diff-path shape (L=16, B=100352)
    import os, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from monosdf_tpu.ops.hashgrid import HashGridConfig, _fold_transpose

    cfg = HashGridConfig(
        num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=19, desired_resolution=2048,
        table_dtype="bfloat16", scatter_impl="fold",
        hash_scheme="add", layout="oct",
    )
    L, B = 16, 100_352
    levels = cfg.level_params()
    offs = jnp.asarray([lv[0] for lv in levels], jnp.int32)[:, None]
    hms = jnp.asarray([lv[1] for lv in levels], jnp.int32)[:, None]
    row0 = (
        jax.random.randint(key, (L, B), 0, 1 << 30, jnp.int32) % hms + offs
    )
    u_vals = jnp.ones((L, B, 16), jnp.bfloat16)

    jf = jax.jit(
        lambda r, u: _fold_transpose(cfg, r, u, jnp.float32).sum()
    )
    ms = timed(jf, row0, u_vals, iters=1)
    report("fold_transpose_prod", ms, f"{L*B} update rows")

    # the oct table build alone (8 rolls x 16 levels, bf16)
    from monosdf_tpu.ops.hashgrid import build_oct_table, init_hashgrid

    params = init_hashgrid(key, cfg)

    jb = jax.jit(lambda p: build_oct_table(p, cfg).astype(jnp.float32).sum())
    ms = timed(jb, params, iters=1)
    report("build_oct_table", ms)

    print(json.dumps(results))


if __name__ == "__main__" and "--wave6" in sys.argv:
    main6()
    sys.exit(0)


def main7():
    """Seventh wave (round 4): latency-hiding groundwork.

    (a) gather CONCURRENCY: does XLA overlap K independent takes?
    (b) gather/matmul overlap: is a take async w.r.t. MXU work?
    (c) scatter concurrency: K independent packed scatters.
    (d) VMEM capacity re-check (32..110 MB Pallas allocs).
    (e) per-row async-DMA gather rate (8-deep semaphore pipeline).
    (f) Mosaic strided sublane slice + 0/1 lane-permute matmul compile check
        (the building blocks of the round-4 fold/build kernels).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {}

    def report(name, ms, detail=""):
        results[name] = round(ms, 3)
        print(f"{name:44s} {ms:10.3f} ms  {detail}", flush=True)

    key = jax.random.PRNGKey(0)
    N_Q = 4_194_304  # quad sweep rows/step-sweep

    # ---- (a) gather concurrency ------------------------------------------
    emb8 = jnp.zeros((T, 8), jnp.bfloat16) + 0.5
    idx = jax.random.randint(key, (N_Q,), 0, T, jnp.int32)

    for K in (1, 2, 4, 8):
        chunks = [idx[i * (N_Q // K):(i + 1) * (N_Q // K)] for i in range(K)]

        def takeK(emb, *cs):
            acc = 0.0
            for c in cs:
                acc = acc + jnp.take(emb, c, axis=0, mode="clip").astype(
                    jnp.float32).sum()
            return acc

        ms = timed(jax.jit(takeK), emb8, *chunks, iters=1)
        report(f"take_split{K}", ms, f"{K} independent takes, {N_Q} rows total")

    # per-level: 16 takes from 16 separate tables
    tabs = [jnp.zeros((524288, 8), jnp.bfloat16) + 0.5 for _ in range(16)]
    idxs16 = [jax.random.randint(jax.random.PRNGKey(i), (N_Q // 16,), 0, 524288,
                                 jnp.int32) for i in range(16)]

    def take16(ts, cs):
        acc = 0.0
        for t, c in zip(ts, cs):
            acc = acc + jnp.take(t, c, axis=0, mode="clip").astype(
                jnp.float32).sum()
        return acc

    ms = timed(jax.jit(take16), tabs, idxs16, iters=1)
    report("take_perlevel16", ms, "16 tables x 262k rows")

    # batched single-op variant
    tabs_s = jnp.stack(tabs)
    idxs_s = jnp.stack(idxs16)

    def take_b(ts, cs):
        return jax.vmap(lambda t, c: jnp.take(t, c, axis=0, mode="clip"))(
            ts, cs).astype(jnp.float32).sum()

    ms = timed(jax.jit(take_b), tabs_s, idxs_s, iters=1)
    report("take_batched16", ms, "one vmapped gather")

    # ---- (b) gather + matmul overlap -------------------------------------
    a = jnp.zeros((2048, 2048), jnp.bfloat16) + 0.01
    b = jnp.zeros((2048, 2048), jnp.bfloat16) + 0.01
    MM_ITERS = 128

    def mm(a, b):
        def body(i, x):
            return jnp.tanh(x @ b)
        return jax.lax.fori_loop(0, MM_ITERS, body, a).astype(jnp.float32).sum()

    def g(emb, idx):
        return jnp.take(emb, idx, axis=0, mode="clip").astype(jnp.float32).sum()

    ms_g = timed(jax.jit(g), emb8, idx, iters=1)
    report("ovl_gather_alone", ms_g)
    ms_m = timed(jax.jit(mm), a, b, iters=1)
    report("ovl_matmul_alone", ms_m)

    def both(emb, idx, a, b):
        return g(emb, idx) + mm(a, b)

    ms_b = timed(jax.jit(both), emb8, idx, a, b, iters=1)
    report("ovl_both", ms_b, f"serial would be {ms_g + ms_m:.1f}")

    # ---- (c) scatter concurrency ------------------------------------------
    t8 = 762_264
    n = N_FOLD
    vals = jnp.ones((n, 128), jnp.float32)
    idxf = jax.random.randint(key, (n,), 0, t8, jnp.int32)

    for K in (1, 2, 4):
        rows_k = t8 // K
        chunks = [(idxf[i * (n // K):(i + 1) * (n // K)] % rows_k)
                  for i in range(K)]
        vs = [vals[i * (n // K):(i + 1) * (n // K)] for i in range(K)]

        def scK(cs, vv):
            acc = 0.0
            for c, v in zip(cs, vv):
                z = jnp.zeros((rows_k, 128), jnp.float32)
                acc = acc + z.at[c].add(v, mode="promise_in_bounds").sum()
            return acc

        ms = timed(jax.jit(scK), chunks, vs, iters=1)
        report(f"scatter_split{K}", ms, f"{K} scatters, {n} rows total")

    # ---- (d) VMEM capacity -------------------------------------------------
    for mb in (32, 64, 96, 110):
        rows = mb * 1024 * 1024 // (128 * 4)

        def kern(out_ref):
            out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[0, 0] = 1.0

        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024
                ),
            )
            v = float(jax.jit(lambda: f()[0, 0])())
            report(f"vmem_alloc_{mb}MB", 0.0, f"ok v={v}")
        except Exception as e:
            report(f"vmem_alloc_{mb}MB", float("nan"),
                   f"FAILED {type(e).__name__}: {str(e)[:100]}")

    # ---- (e) per-row DMA gather --------------------------------------------
    NROWS = 65536
    tab = jnp.zeros((T // 8, 128), jnp.float32) + 0.5
    ridx = jax.random.randint(key, (NROWS,), 0, T // 8, jnp.int32)

    def dma_kern(idx_ref, tab_ref, out_ref, scratch, sems):
        NS = 8

        def start(i):
            r = idx_ref[i]
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(r, 1)], scratch.at[pl.ds(i % NS, 1)],
                sems.at[i % NS],
            ).start()

        for i in range(NS):
            start(i)

        def body(i, acc):
            pltpu.make_async_copy(
                tab_ref.at[pl.ds(0, 1)], scratch.at[pl.ds(i % NS, 1)],
                sems.at[i % NS],
            ).wait()
            acc = acc + scratch[i % NS, 0]

            @pl.when(i + NS < NROWS)
            def _():
                start(i + NS)

            return acc

        out_ref[0, 0] = jax.lax.fori_loop(0, NROWS, body, 0.0)

    try:
        f = pl.pallas_call(
            dma_kern,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((8,)),
            ],
        )
        jf = jax.jit(lambda i_, t_: f(i_, t_)[0, 0])
        ms = timed(jf, ridx, tab, iters=1)
        report("perrow_dma_64k", ms, f"{ms * 1e6 / NROWS:.1f} ns/row")
    except Exception as e:
        report("perrow_dma_64k", float("nan"),
               f"FAILED {type(e).__name__}: {str(e)[:160]}")

    # ---- (f) strided sublane slice + lane-permute matmul -------------------
    perm = np.zeros((128, 128), np.float32)
    for l in range(128):
        perm[(l * 37) % 128, l] = 1.0
    permc = jnp.asarray(perm)

    def sk(x_ref, p_ref, out_ref):
        acc = jnp.zeros_like(out_ref)
        for beta in range(9):
            s = x_ref[beta::8, :][:1024, :]
            acc += jax.lax.dot(s, p_ref[:], preferred_element_type=jnp.float32)
        out_ref[:] = acc

    x = jnp.ones((8200, 128), jnp.float32)
    try:
        f = pl.pallas_call(
            sk,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda x_, p_: f(x_, p_).sum())
        REPS = 64

        def loop(x_, p_):
            def body(i, acc):
                return acc + f(x_ + acc * 0, p_).sum() * 0 + 1.0
            return jax.lax.fori_loop(0, 1, body, 0.0) + jf(x_, p_)

        ms = timed(jax.jit(loop), x, permc, iters=1)
        report("strided_permute_kernel", ms, "9 strided slices + 9 matmuls")
    except Exception as e:
        report("strided_permute_kernel", float("nan"),
               f"FAILED {type(e).__name__}: {str(e)[:200]}")

    import json
    print(json.dumps(results))


if __name__ == "__main__" and "--wave7" in sys.argv:
    main7()
    sys.exit(0)


def main8():
    """Eighth wave: Mosaic dynamic_gather (VMEM sublane gather) rates at
    LARGE operand heights with row-broadcast indices — the primitive that
    would let sweep gathers stream each level's table through VMEM at full
    HBM bandwidth instead of paying ~6-12 ns per random HBM row."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {}

    def report(name, ms, detail=""):
        results[name] = round(ms, 3)
        print(f"{name:44s} {ms:10.3f} ms  {detail}", flush=True)

    key = jax.random.PRNGKey(0)

    def probe(rows, n, dt, reps=8):
        tbl = (jnp.zeros((rows, 128), dt) + 1)
        idx = jax.random.randint(key, (n, 1), 0, rows, jnp.int32)
        idxb = jnp.broadcast_to(idx, (n, 128))

        def kern(tbl_ref, idx_ref, out_ref):
            def body(i, acc):
                g = jnp.take_along_axis(
                    tbl_ref[:], idx_ref[:] + (i - i), axis=0
                )
                return acc + g.astype(jnp.float32)
            out_ref[:] = jax.lax.fori_loop(
                0, reps, body, jnp.zeros((n, 128), jnp.float32)
            )

        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda t, i: f(t, i).sum())
        tag = f"dg_{rows}r_{n}n_{dt.__name__ if hasattr(dt,'__name__') else dt}"
        try:
            ms = timed(jf, tbl, idxb, iters=1) / reps
            report(tag, ms, f"{ms*1e6/n:.2f} ns/row ({reps} reps)")
        except Exception as e:
            report(tag, float("nan"),
                   f"FAILED {type(e).__name__}: {str(e)[:140]}")

    for rows in (4096, 8192, 16384, 32768):
        probe(rows, 2048, jnp.float32)
    probe(32768, 2048, jnp.bfloat16)
    probe(8192, 8192, jnp.float32)

    import json
    print(json.dumps(results))


if __name__ == "__main__" and "--wave8" in sys.argv:
    main8()
    sys.exit(0)
