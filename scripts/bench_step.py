"""Parameterized train-step timing on the real chip (experiment harness;
bench.py stays the official single-line metric).

Usage: python scripts/bench_step.py [--rays 1024] [--diff jnp|pallas]
       [--sampler jnp|pallas] [--iters 20] [--grid]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--diff", default="jnp")
    ap.add_argument("--sampler", default="jnp")
    ap.add_argument("--rgb", default="jnp")
    ap.add_argument("--sweep_pe", action="store_true", help="in-kernel sweep PE")
    ap.add_argument("--machinery", default="jnp")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--grid", action="store_true", help="hash-grid flagship config")
    ap.add_argument("--table_dtype", default="bfloat16",
                    help="hash-table gather dtype (grid mode)")
    ap.add_argument("--scatter", default="flat",
                    help="table-grad scatter impl: flat|rows|fold (grid mode)")
    ap.add_argument("--hash_scheme", default="xor", help="xor|add (grid mode)")
    ap.add_argument("--layout", default="rows",
                    help="gather layout: rows|quad (grid mode; quad needs add)")
    ap.add_argument("--fold_impl", default="xla",
                    help="fold backward glue: xla|pallas (grid mode)")
    ap.add_argument("--build_impl", default="xla",
                    help="quad-table build: xla|pallas (grid mode)")
    ap.add_argument("--param_flat", action="store_true",
                    help="grid mode: 1-D flat table parameter")
    ap.add_argument("--sweep_max_level", type=int, default=0,
                    help="grid mode: sampler sweeps use only the first K "
                    "levels (0 = full schedule)")
    ap.add_argument("--gather_chunks", type=int, default=1,
                    help="grid mode: split fold-path table gathers into K "
                    "independent takes (HashGridConfig.gather_chunks)")
    ap.add_argument("--sweep_oct", action="store_true",
                    help="grid mode: serve the coarse sweeps from a "
                    "per-step oct cache (one 8C row/level-point)")
    ap.add_argument("--sampler_iters", type=int, default=5,
                    help="error-bounded sampler upsampling rounds "
                    "(reference max_total_iters=5; the reference's own "
                    "loop exits early on convergence, ray_sampler.py:125)")
    ap.add_argument("--f32", action="store_true", help="disable mixed precision")
    ap.add_argument("--unroll", type=int, default=1,
                    help="jit K chained train steps per dispatch (UNROLLED in "
                    "one graph — not lax.scan, which was measured-rejected: "
                    "the scanned while-loop loses cross-step weight-prefetch "
                    "overlap; an unrolled graph keeps XLA free to schedule "
                    "across the step boundary while halving dispatches)")
    ap.add_argument("--nofold", action="store_true", help="separate eikonal kernel call")
    ap.add_argument("--nofused_opt", action="store_true", help="per-leaf optax.adam")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monosdf_tpu.data import make_synthetic_sphere_scene, sample_ray_batch
    from monosdf_tpu.losses import LossConfig
    from monosdf_tpu.models import MonoSDFConfig, init_monosdf
    from monosdf_tpu.models.fields import ImplicitNetConfig, RenderingNetConfig
    from monosdf_tpu.ops.hashgrid import HashGridConfig
    from monosdf_tpu.ops.sampler import SamplerConfig
    from monosdf_tpu.train import (
        OptimConfig, init_train_state, make_optimizer, make_train_step,
    )

    if args.grid:
        implicit = ImplicitNetConfig(
            feature_vector_size=256, dims=(256, 256), multires=6,
            inside_outside=True, bias=0.9, use_grid=True,
            grid=HashGridConfig(
                num_levels=16, level_dim=2, base_resolution=16,
                log2_hashmap_size=19, desired_resolution=2048,
                table_dtype=args.table_dtype, scatter_impl=args.scatter,
                hash_scheme=args.hash_scheme, layout=args.layout,
                fold_impl=args.fold_impl, build_impl=args.build_impl,
                param_flat=args.param_flat,
                gather_chunks=args.gather_chunks,
                sweep_oct_levels=(
                    args.sweep_max_level if args.sweep_oct else 0
                ),
            ),
            divide_factor=1.1, sdf_bounding_sphere=0.0,
        )
    else:
        implicit = ImplicitNetConfig(
            feature_vector_size=256, dims=(256,) * 8, skip_in=(4,), multires=6,
            inside_outside=True, bias=0.9, sdf_bounding_sphere=1.1,
        )
    cfg = MonoSDFConfig(
        implicit=implicit,
        rendering=RenderingNetConfig(
            feature_vector_size=256, dims=(256, 256), multires_view=4
        ),
        sampler=SamplerConfig(
            scene_bounding_sphere=1.1, N_samples=64, N_samples_eval=128,
            N_samples_extra=32, max_total_iters=args.sampler_iters,
            intersection="cube", machinery=args.machinery,
        ),
        scene_bounding_sphere=1.1,
        compute_dtype="bfloat16" if not args.f32 else "float32",
        sweep_max_level=args.sweep_max_level or None,
        mixed_precision=not args.f32,
        sampler_backend=args.sampler,
        diff_backend=args.diff,
        rgb_backend=args.rgb,
        sweep_pe_in_kernel=args.sweep_pe,
        fold_eikonal=not args.nofold,
    )

    params = init_monosdf(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(
        OptimConfig(learning_rate=5e-4, decay_steps=150_000, grid_mode=args.grid,
                    fused=not args.nofused_opt)
    )
    state = init_train_state(params, opt)
    step_fn = make_train_step(cfg, LossConfig(), opt)
    if args.unroll > 1:
        K = args.unroll

        def multi(state, batch, key):
            keys = jax.random.split(key, K)
            metrics = None
            for i in range(K):
                state, metrics = step_fn(state, batch, keys[i])
            return state, metrics

        step = jax.jit(multi, donate_argnums=(0,))
    else:
        step = jax.jit(step_fn, donate_argnums=(0,))

    scene = make_synthetic_sphere_scene(n_images=4, img_res=64)
    batch = jax.tree_util.tree_map(
        jnp.asarray, sample_ray_batch(scene, np.random.default_rng(0), args.rays)
    )

    t_c = time.perf_counter()
    for i in range(args.warmup):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t_c

    t_rt = time.perf_counter()
    _ = float(metrics["loss"])
    rt = time.perf_counter() - t_rt

    # pre-materialize per-dispatch keys (PRNGKey() in the loop costs a
    # host->device transfer per dispatch; see bench.py)
    keys = [jax.random.PRNGKey(100 + i) for i in range(args.iters)]
    _ = float(keys[-1][0])

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step(state, batch, keys[i])
    loss1 = float(metrics["loss"])
    dt = time.perf_counter() - t0 - rt
    steps_done = args.iters * args.unroll

    print(json.dumps({
        "rays": args.rays, "diff": args.diff, "sampler": args.sampler,
        "rgb": args.rgb, "sweep_pe": args.sweep_pe, "machinery": args.machinery,
        "grid": args.grid,
        "table_dtype": args.table_dtype if args.grid else None,
        "scatter": args.scatter if args.grid else None,
        "hash_scheme": args.hash_scheme if args.grid else None,
        "layout": args.layout if args.grid else None,
        "unroll": args.unroll,
        "ms_per_step": round(1e3 * dt / steps_done, 2),
        "rays_per_s": round(args.rays * steps_done / dt, 1),
        "compile_s": round(compile_s, 1),
        "loss_first": round(loss0, 4), "loss_last": round(loss1, 4),
    }))


if __name__ == "__main__":
    main()
