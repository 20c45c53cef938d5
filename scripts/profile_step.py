"""Capture a jax.profiler trace of the train step on the real chip and dump
a per-op time summary from the xplane proto (tensorboard_plugin_profile).

Usage: python scripts/profile_step.py [--rays 1024] [--steps 8] [--out /tmp/prof]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default="/tmp/prof")
    ap.add_argument("--diff", default="pallas")
    ap.add_argument("--sampler", default="pallas")
    ap.add_argument("--rgb", default="fused")
    ap.add_argument("--machinery", default="pallas")
    ap.add_argument("--grid", action="store_true", help="hash-grid flagship config")
    ap.add_argument("--table_dtype", default="bfloat16")
    ap.add_argument("--scatter", default="flat")
    ap.add_argument("--hash_scheme", default="xor")
    ap.add_argument("--layout", default="rows")
    ap.add_argument("--fold_impl", default="xla")
    ap.add_argument("--build_impl", default="xla")
    ap.add_argument("--param_flat", action="store_true")
    ap.add_argument("--sweep_max_level", type=int, default=0)
    ap.add_argument("--sweep_oct", action="store_true")
    ap.add_argument("--gather_chunks", type=int, default=1)
    ap.add_argument("--sampler_iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monosdf_tpu.data import make_synthetic_sphere_scene, sample_ray_batch
    from monosdf_tpu.losses import LossConfig
    from monosdf_tpu.models import MonoSDFConfig, init_monosdf
    from monosdf_tpu.models.fields import ImplicitNetConfig, RenderingNetConfig
    from monosdf_tpu.ops.sampler import SamplerConfig
    from monosdf_tpu.train import (
        OptimConfig, init_train_state, make_optimizer, make_train_step,
    )

    if args.grid:
        from monosdf_tpu.ops.hashgrid import HashGridConfig

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
        compute_dtype="bfloat16", mixed_precision=True,
        sampler_backend=args.sampler, diff_backend=args.diff,
        rgb_backend=args.rgb,
        sweep_max_level=args.sweep_max_level or None,
    )
    params = init_monosdf(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(
        OptimConfig(learning_rate=5e-4, decay_steps=150_000,
                    grid_mode=args.grid)
    )
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(cfg, LossConfig(), opt), donate_argnums=(0,))

    scene = make_synthetic_sphere_scene(n_images=4, img_res=64)
    batch = jax.tree_util.tree_map(
        jnp.asarray, sample_ray_batch(scene, np.random.default_rng(0), args.rays)
    )

    for i in range(3):  # compile + warm
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    _ = float(metrics["loss"])

    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        _ = float(metrics["loss"])

    paths = glob.glob(os.path.join(args.out, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", paths, flush=True)
    if not paths:
        return

    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        # no generated protos in this image — use the hand-rolled wire
        # decoder instead (same per-op table)
        import subprocess

        print("(xplane_pb2 unavailable; falling back to xplane_dump.py)",
              flush=True)
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "xplane_dump.py"),
             sorted(paths)[-1]],
            check=False,
        )
        return

    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    print("planes:", [p.name for p in xspace.planes], flush=True)

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        # Aggregate exclusive-ish time per event name across all lines.
        totals: dict[str, float] = {}
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                name = meta.name
                dur = ev.duration_ps / 1e9  # ms
                totals[name] = totals.get(name, 0.0) + dur
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:60]
        print(f"\n== plane: {plane.name} (top 60 by total ms over {args.steps} steps)")
        for name, ms in top:
            print(f"{ms/args.steps:9.3f} ms/step  {name[:140]}")


if __name__ == "__main__":
    main()
