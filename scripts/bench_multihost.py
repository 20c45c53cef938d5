"""Multi-host / multi-chip throughput harness (north-star scaling rows).

Measures rays/s of the sharded flagship training step (the same shard_map
program `__graft_entry__.dryrun_multichip` validates) at 1 chip / N chips /
N hosts. No pod is reachable from this dev box, so by default it provisions
N VIRTUAL CPU devices — producing the harness, the sharding, and per-host
numbers whose absolute scale is CPU-bound; on a real slice the SAME command
runs unmodified per host (see docs/MULTIHOST.md):

  # single host, all local chips
  python scripts/bench_multihost.py --rays_per_device 1024

  # each host of a pod slice (JAX discovers peers via the TPU runtime)
  python scripts/bench_multihost.py --multihost --rays_per_device 1024

Prints ONE JSON line: {n_processes, n_devices, ms_per_step, rays_per_sec,
rays_per_sec_per_device}.
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
    ap.add_argument("--n_devices", type=int, default=0,
                    help="devices to use (0 = all visible)")
    ap.add_argument("--virtual", type=int, default=0,
                    help="provision N virtual CPU devices (dev-box mode)")
    ap.add_argument("--rays_per_device", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize() for a pod slice")
    ap.add_argument("--tiny", action="store_true",
                    help="small smoke model instead of the flagship grids")
    args = ap.parse_args()

    import jax

    if args.multihost:
        jax.distributed.initialize()
    elif args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from monosdf_tpu.data import make_synthetic_sphere_scene, sample_ray_batch
    from monosdf_tpu.losses import LossConfig
    from monosdf_tpu.models import init_monosdf
    from monosdf_tpu.parallel import (
        make_mesh, make_parallel_train_step, replicate, shard_batch,
    )
    from monosdf_tpu.train import OptimConfig, init_train_state, make_optimizer

    devices = jax.devices()
    if args.n_devices:
        devices = devices[: args.n_devices]
    mesh = make_mesh(devices)
    n_dev = len(devices)

    cfg = _flagship_cfg(tiny=args.tiny)
    params = init_monosdf(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(
        OptimConfig(grid_mode=True, lr_factor_for_grid=20.0,
                    decay_steps=150_000)
    )
    state = replicate(init_train_state(params, opt), mesh)

    # per-process data shard: every host loads only its own rays
    # (reference DDP analog: per-rank independent random pixel batches,
    # exp_runner.py:65-77 + scene_dataset.py:468-478)
    scene = make_synthetic_sphere_scene(n_images=2, img_res=64)
    n_rays = args.rays_per_device * n_dev
    batch = sample_ray_batch(scene, np.random.default_rng(
        jax.process_index()), n_rays)
    if not cfg.rendering.per_image_code:
        batch.pop("indices", None)
    batch = shard_batch(jax.tree_util.tree_map(jnp.asarray, batch), mesh)

    pstep = make_parallel_train_step(cfg, LossConfig(), opt, mesh)

    key = jax.random.PRNGKey(jax.process_index())
    # warmup >= 1 always: the post-warmup fetch both forces execution
    # (block_until_ready lies under axon) and keeps compile/dispatch
    # backlog out of the timed loop (ADVICE r3)
    for i in range(max(1, args.warmup)):
        state, metrics = pstep(state, batch, jax.random.fold_in(key, i))
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = pstep(state, batch, jax.random.fold_in(key, 100 + i))
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters

    total_rays = n_rays * jax.process_count()
    out = {
        "n_processes": jax.process_count(),
        "n_devices": n_dev * jax.process_count(),
        "ms_per_step": round(dt * 1e3, 2),
        "rays_per_sec": round(total_rays / dt, 1),
        "rays_per_sec_per_device": round(
            total_rays / dt / (n_dev * jax.process_count()), 1
        ),
        "backend": devices[0].platform,
    }
    if jax.process_index() == 0:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
