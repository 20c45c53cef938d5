"""Benchmark: rays/s/chip, forward+backward+optimizer, ScanNet-MLP config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference's ScanNet MLP training work budget
(BASELINE.md): 1024 rays/step, 8x256 SDF MLP with skip@4 + PE(6),
error-bounded sampler (128-eval sweeps x 5 iters, 10 beta bisections,
64+32+2 final samples), 2x256 radiance MLP, eikonal batch 4x1024, full
MonoSDF loss, Adam update.

The reference publishes no benchmark numbers (BASELINE.md). vs_baseline is
computed against REFERENCE_RAYS_PER_SEC, an estimated single-A100 figure for
the reference implementation (~0.1 s / 1024-ray iteration). The estimate's
derivation (per-iteration FLOP budget x realistic A100 fp32 utilization,
bracketed by community-reported wall-clocks) is pinned in BASELINE.md
"Derivation of REFERENCE_RAYS_PER_SEC"; it sits at the top of the plausible
range, i.e. conservative for the reported ratio.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 10_700.0
# grids mode replaces the 8x256 MLP with 2x256 + the CUDA hash encoder, so
# its reference-class rays/s is HIGHER; derivation in BASELINE.md
# "Derivation of REFERENCE_GRIDS_RAYS_PER_SEC".
REFERENCE_GRIDS_RAYS_PER_SEC = 15_000.0
NUM_RAYS = 1024
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from monosdf_tpu.data import make_synthetic_sphere_scene, sample_ray_batch
    from monosdf_tpu.losses import LossConfig
    from monosdf_tpu.models import MonoSDFConfig, init_monosdf
    from monosdf_tpu.models.fields import ImplicitNetConfig, RenderingNetConfig
    from monosdf_tpu.ops.hashgrid import HashGridConfig
    from monosdf_tpu.ops.sampler import SamplerConfig
    from monosdf_tpu.train import (
        OptimConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    # --grids: the flagship ScanNet-grids work budget instead (16-level
    # 2^19 hash table via the quad-layout gather, 2x256 MLP). The default
    # (driver) invocation stays the MLP config and ONE JSON line.
    grids = "--grids" in sys.argv
    if grids:
        implicit = ImplicitNetConfig(
            feature_vector_size=256, dims=(256, 256), multires=6,
            inside_outside=True, bias=0.9, use_grid=True,
            grid=HashGridConfig(
                num_levels=16, level_dim=2, base_resolution=16,
                log2_hashmap_size=19, desired_resolution=2048,
                table_dtype="bfloat16", scatter_impl="fold",
                hash_scheme="add", layout="quad",
                # round-4/5 production encoding (PERFORMANCE.md):
                # Pallas fold/build kernels + flat 1-D table parameter +
                # oct-served coarse sweeps (one 8C gather row/level-point);
                # round-5 sweep budget: 6 coarse levels (quality-gated by
                # the 20k torus-grids evidence run, QUALITY.md round 5)
                # round-5: every fold-path table gather splits into 4
                # independent takes (probe wave 7: K=4 takes run ~12%
                # faster; values bitwise identical)
                fold_impl="pallas", build_impl="pallas", param_flat=True,
                gather_chunks=4, sweep_oct_levels=6,
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
            N_samples_extra=32,
            # grids: 4 upsampling rounds (round 5) — the reference's own
            # loop exits early on convergence (ray_sampler.py:125,178-179);
            # statically budgeting 4 rounds matches that semantics and is
            # quality-gated by the 20k torus-grids run (QUALITY.md).
            # MLP mode keeps the reference's full max_total_iters=5.
            max_total_iters=4 if grids else 5, intersection="cube",
            # MLP: fused bisection/error-bound/pdf kernel (pallas_sampler.py)
            # grids: jnp machinery (the measured-best grid-mode combination)
            machinery="jnp" if grids else "pallas",
        ),
        scene_bounding_sphere=1.1,
        compute_dtype="bfloat16",
        mixed_precision=True,  # bf16 matmuls (f32 accum) in the diff'd path too
        # the Pallas MLP kernels are MLP-mode only; grid mode runs the jnp
        # path (the step is gather/scatter bound there, see PERFORMANCE.md)
        diff_backend="jnp" if grids else "pallas",
        sampler_backend="jnp" if grids else "pallas",
        rgb_backend="jnp" if grids else "fused",
        # grids: coarse-level-only sampler sweeps (Neuralangelo-style level
        # masking on the no-grad sample-placement path; quality-gated in
        # QUALITY.md) — the sweep gathers are the measured wall
        sweep_max_level=6 if grids else None,
    )

    params = init_monosdf(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(
        OptimConfig(learning_rate=5e-4, decay_steps=150_000, grid_mode=grids)
    )
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(cfg, LossConfig(), opt), donate_argnums=(0,))

    scene = make_synthetic_sphere_scene(n_images=4, img_res=64)
    rng = np.random.default_rng(0)
    # DISTINCT ray batch per timed iteration (host RNG, materialized on
    # device before the timing window): training draws fresh random pixels
    # every step, so timing ITERS copies of one fixed batch would let the
    # hash-grid steps gather identical table rows each iteration — an
    # artifact the round-4 verdict flagged (fixed-batch official 7,812
    # rays/s vs 6,349 sustained in the 20k training run).
    batches = [
        jax.tree_util.tree_map(
            jnp.asarray, sample_ray_batch(scene, rng, NUM_RAYS)
        )
        for _ in range(ITERS)
    ]
    batch = batches[0]

    # NOTE: in this environment block_until_ready does not wait for remote
    # execution; only a host fetch does. Timing therefore runs ITERS chained
    # steps and fetches the LAST loss (which transitively forces every step),
    # subtracting one measured round-trip latency.
    for i in range(WARMUP):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    _ = float(metrics["loss"])  # force warmup + compile

    t_rt = time.perf_counter()
    _ = float(metrics["loss"])  # round-trip latency on materialized value
    rt = time.perf_counter() - t_rt

    # pre-materialize the per-step keys: PRNGKey() inside the timing loop
    # costs a host->device transfer per dispatch
    keys = [jax.random.PRNGKey(100 + i) for i in range(ITERS)]
    _ = float(keys[-1][0])
    # force every batch onto the device before the timing window
    for b in batches:
        _ = float(jax.tree_util.tree_leaves(b)[0].ravel()[0])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, batches[i], keys[i])
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0 - rt

    rays_per_sec = NUM_RAYS * ITERS / dt
    denom = REFERENCE_GRIDS_RAYS_PER_SEC if grids else REFERENCE_RAYS_PER_SEC
    print(
        json.dumps(
            {
                "metric": (
                    "rays/s/chip (fwd+bwd+opt), ScanNet grids config"
                    if grids
                    else "rays/s/chip (fwd+bwd+opt), ScanNet MLP config"
                ),
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / denom, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
