"""Component breakdown of the training step on the real chip:
(a) sampler only, (b) full forward (render_rays), (c) loss fwd+bwd,
(d) full step (fwd+bwd+optimizer). Differences isolate stages.

Usage: python scripts/bench_breakdown.py [--rays 1024] [--diff pallas]
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
    ap.add_argument("--diff", default="pallas")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monosdf_tpu.data import make_synthetic_sphere_scene, sample_ray_batch
    from monosdf_tpu.losses import LossConfig, monosdf_loss
    from monosdf_tpu.models import MonoSDFConfig, init_monosdf, render_rays
    from monosdf_tpu.models.fields import ImplicitNetConfig, RenderingNetConfig
    from monosdf_tpu.models.fields import sdf_value
    from monosdf_tpu.ops.density import get_beta
    from monosdf_tpu.ops.sampler import SamplerConfig, error_bound_z_vals
    from monosdf_tpu.train import (
        OptimConfig, init_train_state, make_optimizer, make_train_step,
    )

    cfg = MonoSDFConfig(
        implicit=ImplicitNetConfig(
            feature_vector_size=256, dims=(256,) * 8, skip_in=(4,), multires=6,
            inside_outside=True, bias=0.9, sdf_bounding_sphere=1.1,
        ),
        rendering=RenderingNetConfig(
            feature_vector_size=256, dims=(256, 256), multires_view=4
        ),
        sampler=SamplerConfig(
            scene_bounding_sphere=1.1, N_samples=64, N_samples_eval=128,
            N_samples_extra=32, max_total_iters=5, intersection="cube",
        ),
        scene_bounding_sphere=1.1,
        compute_dtype="bfloat16", mixed_precision=True,
        diff_backend=args.diff,
    )
    params = init_monosdf(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(OptimConfig(learning_rate=5e-4, decay_steps=150_000))
    state = init_train_state(params, opt)
    lc = LossConfig()

    scene = make_synthetic_sphere_scene(n_images=4, img_res=64)
    batch = jax.tree_util.tree_map(
        jnp.asarray, sample_ray_batch(scene, np.random.default_rng(0), args.rays)
    )
    rays, gt = batch["rays"], batch["gt"]

    def timed(name, fn, *fargs):
        out = fn(*fargs)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _i in range(args.iters):
            out = fn(*fargs)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({"stage": name, "ms": round(ms, 2)}))
        return ms

    def sampler_only(p, k):
        beta0 = jax.lax.stop_gradient(get_beta(p["density"]["beta"], cfg.beta_min))
        sd = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype != "float32" else None
        fn = lambda pts: sdf_value(p["implicit"], cfg.implicit, pts, dtype=sd)[..., 0]
        return error_bound_z_vals(
            fn, rays["rays_o"], rays["rays_d"], beta0, cfg.sampler, k, True
        )[0]

    timed("sampler", jax.jit(sampler_only), params, jax.random.PRNGKey(1))

    fwd_fn = jax.jit(lambda p, k: render_rays(
        p, cfg, rays, k, training=True
    )["rgb_values"])
    timed("forward (sampler+sdf+radiance+render)", fwd_fn, params,
          jax.random.PRNGKey(1))

    def loss_fn(p, k):
        out = render_rays(p, cfg, rays, k, training=True)
        return monosdf_loss(lc, out, gt, 0)["loss"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    timed("fwd+bwd (no optimizer)", lambda p, k: grad_fn(p, k)[0], params,
          jax.random.PRNGKey(1))

    step = jax.jit(make_train_step(cfg, lc, opt), donate_argnums=(0,))

    def full(state, i):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        return metrics["loss"]

    st = state
    out = step(st, batch, jax.random.PRNGKey(0))
    _ = float(out[1]["loss"])
    st = out[0]
    t0 = time.perf_counter()
    for i in range(args.iters):
        st, metrics = step(st, batch, jax.random.PRNGKey(i))
    _ = float(metrics["loss"])
    print(json.dumps({
        "stage": "full step (fwd+bwd+opt)",
        "ms": round((time.perf_counter() - t0) / args.iters * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
