"""Micro-benchmark the Pallas SDF fwd/bwd kernels (ops/pallas_sdf_grad.py)
across block sizes on the real chip, at the ScanNet-MLP work-budget shape
(~100k points, 8x256 MLP, PE(6), 256-d features).

Usage: python scripts/bench_sdf_grad_kernel.py [--n 100352] [--iters 20]
       [--blocks 128,256,512]
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
    ap.add_argument("--n", type=int, default=100352)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--blocks", default="128,256,512")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--no_save_z", action="store_true",
                    help="backward recomputes the forward instead of reading saved pre-activations")
    ap.add_argument("--sched", default="fused", choices=("fused", "split", "cache"),
                    help="kernel schedule experiments (VERDICT r4 #4): 'split' "
                    "issues each fwd layer's tangent matmul before the "
                    "primal log1p; 'cache' computes each saved-Z block's "
                    "gates once in the backward (one exp serves sigmoid + "
                    "softplus + reverse chain)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monosdf_tpu.models.fields import ImplicitNetConfig, init_implicit_net
    from monosdf_tpu.ops.pallas_mlp import effective_linear_weights
    from monosdf_tpu.ops.pallas_sdf_grad import sdf_mlp_with_grad

    cfg = ImplicitNetConfig(
        feature_vector_size=256, dims=(256,) * 8, skip_in=(4,), multires=6,
        inside_outside=True, bias=0.9, sdf_bounding_sphere=1.1,
    )
    params = init_implicit_net(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (args.n, 3)), jnp.float32)
    dtype_name = "" if args.f32 else "bfloat16"

    ws, bs = effective_linear_weights(params, cfg.num_layers)
    ws, bs = tuple(ws), tuple(bs)

    def timed(fn, *fargs):
        out = fn(*fargs)  # compile
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0_ = time.perf_counter()
        for _i in range(args.iters):
            out = fn(*fargs)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0_) / args.iters * 1e3

    save_z = not args.no_save_z
    for b in [int(s) for s in args.blocks.split(",")]:
        fwd = jax.jit(
            lambda ws, bs, x, b=b: sdf_mlp_with_grad(
                ws, bs, x, cfg.multires, tuple(cfg.skip_in), dtype_name, b,
                save_z, 0.0, 1.0, False, -1, args.sched,
            )
        )

        def loss(ws, bs, x, b=b):
            sdf, feat, g = sdf_mlp_with_grad(
                ws, bs, x, cfg.multires, tuple(cfg.skip_in), dtype_name, b,
                save_z, 0.0, 1.0, False, -1, args.sched,
            )
            return jnp.sum(sdf[:, 0] ** 2) + jnp.sum(g**2)

        fb = jax.jit(jax.grad(loss, argnums=(0, 1)))
        ms_f = timed(fwd, ws, bs, x)
        ms_fb = timed(fb, ws, bs, x)
        # stacked fwd = 4 rows x L layers x 256^2 MACs; bwd ~ 3x fwd
        gflop_f = args.n * 4 * 8 * 256 * 256 * 2 / 1e9
        print(json.dumps({
            "block": b, "n": args.n, "dtype": dtype_name or "float32",
            "save_z": save_z, "sched": args.sched,
            "fwd_ms": round(ms_f, 2), "fwd_bwd_ms": round(ms_fb, 2),
            "fwd_tflops": round(gflop_f / ms_f, 1),
            "fwd_bwd_tflops": round(4 * gflop_f / ms_fb, 1),
        }))


if __name__ == "__main__":
    main()
