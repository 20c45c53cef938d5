"""Evaluation CLI — the evaluation/eval.py equivalent: load a checkpoint,
export the mesh at --resolution (optionally in world space via scale_mat),
and optionally render all eval frames + write psnr.csv
(reference code/evaluation/eval.py:17-146).
"""

from __future__ import annotations

import argparse
import csv
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--conf_add", default=None)
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--checkpoint", default="latest")
    ap.add_argument("--scan_id", default="")
    ap.add_argument("--data_root", default="../data")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--world_space", action="store_true")
    ap.add_argument("--eval_rendering", action="store_true")
    ap.add_argument("--out_dir", default="evaluation")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..config import build_configs, merge_configs, parse_hocon_file
    from ..data import SceneDataset
    from ..eval.metrics import psnr
    from ..losses import srgb_gamma
    from ..meshing import extract_mesh, write_ply
    from ..models import init_monosdf, render_rays
    from ..models.fields import sdf_value
    from ..ops.chunking import chunked_apply
    from ..train.checkpoint import load_checkpoint
    from .common import dataset_config_from_conf

    conf = parse_hocon_file(args.conf)
    if args.conf_add:
        conf = merge_configs(conf, parse_hocon_file(args.conf_add))
    exp = build_configs(conf)

    payload = load_checkpoint(args.checkpoint_dir, args.checkpoint)
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    cfg = exp.model

    os.makedirs(args.out_dir, exist_ok=True)

    ds = SceneDataset(
        dataset_config_from_conf(exp.dataset, args.data_root, args.scan_id, "val")
    )

    def sdf_fn(pts):
        return sdf_value(params["implicit"], cfg.implicit, pts)[..., 0]

    verts, faces = extract_mesh(
        sdf_fn,
        resolution=args.resolution,
        grid_boundary=exp.grid_boundary,
        scale=ds.scale if args.world_space else None,
        center=ds.center if args.world_space else None,
    )
    mesh_path = os.path.join(args.out_dir, f"surface_{args.resolution}.ply")
    write_ply(mesh_path, verts, faces)
    print(f"mesh: {mesh_path} ({len(verts)} verts)")

    if args.eval_rendering:
        rows = []
        for i in range(len(ds.frame_idx_list)):
            image = ds.image_rays(i)
            rays = image["rays"]
            code = None
            if cfg.rendering.per_image_code:
                code = params["rendering"]["embeddings"][image["frame_idx"]][None]

            def render_chunk(o, d, s, p):
                r = {"rays_o": o, "rays_d": d, "depth_scale": s, "pose": p}
                ic = None if code is None else jnp.tile(code, (o.shape[0], 1))
                out = render_rays(
                    params, cfg, r, jax.random.PRNGKey(0), training=False, image_code=ic
                )
                return out["rgb_values"]

            n = rays["rays_o"].shape[0]
            rgb = chunked_apply(
                jax.jit(render_chunk), n, exp.split_n_pixels,
                jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"]),
                jnp.asarray(rays["depth_scale"]), jnp.asarray(rays["pose"]),
            )
            pred, gt = np.asarray(rgb), image["gt"]["rgb"]
            if cfg.if_hdr:
                pred = np.asarray(srgb_gamma(jnp.asarray(pred)))
                gt = np.asarray(srgb_gamma(jnp.asarray(gt)))
            rows.append((image["frame_idx"], psnr(pred, gt)))
            print(f"frame {image['frame_idx']}: psnr {rows[-1][1]:.2f}")
        with open(os.path.join(args.out_dir, "psnr.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["frame", "psnr"])
            w.writerows(rows)
            w.writerow(["mean", float(np.mean([r[1] for r in rows]))])


if __name__ == "__main__":
    main()
