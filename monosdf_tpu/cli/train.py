"""Training CLI — the exp_runner.py equivalent.

Usage:
    python -m monosdf_tpu.cli.train --conf confs/scannet_mlp.conf \
        [--conf_add overlay.conf] [--scan_id scan1] [--resume] \
        [--data_root ../data] [--exps_root ../exps] [--max_iters N]

Multi-host TPU: run the same command on every host after setting the usual
JAX distributed env; `jax.distributed.initialize()` is called when
--multihost is passed (replaces torch.distributed.launch + NCCL init,
reference exp_runner.py:65-77).
"""

from __future__ import annotations

import argparse

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", required=True)
    ap.add_argument("--conf_add", default=None)
    ap.add_argument("--scan_id", default="")
    ap.add_argument("--data_root", default="../data")
    ap.add_argument("--exps_root", default="../exps")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--load_from", default=None,
                    help="warm-start from another run's latest checkpoint, "
                         "matched by run-dir prefix (exp_runner.py:29)")
    ap.add_argument("--prefix", default="",
                    help="expname prefix (exp_runner.py:27)")
    ap.add_argument("--append", default="",
                    help="expname suffix (exp_runner.py:26)")
    ap.add_argument("--timestamp", default=None)
    ap.add_argument("--max_iters", type=int, default=None)
    ap.add_argument("--n_devices", type=int, default=0, help="0 = all local devices")
    ap.add_argument("--multihost", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--profile_dir", default=None,
                    help="write a jax.profiler trace of the first 50 steps")
    args = ap.parse_args()

    if args.multihost:
        jax.distributed.initialize()

    from ..config import build_configs, merge_configs, parse_hocon_file
    from ..data import DatasetConfig, SceneDataset
    from .common import dataset_config_from_conf

    conf = parse_hocon_file(args.conf)
    if args.conf_add:
        conf = merge_configs(conf, parse_hocon_file(args.conf_add))
    exp = build_configs(conf)

    ds_cfg = dataset_config_from_conf(exp.dataset, args.data_root, args.scan_id, "train")
    train_ds = SceneDataset(ds_cfg)
    val_cfg = dataset_config_from_conf(exp.dataset, args.data_root, args.scan_id, "val")
    try:
        val_ds = SceneDataset(val_cfg)
        val_images = [val_ds.image_rays(i) for i in range(min(2, len(val_ds.frame_idx_list)))]
    except Exception as e:  # val split optional
        print(f"no val split: {e}")
        val_images = []

    n_devices = args.n_devices or jax.local_device_count()

    from ..train.trainer import Trainer

    trainer = Trainer(
        exp,
        train_ds.pixel_rays(),
        val_images=val_images,
        exps_root=args.exps_root,
        expname_suffix=(f"_{args.scan_id}" if args.scan_id else "") + args.append,
        expname_prefix=args.prefix,
        resume=args.resume,
        load_from=args.load_from,
        timestamp=args.timestamp,
        seed=args.seed,
        n_devices=n_devices,
        scale=train_ds.scale,
        center=train_ds.center,
    )
    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            trainer.train(
                max_iters=min(50, args.max_iters or 50)
            )
    trainer.train(max_iters=args.max_iters)
    if val_images:
        print("val:", trainer.validate())
    print("mesh:", trainer.export_mesh()[0])


if __name__ == "__main__":
    main()
