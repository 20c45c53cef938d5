"""Batch mesh extraction from trained checkpoints.

Equivalent of the reference's
scripts/extract_all_meshes_from_pretrained_models.py: loop (conf, scan,
checkpoint) triples -> evaluation CLI -> world-space meshes at a chosen
resolution.

    python scripts/extract_all_meshes.py --exps_root ../exps \
        --data_root ../data --out_dir meshes [--resolution 512]

Every run directory under exps_root with a checkpoints/latest.ckpt and a
runconf.conf gets a mesh.
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exps_root", required=True)
    ap.add_argument("--data_root", default="../data")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--world_space", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    runs = sorted(glob(os.path.join(args.exps_root, "*")))
    done = 0
    for run in runs:
        conf = os.path.join(run, "runconf.conf")
        ckpt_dir = os.path.join(run, "checkpoints")
        if not (os.path.exists(conf) and os.path.exists(
            os.path.join(ckpt_dir, "latest.ckpt")
        )):
            continue
        name = os.path.basename(run)
        out = os.path.join(args.out_dir, name)
        print(f"=== {name}")
        import subprocess

        cmd = [
            sys.executable, "-m", "monosdf_tpu.cli.eval",
            "--conf", conf, "--checkpoint_dir", ckpt_dir,
            "--data_root", args.data_root,
            "--resolution", str(args.resolution), "--out_dir", out,
        ]
        if args.world_space:
            cmd.append("--world_space")
        r = subprocess.run(cmd)
        done += r.returncode == 0
    print(f"extracted {done} meshes -> {args.out_dir}")


if __name__ == "__main__":
    main()
