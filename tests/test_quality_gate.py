"""CI-style quality gate (VERDICT #3): train the tiny synthetic-sphere
scene through the REAL CLI for a few hundred iterations on CPU and assert
photometric AND geometric convergence — numbers, not a smoke test.

The full-scale evidence run is scripts/quality_run.py (20k iters on the
TPU, production-width MLP); committed results live in docs/quality/ and
QUALITY.md. This gate keeps the end-to-end loss surface honest per-commit.
"""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("qgate")
    data_root = root / "data"

    import make_synthetic_scene  # scripts/ is on sys.path via conftest

    old = sys.argv
    sys.argv = ["gen", str(data_root), "--n", "6", "--res", "48"]
    try:
        make_synthetic_scene.main()
    finally:
        sys.argv = old

    conf_add = root / "qgate.conf"
    conf_add.write_text(
        "train{ num_pixels = 256 }\n"
        "dataset{ use_mask = True }\n"
    )

    from monosdf_tpu.cli.train import main as train_main

    sys.argv = [
        "train", "--conf", "confs/synth_sphere_tiny.conf",
        "--conf_add", str(conf_add),
        "--data_root", str(data_root), "--exps_root", str(root / "exps"),
        "--n_devices", "1", "--timestamp", "qgate", "--max_iters", "600",
    ]
    try:
        train_main()
    finally:
        sys.argv = old

    return root / "exps" / "qgate-synth_sphere_tiny"


class TestQualityGate:
    def test_psnr_and_loss_converge(self, trained_run):
        rows = [
            json.loads(l)
            for l in open(trained_run / "metrics.jsonl")
        ]
        tail = rows[-5:]
        psnr = float(np.mean([r["psnr"] for r in tail]))
        loss = float(np.mean([r["loss"] for r in tail]))
        assert psnr >= 13.0, f"train PSNR {psnr:.2f} < 13 after 600 iters"
        assert loss <= 0.15, f"train loss {loss:.3f} > 0.15 after 600 iters"
        assert rows[0]["loss"] > 2 * loss, "loss did not descend"

    def test_geometry_approaches_gt_sphere(self, trained_run):
        from monosdf_tpu.meshing import read_ply

        plots = trained_run / "plots"
        plys = sorted(plots.glob("*.ply"))
        assert plys, f"no mesh written under {plots}"
        v, f = read_ply(str(plys[-1]))
        assert len(v) > 500
        radii = np.linalg.norm(np.asarray(v), axis=-1)
        mean_err = float(np.abs(radii - 0.5).mean())
        # full convergence needs ~10k iters (see docs/quality); at 600 the
        # masked-depth run must already have pulled the init shell (0.85+)
        # well toward the GT 0.5 sphere
        assert mean_err <= 0.30, f"mean |r - 0.5| = {mean_err:.3f} > 0.30"
