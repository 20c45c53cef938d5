"""Trajectory renderer and experiment-tools tests."""

import os

import numpy as np
import pytest

from monosdf_tpu.render import (
    interpolate_poses,
    render_mesh_frame,
    poses_from_cameras,
)
from monosdf_tpu.tools import gc_checkpoints, gc_plots, gc_experiments


def _sphere(radius=0.5):
    from monosdf_tpu.meshing.extract import extract_mesh
    import jax.numpy as jnp

    return extract_mesh(
        lambda p: jnp.linalg.norm(p, axis=-1) - radius,
        resolution=32,
        grid_boundary=(-0.8, 0.8),
    )


class TestInterpolation:
    def test_endpoint_and_count(self):
        p0 = np.eye(4)
        p1 = np.eye(4)
        ang = 0.5
        p1[:3, :3] = [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ]
        p1[:3, 3] = [1, 2, 3]
        out = interpolate_poses(np.stack([p0, p1]), 11)
        assert out.shape == (11, 4, 4)
        np.testing.assert_allclose(out[0], p0, atol=1e-6)
        np.testing.assert_allclose(out[-1], p1, atol=1e-5)
        # midpoint rotation is half-angle (slerp), positions linear
        np.testing.assert_allclose(out[5][:3, 3], [0.5, 1.0, 1.5], atol=1e-6)
        assert out[5][0, 0] == pytest.approx(np.cos(ang / 2), abs=1e-5)

    def test_rotations_stay_orthonormal(self):
        rng = np.random.default_rng(0)
        poses = []
        for _ in range(3):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            from monosdf_tpu.ops.geometry import quat_to_rot_np

            m = np.eye(4)
            m[:3, :3] = quat_to_rot_np(q)
            poses.append(m)
        out = interpolate_poses(np.stack(poses), 20)
        for m in out:
            np.testing.assert_allclose(
                m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-5
            )


class TestRenderFrame:
    def test_shading_modes(self):
        verts, faces = _sphere()
        K = np.array([[60.0, 0, 16, 0], [0, 60.0, 16, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, -2]
        for shading in ("depth", "normal", "lambert"):
            img = render_mesh_frame(verts, faces, K, pose, 32, 32, shading)
            assert img.shape == (32, 32, 3) and img.dtype == np.uint8
            assert (img[0, 0] == 255).all()  # white background
            assert (img[16, 16] != 255).any()  # sphere hit at center

    def test_poses_from_cameras(self, tmp_path):
        K = np.array([[50.0, 0, 10], [0, 50.0, 10], [0, 0, 1]])
        pose = np.eye(4)
        pose[:3, 3] = [0.3, 0, -1]
        w2c = np.linalg.inv(pose)
        P4 = np.eye(4)
        P4[:3, :4] = K @ w2c[:3, :4]
        np.savez(
            tmp_path / "cameras.npz",
            world_mat_0=P4.astype(np.float32),
            scale_mat_0=np.eye(4, dtype=np.float32),
        )
        Ks, poses = poses_from_cameras(str(tmp_path / "cameras.npz"))
        np.testing.assert_allclose(poses[0][:3, 3], [0.3, 0, -1], atol=1e-4)
        np.testing.assert_allclose(Ks[0][0, 0], 50.0, rtol=1e-4)


class TestCleanup:
    def _mk_run(self, root, name, epochs=(1, 2, 3, 4, 5)):
        run = root / name
        (run / "checkpoints").mkdir(parents=True)
        (run / "plots" / "logs").mkdir(parents=True)
        for e in epochs:
            (run / "checkpoints" / f"{e}.ckpt").write_bytes(b"x")
            (run / "plots" / f"surface_{e}.ply").write_bytes(b"x")
            (run / "plots" / f"VAL_rendering_{e}_0.png").write_bytes(b"x")
        (run / "checkpoints" / "latest.ckpt").write_bytes(b"x")
        return run

    def test_gc_checkpoints_keeps_latest(self, tmp_path):
        run = self._mk_run(tmp_path, "r1")
        removed = gc_checkpoints(str(run / "checkpoints"), keep_last=2)
        assert len(removed) == 3
        left = sorted(os.listdir(run / "checkpoints"))
        assert left == ["4.ckpt", "5.ckpt", "latest.ckpt"]

    def test_gc_plots_by_epoch(self, tmp_path):
        run = self._mk_run(tmp_path, "r2")
        removed = gc_plots(str(run / "plots"), keep_last=2)
        assert len(removed) == 6  # epochs 1-3 x 2 files
        assert os.path.isdir(run / "plots" / "logs")  # untouched
        assert (run / "plots" / "surface_5.ply").exists()

    def test_gc_experiments_dry_run(self, tmp_path):
        self._mk_run(tmp_path, "r3")
        report = gc_experiments(str(tmp_path), keep_ckpt=1, keep_plots=1,
                                dry_run=True)
        assert "r3" in report
        # dry run removed nothing
        assert (tmp_path / "r3" / "checkpoints" / "1.ckpt").exists()


class TestTransfer:
    def test_collect_files(self, tmp_path):
        from monosdf_tpu.tools.transfer import collect_files

        run = tmp_path / "run"
        (run / "checkpoints").mkdir(parents=True)
        (run / "plots").mkdir()
        for n in ("10.ckpt", "latest.ckpt"):
            (run / "checkpoints" / n).write_bytes(b"x")
        (run / "runconf.conf").write_text("x")
        (run / "plots" / "surface_10.ply").write_bytes(b"x")
        (run / "plots" / "surface_5.ply").write_bytes(b"x")
        files = collect_files(str(run))
        names = {os.path.basename(f) for f in files}
        assert "latest.ckpt" in names and "runconf.conf" in names
        assert "surface_10.ply" in names or "surface_5.ply" in names
