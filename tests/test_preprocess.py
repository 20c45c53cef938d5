"""Preprocess pipeline tests: converters, padding, patch stitching, cue
extraction (with a stub model)."""

import json
import os

import numpy as np
import pytest

from monosdf_tpu.preprocess import (
    unit_cube_scale_mat,
    convert_scannet,
    convert_nice_slam,
    pad_dtu_cues,
    create_patches,
    merge_patches,
)
from monosdf_tpu.preprocess.common import adjust_intrinsics_crop_resize
from monosdf_tpu.preprocess.highres_stitch import align_depth, align_normal


class TestUnitCube:
    def test_scale_mat_normalizes(self):
        poses = np.tile(np.eye(4)[None], (4, 1, 1))
        poses[:, :3, 3] = [[0, 0, 0], [4, 0, 0], [0, 4, 0], [4, 4, 2]]
        sm = unit_cube_scale_mat(poses)
        # normalize = inv(scale_mat); centers should land in [-1, 1]
        norm = np.linalg.inv(sm)
        c = (norm[:3, :3] @ poses[:, :3, 3].T).T + norm[:3, 3]
        assert np.abs(c).max() <= 1.0
        # scale = 2 / (4 + 3)
        assert np.linalg.inv(sm)[0, 0] == pytest.approx(2.0 / 7.0)

    def test_ignores_invalid_poses(self):
        poses = np.tile(np.eye(4)[None], (3, 1, 1))
        poses[0, :3, 3] = [1, 1, 1]
        poses[1, :3, 3] = [-1, -1, -1]
        poses[2, 0, 0] = np.inf
        sm = unit_cube_scale_mat(poses)
        assert np.isfinite(sm).all()


class TestScannetConverter:
    @pytest.fixture
    def scannet_scene(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        d = tmp_path / "scene0000_00"
        for sub in ("frames/color", "frames/depth", "frames/pose", "intrinsic"):
            (d / sub).mkdir(parents=True)
        H, W = 60, 80
        rng = np.random.default_rng(0)
        for i in range(21):
            cv2.imwrite(
                str(d / "frames/color" / f"{i}.jpg"),
                (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8),
            )
            cv2.imwrite(
                str(d / "frames/depth" / f"{i}.png"),
                (rng.uniform(500, 3000, (H // 2, W // 2))).astype(np.uint16),
            )
            pose = np.eye(4)
            pose[:3, 3] = [0.1 * i, 0, 0]
            np.savetxt(str(d / "frames/pose" / f"{i}.txt"), pose)
        K = np.array([[50.0, 0, W / 2, 0], [0, 50.0, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
        np.savetxt(str(d / "intrinsic" / "intrinsic_color.txt"), K)
        return str(d), (H, W)

    def test_convert(self, scannet_scene, tmp_path):
        scene, (H, W) = scannet_scene
        out = str(tmp_path / "out")
        n = convert_scannet(scene, out, image_size=24, stride=10, in_hw=(H, W))
        assert n == 3  # frames 0, 10, 20
        cams = np.load(os.path.join(out, "cameras.npz"))
        assert "world_mat_2" in cams and "scale_mat_0" in cams
        import cv2

        img = cv2.imread(os.path.join(out, "000000_rgb.png"))
        assert img.shape == (24, 24, 3)
        depth = np.load(os.path.join(out, "depth_sensor", "000000.npy"))
        assert depth.shape == (24, 24) and 0.4 < depth.mean() < 3.1


class TestNiceSlamConverter:
    def test_convert(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        d = tmp_path / "apartment"
        (d / "color").mkdir(parents=True)
        (d / "scene").mkdir()
        H, W = 36, 64
        rng = np.random.default_rng(0)
        lines = []
        for i in range(5):
            cv2.imwrite(
                str(d / "color" / f"{i:06d}.jpg"),
                rng.uniform(0, 255, (H, W, 3)).astype(np.uint8),
            )
            pose = np.eye(4)
            pose[:3, 3] = [0, 0.2 * i, 0]
            lines.append(f"{i} {i} 1.0\n")
            for r in pose:
                lines.append(" ".join(map(str, r)) + "\n")
        (d / "scene" / "trajectory.log").write_text("".join(lines))
        (d / "intrinsic.json").write_text(
            json.dumps({"intrinsic_matrix": np.array(
                [[40.0, 0, 0], [0, 40.0, 0], [W / 2, H / 2, 1]]
            ).ravel().tolist()})
        )
        out = str(tmp_path / "out")
        n = convert_nice_slam(str(d), out, image_size=18, stride=2, in_hw=(H, W))
        assert n == 3
        assert os.path.exists(os.path.join(out, "cameras.npz"))


class TestIntrinsicsAdjust:
    def test_crop_resize(self):
        K = np.array([[100.0, 0, 160], [0, 100.0, 120], [0, 0, 1]])
        K2 = adjust_intrinsics_crop_resize(K, (240, 320), (240, 240), (120, 120))
        assert K2[0, 2] == pytest.approx((160 - 40) * 0.5)
        assert K2[0, 0] == pytest.approx(50.0)


class TestDtuPad:
    def test_pad(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        ind = tmp_path / "in"
        ind.mkdir()
        rng = np.random.default_rng(0)
        cv2.imwrite(str(ind / "000000_rgb.png"), rng.uniform(0, 255, (30, 40, 3)).astype(np.uint8))
        np.save(ind / "000000_depth.npy", rng.uniform(0, 1, (12, 12)).astype(np.float32))
        nrm = rng.normal(size=(3, 12, 12)).astype(np.float32)
        np.save(ind / "000000_normal.npy", nrm)
        out = str(tmp_path / "out")
        n = pad_dtu_cues(str(ind), out, H=30, W=40)
        assert n == 1
        d = np.load(os.path.join(out, "000000_depth.npy"))
        m = np.load(os.path.join(out, "000000_mask.npy"))
        assert d.shape == (30, 40) and m.shape == (30, 40)
        assert m[:, :5].sum() == 0 and m[:, 5:35].all()
        assert (d[:, :5] == 0).all()


class TestStitch:
    def test_depth_chain_recovers_affine(self):
        # ground-truth depth ramp; patches get random per-patch affine warps
        H, W = 12, 20
        gt = np.linspace(1.0, 3.0, H * W).reshape(H, W)
        patch, stride = 8, 4
        rng = np.random.default_rng(0)
        raw = create_patches(gt, patch, stride)
        patches = {}
        for k, v in raw.items():
            if k == "mid":
                patches[k] = v  # center patch keeps true scale
            else:
                s, t = rng.uniform(0.5, 2.0), rng.uniform(-1, 1)
                patches[k] = s * v + t
        merged = merge_patches(patches, "depth", patch, stride)
        assert merged.shape == gt.shape
        # after final mid alignment the global affine ambiguity is resolved
        assert np.abs(merged - gt).mean() < 0.05

    def test_normal_chain_recovers_rotation(self):
        H, W = 12, 20
        rng = np.random.default_rng(1)
        gt = rng.normal(size=(H, W, 3))
        gt /= np.linalg.norm(gt, axis=-1, keepdims=True)
        patch, stride = 8, 4
        raw = create_patches(gt, patch, stride)
        ang = 0.2
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
        )
        patches = {
            k: (v if k == "mid" else v @ R.T) for k, v in raw.items()
        }
        merged = merge_patches(patches, "normal", patch, stride)
        assert merged.shape == gt.shape
        cos = np.sum(merged * gt, axis=-1)
        assert cos.mean() > 0.99

    def test_align_depth_blends(self):
        d1 = np.ones((4, 6))
        d2 = np.ones((4, 6)) * 2  # scale-off by 2 in overlap
        out = align_depth(d1, 2 * d1[:, :6], overlap=2, axis=1)
        assert out.shape == (4, 10)
        np.testing.assert_allclose(out, 1.0, atol=1e-6)

    def test_align_normal_shapes(self):
        n1 = np.zeros((4, 6, 3)); n1[..., 2] = 1.0
        n2 = np.zeros((4, 6, 3)); n2[..., 2] = 1.0
        out = align_normal(n1, n2, overlap=2, axis=1)
        assert out.shape == (4, 10, 3)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)


class TestCueExtraction:
    def test_stub_model(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        torch = pytest.importorskip("torch")
        imgs = tmp_path / "imgs"
        imgs.mkdir()
        rng = np.random.default_rng(0)
        cv2.imwrite(str(imgs / "000000_rgb.png"), rng.uniform(0, 255, (20, 30, 3)).astype(np.uint8))

        class Stub(torch.nn.Module):
            def forward(self, x):
                return x.mean(dim=1, keepdim=True)

        from monosdf_tpu.preprocess.monocular_cues import extract_cues

        out = str(tmp_path / "cues")
        n = extract_cues(str(imgs), out, "depth", model=Stub(), img_size=16)
        assert n == 1
        d = np.load(os.path.join(out, "000000_depth.npy"))
        assert d.shape == (20, 30) and 0 <= d.min() and d.max() <= 1

    def test_missing_model_raises(self, tmp_path):
        from monosdf_tpu.preprocess.monocular_cues import extract_cues

        with pytest.raises(ValueError, match="omnidata"):
            extract_cues([], str(tmp_path), "depth")
