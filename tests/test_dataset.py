"""SceneDataset tests against a generated on-disk scene that follows the
reference data contract (SURVEY.md §2.6)."""

import os

import numpy as np
import pytest

from monosdf_tpu.data import DatasetConfig, SceneDataset


@pytest.fixture(scope="module")
def fake_scene(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("data")
    scene = root / "fake_scene"
    (scene / "Image").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "normal").mkdir()

    H, W = 12, 16
    n = 3
    rng = np.random.default_rng(0)
    K = np.array(
        [[20.0, 0, W / 2, 0], [0, 20.0, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=np.float64,
    )
    cam = {}
    for i in range(n):
        name = f"{i:03d}_{i + 1:04d}"
        img = (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(scene / "Image" / f"{name}.png"), img)
        np.save(scene / "depth" / f"{name}.npy", rng.uniform(0.5, 2.0, (H, W)).astype(np.float32))
        nrm = rng.normal(size=(H, W, 3))
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        np.save(scene / "normal" / f"{name}.npy", ((nrm + 1) / 2).transpose(2, 0, 1).astype(np.float32))

        ang = 0.3 * i
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
        )
        C = np.array([0.1 * i, 0.0, -2.0])
        t = -R @ C
        P = np.eye(4)
        P[:3, :4] = K[:3, :3] @ np.concatenate([R, t[:, None]], 1)
        cam[f"world_mat_{i}"] = P.astype(np.float32)
        cam[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(scene / "cameras.npz", **cam)
    np.save(
        scene / "scale_mat.npy",
        np.array({"center": np.zeros(3), "scale": 0.5}, dtype=object),
        allow_pickle=True,
    )
    return str(root), "fake_scene", (H, W), n


class TestSceneDataset:
    def test_load_and_shapes(self, fake_scene):
        root, name, (H, W), n = fake_scene
        ds = SceneDataset(
            DatasetConfig(data_dir=name, img_res=(H, W), data_root=root, if_gt_data=True)
        )
        assert ds.n_images == n
        assert ds.rgb_images.shape == (n, H * W, 3)
        assert ds.depth_images.shape == (n, H * W, 1)
        assert ds.normal_images.shape == (n, H * W, 3)
        # GT depth scaled by scene scale 0.5 -> within [0.25, 1.0]
        assert 0.2 < ds.depth_images.min() and ds.depth_images.max() <= 1.01
        # normals back in [-1, 1]
        assert abs(np.linalg.norm(ds.normal_images, axis=-1).mean() - 1.0) < 1e-3

    def test_camera_recovery(self, fake_scene):
        root, name, (H, W), n = fake_scene
        ds = SceneDataset(
            DatasetConfig(data_dir=name, img_res=(H, W), data_root=root)
        )
        # camera 0: identity rotation, center (0,0,-2)
        np.testing.assert_allclose(ds.pose_all[0][:3, 3], [0, 0, -2], atol=1e-4)
        np.testing.assert_allclose(ds.intrinsics_all[0][0, 0], 20.0, rtol=1e-4)

    def test_pixel_rays(self, fake_scene):
        root, name, (H, W), n = fake_scene
        ds = SceneDataset(DatasetConfig(data_dir=name, img_res=(H, W), data_root=root))
        rays = ds.pixel_rays()
        N = n * H * W
        assert rays["rays_o"].shape == (N, 3)
        assert rays["rays_d"].shape == (N, 3)
        np.testing.assert_allclose(
            np.linalg.norm(rays["rays_d"], axis=-1), 1.0, rtol=1e-5
        )
        assert rays["pose"].shape == (N, 4, 4)
        assert rays["indices"].shape == (N,)
        # center-ish pixel of frame 0 points roughly along +z
        center_ray = rays["rays_d"][(H // 2) * W + W // 2]
        assert center_ray[2] > 0.9
        # depth_scale in (0, 1]
        assert (rays["depth_scale"] > 0).all() and (rays["depth_scale"] <= 1 + 1e-6).all()

    def test_frame_split(self, fake_scene):
        root, name, (H, W), n = fake_scene
        ds_train = SceneDataset(
            DatasetConfig(
                data_dir=name, img_res=(H, W), data_root=root,
                val_frame_num=1, split="train",
            )
        )
        ds_val = SceneDataset(
            DatasetConfig(
                data_dir=name, img_res=(H, W), data_root=root,
                val_frame_num=1, split="val",
            )
        )
        assert len(ds_train.frame_idx_list) == n - 1
        assert len(ds_val.frame_idx_list) == 1
        assert not set(ds_train.frame_idx_list) & set(ds_val.frame_idx_list)

    def test_image_rays(self, fake_scene):
        root, name, (H, W), n = fake_scene
        ds = SceneDataset(DatasetConfig(data_dir=name, img_res=(H, W), data_root=root))
        im = ds.image_rays(1)
        assert im["rays"]["rays_o"].shape == (H * W, 3)
        assert im["gt"]["rgb"].shape == (H * W, 3)
        assert im["frame_idx"] == 1

    def test_scale_mat(self, fake_scene):
        root, name, (H, W), n = fake_scene
        ds = SceneDataset(DatasetConfig(data_dir=name, img_res=(H, W), data_root=root))
        m = ds.get_scale_mat()
        np.testing.assert_allclose(np.diag(m)[:3], 2.0)  # 1/scale
