"""Mesh evaluation suite tests: rasterizer, TSDF refuse, culling, ICP,
dataset-flavor metrics."""

import numpy as np
import pytest

from monosdf_tpu.mesh_eval import (
    rasterize_depth,
    cull_by_frustum,
    cull_by_mask,
    TSDFVolume,
    refuse_mesh,
    eval_scannet,
    eval_replica,
    eval_dtu,
    icp_align,
)
from monosdf_tpu.mesh_eval.suites import transform_points
from monosdf_tpu.meshing.extract import extract_mesh


def _camera(H=32, W=32, f=40.0, eye=(0, 0, -2.0)):
    K = np.array([[f, 0, W / 2, 0], [0, f, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
    pose = np.eye(4)
    pose[:3, 3] = eye  # looking along +z
    return K, pose


def _sphere_mesh(radius=0.5, resolution=48):
    def sdf(p):
        import jax.numpy as jnp

        return jnp.linalg.norm(p, axis=-1) - radius

    return extract_mesh(sdf, resolution=resolution, grid_boundary=(-0.8, 0.8))


class TestRasterizer:
    def test_quad_depth(self):
        # two triangles spanning a z=1 plane facing the camera at z=-2
        verts = np.array(
            [[-1, -1, 1.0], [1, -1, 1.0], [1, 1, 1.0], [-1, 1, 1.0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]])
        K, pose = _camera()
        depth = rasterize_depth(verts, faces, K, pose, 32, 32)
        # center pixels see the plane at distance 3 (camera z=-2 plane z=1)
        assert depth[16, 16] == pytest.approx(3.0, abs=1e-3)
        assert (depth > 0).mean() > 0.5

    def test_occlusion_min_depth(self):
        verts = np.array(
            [
                [-1, -1, 1.0], [1, -1, 1.0], [0, 1, 1.0],      # far tri
                [-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0, 0.5, 0.0],  # near tri
            ],
            np.float32,
        )
        faces = np.array([[0, 1, 2], [3, 4, 5]])
        K, pose = _camera()
        depth = rasterize_depth(verts, faces, K, pose, 32, 32)
        assert depth[16, 16] == pytest.approx(2.0, abs=1e-3)  # near wins

    def test_sphere_depth_analytic(self):
        verts, faces = _sphere_mesh()
        K, pose = _camera(f=60.0)
        depth = rasterize_depth(verts, faces, K, pose, 32, 32)
        # central ray hits the sphere front at 2 - 0.5 = 1.5
        assert depth[16, 16] == pytest.approx(1.5, abs=0.05)
        assert depth[0, 0] == 0.0  # background


class TestTSDF:
    def test_single_view_integrate(self):
        K, pose = _camera()
        depth = np.full((32, 32), 3.0, np.float32)  # plane at z=1
        vol = TSDFVolume([-0.3, -0.3, 0.5], [0.3, 0.3, 1.5], voxel=0.05)
        vol.integrate(depth, K, pose)
        verts, faces = vol.extract()
        assert len(verts) > 0
        # extracted surface should sit near z=1
        assert np.abs(verts[:, 2] - 1.0).mean() < 0.05

    def test_refuse_sphere_roundtrip(self):
        verts, faces = _sphere_mesh()
        K4, _ = _camera(f=60.0)
        poses, intrs = [], []
        for ang in np.linspace(0, 2 * np.pi, 6, endpoint=False):
            eye = np.array([2.0 * np.sin(ang), 0.0, -2.0 * np.cos(ang)])
            z = -eye / np.linalg.norm(eye)
            x = np.cross(np.array([0.0, 1.0, 0.0]), z)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            pose = np.eye(4)
            pose[:3, :3] = np.stack([x, y, z], axis=-1)
            pose[:3, 3] = eye
            poses.append(pose)
            intrs.append(K4)
        rv, rf = refuse_mesh(verts, faces, intrs, poses, 32, 32, voxel=0.04)
        assert len(rv) > 0
        r = np.linalg.norm(rv, axis=-1)
        assert abs(r.mean() - 0.5) < 0.08  # still a ~0.5 sphere


class TestCull:
    def test_frustum_cull_keeps_visible(self):
        verts = np.array([[0, 0, 1.0], [0, 0, -5.0], [0.05, 0, 1.0], [0, 0.05, 1.0]])
        faces = np.array([[0, 2, 3], [1, 2, 3]])
        K, pose = _camera()
        v2, f2 = cull_by_frustum(verts, faces, [K], [pose], 32, 32)
        # the behind-camera vertex is dropped along with its face
        assert len(v2) == 3 and len(f2) == 1

    def test_mask_cull(self):
        verts = np.array([[0, 0, 1.0], [0.8, 0, 1.0], [0.01, 0, 1.0], [0, 0.01, 1.0]])
        faces = np.array([[0, 2, 3], [1, 2, 3]])
        K, pose = _camera()
        mask = np.zeros((32, 32), np.float32)
        mask[12:20, 12:20] = 1.0  # center blob only
        v2, f2 = cull_by_mask(verts, faces, [K], [pose], [mask], 32, 32,
                              dilate_radius=2)
        assert len(v2) == 3  # off-center vertex culled


class TestICP:
    def test_recovers_rigid_transform(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (2000, 3))
        ang = 0.1
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
        )
        t = np.array([0.05, -0.02, 0.03])
        dst = pts @ R.T + t
        T = icp_align(pts, dst, iters=30)
        aligned = transform_points(pts, T)
        assert np.abs(aligned - dst).max() < 1e-3


class TestSuites:
    def test_eval_dtu_identical_meshes(self):
        verts, faces = _sphere_mesh(resolution=32)
        from monosdf_tpu.eval.metrics import sample_mesh_surface

        gt_pts, _ = sample_mesh_surface(verts, faces, 20000, seed=7)
        m = eval_dtu(verts, faces, gt_pts, downsample_density=0.05, max_dist=1.0,
                     n_samples=20000)
        assert m["overall"] < 0.05

    def test_eval_dtu_obs_mask_restricts(self):
        verts, faces = _sphere_mesh(resolution=32)
        from monosdf_tpu.eval.metrics import sample_mesh_surface

        gt_pts, _ = sample_mesh_surface(verts, faces, 5000, seed=7)
        # observability volume covering only x > 0
        mask = np.zeros((2, 1, 1), bool)
        mask[1] = True
        m = eval_dtu(
            verts, faces, gt_pts, downsample_density=0.05, max_dist=1.0,
            n_samples=5000,
            obs_mask={"mask": mask, "bb": np.array([-1.0, -1.0, -1.0]), "res": 1.0},
        )
        assert m["overall"] < 0.1

    def test_eval_replica_crop_and_metrics(self):
        verts, faces = _sphere_mesh(resolution=32)
        m = eval_replica(verts, faces, verts, faces, n_samples=10000)
        assert m["f_score"] > 0.99
        assert m["accuracy_cm"] == pytest.approx(m["accuracy"] * 100)

    def test_eval_scannet_no_refuse(self):
        verts, faces = _sphere_mesh(resolution=32)
        m = eval_scannet(verts, faces, verts, faces, [], [], 32, 32,
                         refuse=False, n_samples=10000)
        assert m["f_score"] > 0.99 and "recall" in m
