"""Alternate mesh extractors (reference plots.py:273-491) against analytic
SDFs: uniform-grid trace, PCA-aligned high-res flow, and bbox-cropped
extraction, plus the NumPy mesh-algebra helpers that replace trimesh."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosdf_tpu.meshing import (
    get_surface_trace,
    get_surface_high_res_mesh,
    get_surface_by_grid,
)
from monosdf_tpu.meshing.alt_extract import (
    clip_mesh_to_box,
    get_grid,
    mesh_area,
    mesh_components,
    pca_frame,
    sample_surface,
)


def sphere_sdf(pts):
    return jnp.linalg.norm(pts, axis=-1) - 0.5


def two_spheres_sdf(pts):
    """Big sphere at origin, small one offset — two components."""
    d1 = jnp.linalg.norm(pts, axis=-1) - 0.5
    d2 = jnp.linalg.norm(pts - jnp.asarray([1.2, 0.0, 0.0]), axis=-1) - 0.15
    return jnp.minimum(d1, d2)


class TestGetSurfaceTrace:
    def test_sphere_radius(self):
        out = get_surface_trace(sphere_sdf, resolution=48,
                                grid_boundary=(-1.0, 1.0))
        assert out is not None
        verts, faces = out
        r = np.linalg.norm(verts, axis=-1)
        assert abs(r.mean() - 0.5) < 0.02 and r.std() < 0.02
        assert faces.shape[0] > 0

    def test_no_crossing_returns_none(self):
        assert get_surface_trace(
            lambda p: jnp.linalg.norm(p, axis=-1) + 1.0, resolution=16
        ) is None


class TestMeshAlgebra:
    def _sphere_mesh(self):
        out = get_surface_trace(two_spheres_sdf, resolution=48,
                                grid_boundary=(-1.0, 1.6))
        assert out is not None
        return out

    def test_components_split(self):
        verts, faces = self._sphere_mesh()
        comps = mesh_components(verts, faces)
        assert len(comps) == 2
        areas = sorted(mesh_area(*c) for c in comps)
        # sphere area ~ 4 pi r^2: 0.28 vs 3.14
        assert areas[0] < 0.5 < 1.5 < areas[1]

    def test_sample_surface_on_surface(self):
        verts, faces = self._sphere_mesh()
        comps = mesh_components(verts, faces)
        v, f = max(comps, key=lambda vf: mesh_area(*vf))
        pc = sample_surface(v, f, 2000, rng=np.random.default_rng(1))
        r = np.linalg.norm(pc, axis=-1)
        assert abs(r.mean() - 0.5) < 0.02

    def test_pca_frame_right_handed_rotation(self):
        rng = np.random.default_rng(0)
        pc = rng.normal(size=(500, 3)) * np.array([3.0, 1.0, 0.2])
        _, vecs = pca_frame(pc)
        np.testing.assert_allclose(vecs @ vecs.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(vecs) > 0

    def test_clip_mesh_to_box(self):
        out = get_surface_trace(sphere_sdf, resolution=40,
                                grid_boundary=(-1.0, 1.0))
        verts, faces = out
        bb_min, bb_max = np.array([-1, -1, -1.0]), np.array([1, 1, 0.0])
        cv, cf = clip_mesh_to_box(verts, faces, bb_min, bb_max)
        assert cf.shape[0] > 0
        assert cv[:, 2].max() <= 1e-5  # everything above z=0 cut away
        # cut boundary lies on the clip plane at the sphere's equator
        ring = cv[np.abs(cv[:, 2]) < 1e-5]
        assert ring.shape[0] > 3
        np.testing.assert_allclose(
            np.linalg.norm(ring[:, :2], axis=-1), 0.5, atol=0.02
        )


class TestHighResMesh:
    def test_sphere_high_res(self):
        out = get_surface_high_res_mesh(
            sphere_sdf, resolution=64, grid_boundary=(-1.0, 1.0),
            rng=np.random.default_rng(0),
        )
        assert out is not None
        verts, faces = out
        r = np.linalg.norm(verts, axis=-1)
        assert abs(r.mean() - 0.5) < 0.01 and r.std() < 0.01

    def test_take_components_picks_largest(self):
        out = get_surface_high_res_mesh(
            two_spheres_sdf, resolution=48, grid_boundary=(-1.0, 1.6),
            rng=np.random.default_rng(0),
        )
        verts, _ = out
        # the small offset sphere is gone: all verts near the big one
        assert np.linalg.norm(verts, axis=-1).max() < 0.75


class TestSurfaceByGrid:
    def test_direct_grid(self):
        # min row scaled by 1.5: pass [-2/3, ...] so the box becomes [-1, 1]
        gp = np.array([[-2 / 3, -2 / 3, -2 / 3], [1.0, 1.0, 1.0]])
        out = get_surface_by_grid(gp, sphere_sdf, resolution=48)
        assert out is not None
        verts, _ = out
        r = np.linalg.norm(verts, axis=-1)
        assert abs(r.mean() - 0.5) < 0.02

    def test_higher_res_crops_to_bbox(self):
        gp = np.array([[-2 / 3, -2 / 3, -2 / 3], [1.0, 1.0, 0.0]])
        out = get_surface_by_grid(gp, sphere_sdf, resolution=64,
                                  higher_res=True,
                                  rng=np.random.default_rng(0))
        assert out is not None
        verts, faces = out
        assert faces.shape[0] > 0
        assert verts[:, 2].max() <= 1e-4  # bbox z-max = 0 enforced by clip
        r = np.linalg.norm(verts[verts[:, 2] < -0.05], axis=-1)
        np.testing.assert_allclose(r.mean(), 0.5, atol=0.02)


class TestGetGrid:
    def test_shortest_axis_and_spacing(self):
        pts = np.array([[0, 0, 0], [4.0, 2.0, 1.0]])
        g = get_grid(pts, 11, eps=0.0)
        assert g["shortest_axis_index"] == 2
        xs, ys, zs = g["xyz"]
        assert len(zs) == 11
        step = zs[1] - zs[0]
        np.testing.assert_allclose(xs[1] - xs[0], step, rtol=1e-6)
        np.testing.assert_allclose(ys[1] - ys[0], step, rtol=1e-6)
        assert xs.min() <= 0 and xs.max() >= 4.0
