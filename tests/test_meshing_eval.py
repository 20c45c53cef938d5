"""Marching tetrahedra, mesh extraction, PLY IO, and metric tests — all
against analytic spheres."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosdf_tpu.meshing import (
    marching_tetrahedra,
    extract_mesh,
    write_ply,
    read_ply,
)
from monosdf_tpu.meshing.marching import weld_vertices
from monosdf_tpu.eval import (
    psnr,
    chamfer_distance,
    f_score,
    normal_consistency,
    sample_mesh_surface,
    mesh_metrics_3d,
)


def sphere_grid(n=33, r=0.5, lo=-1.0, hi=1.0):
    xs = np.linspace(lo, hi, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - r
    spacing = xs[1] - xs[0]
    return sdf, np.array([lo, lo, lo], np.float32), spacing


class TestMarchingTets:
    def test_sphere_radius(self):
        sdf, origin, spacing = sphere_grid(n=49)
        verts, faces = marching_tetrahedra(sdf, origin, spacing)
        assert len(verts) > 100 and len(faces) > 0
        radii = np.linalg.norm(verts, axis=-1)
        assert abs(radii.mean() - 0.5) < 0.01
        assert radii.std() < 0.01

    def test_outward_orientation(self):
        sdf, origin, spacing = sphere_grid(n=33)
        verts, faces = marching_tetrahedra(sdf, origin, spacing)
        tri = verts[faces]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        centroid = tri.mean(1)
        # outward normal: points along +centroid direction for a sphere
        dots = np.einsum("fd,fd->f", n, centroid)
        assert (dots > 0).mean() > 0.99

    def test_empty_grid(self):
        sdf = np.ones((8, 8, 8), np.float32)
        verts, faces = marching_tetrahedra(sdf, np.zeros(3), 0.1)
        assert len(verts) == 0 and len(faces) == 0

    def test_watertight_after_weld(self):
        sdf, origin, spacing = sphere_grid(n=25)
        verts, faces = marching_tetrahedra(sdf, origin, spacing)
        wv, wf = weld_vertices(verts, faces)
        assert len(wv) < len(verts)
        # Euler characteristic of a sphere: V - E + F = 2
        edges = set()
        for f in wf:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                edges.add((min(f[a], f[b]), max(f[a], f[b])))
        euler = len(wv) - len(edges) + len(wf)
        assert euler == 2, f"Euler characteristic {euler}"


class TestExtract:
    def test_extract_sphere_jax_sdf(self):
        def sdf_fn(p):
            return jnp.linalg.norm(p, axis=-1) - 0.5

        verts, faces = extract_mesh(
            sdf_fn, resolution=48, grid_boundary=(-1.0, 1.0), crop_n=24, chunk=4096
        )
        assert len(verts) > 0
        radii = np.linalg.norm(verts, axis=-1)
        assert abs(radii.mean() - 0.5) < 0.02

    def test_world_unnormalization(self):
        def sdf_fn(p):
            return jnp.linalg.norm(p, axis=-1) - 0.5

        verts, _ = extract_mesh(
            sdf_fn, resolution=24, grid_boundary=(-1.0, 1.0), crop_n=24,
            chunk=4096, scale=0.5, center=(1.0, 2.0, 3.0),
        )
        center = verts.mean(0)
        np.testing.assert_allclose(center, [1.0, 2.0, 3.0], atol=0.05)
        radii = np.linalg.norm(verts - np.array([1.0, 2.0, 3.0]), axis=-1)
        assert abs(radii.mean() - 1.0) < 0.05  # 0.5 / 0.5 scale


class TestPly:
    def test_roundtrip(self, tmp_path):
        verts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
        p = str(tmp_path / "m.ply")
        write_ply(p, verts, faces)
        v2, f2 = read_ply(p)
        np.testing.assert_allclose(v2, verts, rtol=1e-6)
        np.testing.assert_array_equal(f2, faces)


class TestMetrics:
    def _sphere_mesh(self, r, n=41):
        sdf, origin, spacing = sphere_grid(n=n, r=r)
        verts, faces = marching_tetrahedra(sdf, origin, spacing)
        return weld_vertices(verts, faces)

    def test_psnr(self):
        a = np.zeros((4, 4))
        b = np.full((4, 4), 0.1)
        np.testing.assert_allclose(psnr(a, b), 20.0, rtol=1e-5)

    def test_chamfer_identical(self):
        v, f = self._sphere_mesh(0.5)
        p, _ = sample_mesh_surface(v, f, 5000)
        a2b, b2a, ch = chamfer_distance(p, p)
        assert ch < 1e-9

    def test_chamfer_concentric_spheres(self):
        v1, f1 = self._sphere_mesh(0.5)
        v2, f2 = self._sphere_mesh(0.6)
        p1, _ = sample_mesh_surface(v1, f1, 20000)
        p2, _ = sample_mesh_surface(v2, f2, 20000)
        _, _, ch = chamfer_distance(p1, p2)
        assert 0.07 < ch < 0.13  # ~0.1 radial gap

    def test_fscore(self):
        v1, f1 = self._sphere_mesh(0.5)
        p1, _ = sample_mesh_surface(v1, f1, 10000)
        prec, rec, fs = f_score(p1, p1 + 0.001, threshold=0.05)
        assert fs > 0.99
        prec, rec, fs2 = f_score(p1, p1 * 2.0, threshold=0.05)
        assert fs2 < 0.5

    def test_normal_consistency_sphere(self):
        v, f = self._sphere_mesh(0.5)
        p, n = sample_mesh_surface(v, f, 10000)
        nc = normal_consistency(p, n, p, n)
        assert nc > 0.999

    def test_full_suite(self):
        v1, f1 = self._sphere_mesh(0.5)
        v2, f2 = self._sphere_mesh(0.52)
        m = mesh_metrics_3d(v1, f1, v2, f2, n_samples=20000)
        assert 0.01 < m["chamfer"] < 0.04
        assert m["f_score"] > 0.9
        assert m["normal_consistency"] > 0.97


class TestPyramid:
    def test_pyramid_matches_dense_near_surface(self):
        import jax.numpy as jnp
        from monosdf_tpu.meshing.extract import sdf_grid_eval, sdf_grid_eval_pyramid
        from monosdf_tpu.meshing.marching import marching_tetrahedra

        def sdf(p):
            return jnp.linalg.norm(p, axis=-1) - 0.5

        xs = np.linspace(-0.8, 0.8, 65, dtype=np.float32)
        dense = sdf_grid_eval(sdf, xs, xs, xs, chunk=4096)
        pyr = sdf_grid_eval_pyramid(sdf, xs, xs, xs, chunk=4096)
        assert pyr.shape == dense.shape and np.isfinite(pyr).all()
        # identical where it matters: every point near the surface
        near = np.abs(dense) < 0.1
        np.testing.assert_allclose(pyr[near], dense[near], atol=1e-6)
        # sign agrees everywhere (what marching cubes consumes)
        assert (np.sign(pyr) == np.sign(dense)).mean() > 0.999
        # and the extracted surfaces match
        sp = np.array([xs[1] - xs[0]] * 3)
        org = np.array([xs[0]] * 3)
        v1, _ = marching_tetrahedra(dense, org, sp)
        v2, _ = marching_tetrahedra(pyr, org, sp)
        r1 = np.linalg.norm(v1, axis=-1).mean()
        r2 = np.linalg.norm(v2, axis=-1).mean()
        assert abs(r1 - r2) < 1e-4

    def test_pyramid_fallback_on_bad_stride(self):
        import jax.numpy as jnp
        from monosdf_tpu.meshing.extract import sdf_grid_eval_pyramid

        def sdf(p):
            return jnp.linalg.norm(p, axis=-1) - 0.5

        xs = np.linspace(-0.8, 0.8, 30, dtype=np.float32)  # 29 not divisible by 8
        out = sdf_grid_eval_pyramid(sdf, xs, xs, xs, chunk=4096)
        assert out.shape == (30, 30, 30) and np.isfinite(out).all()
