"""Native (C++) marching tetrahedra vs the NumPy implementation.

The native extension (monosdf_tpu/native/marching_tets.cpp) must reproduce
the NumPy marching.py surface exactly: same welded vertex set, same triangle
set, same orientation. Skipped when no C++ toolchain is available.
"""

import numpy as np
import pytest

from monosdf_tpu.meshing.marching import marching_tetrahedra, weld_vertices
from monosdf_tpu.native import marching_tetrahedra_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain / native build failed"
)


def _grid(n, lo=-1.2, hi=1.2):
    xs = np.linspace(lo, hi, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    origin = np.array([lo, lo, lo], np.float32)
    spacing = np.full(3, xs[1] - xs[0], np.float32)
    return X, Y, Z, origin, spacing


def _hausdorff(a, b):
    """Max nearest-neighbour distance between point sets, both directions."""
    from scipy.spatial import cKDTree

    if len(a) == 0 and len(b) == 0:
        return 0.0
    da = cKDTree(b).query(a)[0].max()
    db = cKDTree(a).query(b)[0].max()
    return max(da, db)


def _signed_volume(verts, faces):
    t = verts[faces]
    return float(np.einsum("fi,fi->f", t[:, 0], np.cross(t[:, 1], t[:, 2])).sum() / 6)


@pytest.mark.parametrize("shape_fn", ["sphere", "box", "noise"])
def test_native_matches_numpy(shape_fn):
    X, Y, Z, origin, spacing = _grid(17)
    if shape_fn == "sphere":
        sdf = np.sqrt(X**2 + Y**2 + Z**2) - 0.8
    elif shape_fn == "box":
        q = np.stack([np.abs(X) - 0.6, np.abs(Y) - 0.5, np.abs(Z) - 0.7], -1)
        sdf = np.linalg.norm(np.maximum(q, 0), axis=-1) + np.minimum(
            q.max(-1), 0
        )
    else:
        rng = np.random.default_rng(0)
        sdf = rng.normal(size=X.shape).astype(np.float32)

    v_np, f_np = marching_tetrahedra(sdf, origin, spacing)
    v_na, f_na = marching_tetrahedra_native(sdf, origin, spacing)

    # Same triangle count (modulo degenerates the native weld collapses).
    assert f_np.shape[0] - 8 <= f_na.shape[0] <= f_np.shape[0]

    # Same surface: vertex sets and triangle centroids coincide to fp noise.
    assert _hausdorff(v_na, v_np) < 1e-5
    c_na = v_na[f_na].mean(1)
    c_np = v_np[f_np].mean(1)
    assert _hausdorff(c_na, c_np) < 1e-5

    # Same orientation: signed volumes agree.
    assert abs(_signed_volume(v_na, f_na) - _signed_volume(v_np, f_np)) < 1e-4

    # Native output is welded per edge: far fewer vertices than the numpy
    # triangle soup, same unique positions. (Positional weld can merge MORE
    # when crossings land exactly on shared grid nodes, e.g. the box case.)
    assert v_na.shape[0] < v_np.shape[0] / 2
    uniq_na = np.unique(np.round(v_na, 5), axis=0).shape[0]
    vw, _ = weld_vertices(v_np, f_np)
    uniq_np = np.unique(np.round(vw, 5), axis=0).shape[0]
    assert uniq_na == uniq_np


def test_native_welded_watertight_sphere():
    X, Y, Z, origin, spacing = _grid(33)
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - 0.8
    v, f = marching_tetrahedra_native(sdf, origin, spacing)
    assert v.shape[0] > 0
    # verts on the sphere
    r = np.linalg.norm(v, axis=-1)
    assert np.all(np.abs(r - 0.8) < 0.1)
    # watertight: every edge shared by exactly 2 faces
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)
    # outward orientation: normal . position > 0
    n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    c = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3
    assert np.mean(np.sum(n * c, -1) > 0) > 0.99


def test_native_level_offset():
    X, Y, Z, origin, spacing = _grid(17)
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - 0.8
    v, _ = marching_tetrahedra_native(sdf, origin, spacing, level=0.1)
    r = np.linalg.norm(v, axis=-1)
    assert np.all(np.abs(r - 0.9) < 0.1)


def test_native_empty():
    sdf = np.ones((8, 8, 8), np.float32)
    v, f = marching_tetrahedra_native(sdf, np.zeros(3), np.ones(3))
    assert v.shape == (0, 3) and f.shape == (0, 3)
