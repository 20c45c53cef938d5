"""Sliding-window SDF grid evaluation + mesh extraction.

Reference: code/utils/plots.py get_surface_sliding (:108-226): the domain
[grid_boundary]^3 is split into crops; each crop's SDF is evaluated in
fixed-size chunks on device (with a coarse-to-fine point pyramid in the
reference — here one dense pass per crop with jit'd fixed-shape chunks, which
XLA pipelines efficiently; the pyramid is a host-side culling optimization
that can be layered on later); marching tetrahedra runs on host per crop and
meshes are concatenated. Vertices can be mapped to world coordinates via
verts/scale + center (plots.py:207-210).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def sdf_grid_eval(sdf_fn, xs, ys, zs, chunk: int = 131072) -> np.ndarray:
    """Evaluate sdf_fn on the grid xs × ys × zs in fixed-shape chunks.

    sdf_fn: (N,3) jnp -> (N,) jnp (jit'd outside or in here once).
    Returns (len(xs), len(ys), len(zs)) numpy array.
    """
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)
    n = pts.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        pts = np.concatenate([pts, np.zeros((n_pad, 3), np.float32)], 0)
    out = np.empty(pts.shape[0], np.float32)
    jitted = jax.jit(sdf_fn)
    for i in range(0, pts.shape[0], chunk):
        out[i:i + chunk] = np.asarray(jitted(jnp.asarray(pts[i:i + chunk])))
    return out[:n].reshape(len(xs), len(ys), len(zs))


def extract_mesh(
    sdf_fn,
    resolution: int = 512,
    grid_boundary=(-1.1, 1.1),
    level: float = 0.0,
    crop_n: int = 128,
    chunk: int = 131072,
    scale: float | None = None,
    center=None,
):
    """Extract the SDF zero-level-set mesh over the cube [lo, hi]^3.

    Mirrors get_surface_sliding's crop decomposition (plots.py:110-141):
    resolution is split into ceil(res / crop_n) crops per axis; grids share
    boundary planes so crops stitch seamlessly.

    scale/center: optional world un-normalization verts/scale + center
    (plots.py:207-210).
    Returns (verts (V,3), faces (F,3)).
    """
    from .marching import marching_tetrahedra

    lo, hi = float(grid_boundary[0]), float(grid_boundary[1])
    n_crops = max(1, -(-resolution // crop_n))
    # global grid coordinates (resolution+1 points so crops share planes)
    coords = np.linspace(lo, hi, resolution + 1, dtype=np.float32)

    all_verts, all_faces = [], []
    v_offset = 0
    per = resolution // n_crops
    for ci in range(n_crops):
        for cj in range(n_crops):
            for ck in range(n_crops):
                xs = coords[ci * per:(ci + 1) * per + 1]
                ys = coords[cj * per:(cj + 1) * per + 1]
                zs = coords[ck * per:(ck + 1) * per + 1]
                sdf = sdf_grid_eval(sdf_fn, xs, ys, zs, chunk=chunk)
                if (sdf > level).all() or (sdf < level).all():
                    continue
                spacing = np.array(
                    [xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]], np.float32
                )
                origin = np.array([xs[0], ys[0], zs[0]], np.float32)
                verts, faces = marching_tetrahedra(sdf, origin, spacing, level)
                if verts.shape[0] == 0:
                    continue
                all_verts.append(verts)
                all_faces.append(faces + v_offset)
                v_offset += verts.shape[0]

    if not all_verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    verts = np.concatenate(all_verts, 0)
    faces = np.concatenate(all_faces, 0)
    if scale is not None:
        verts = verts / scale + np.asarray(center, np.float32)[None]
    return verts, faces
