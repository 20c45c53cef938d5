"""Sliding-window SDF grid evaluation + mesh extraction.

Reference: code/utils/plots.py get_surface_sliding (:108-226): the domain
[grid_boundary]^3 is split into crops; each crop's SDF is evaluated with a
coarse-to-fine point PYRAMID — a coarse dense pass, then only points whose
parent cell is within |sdf| < threshold of the surface are refined at each
finer level (plots.py:152-196) — so ~95% of a 512^3 grid is never touched
by the network. Device evaluation runs in jit'd fixed-size chunks; marching
tetrahedra runs on host per crop and meshes are concatenated. Vertices can
be mapped to world coordinates via verts/scale + center (plots.py:207-210).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _eval_points(jitted, pts: np.ndarray, chunk: int) -> np.ndarray:
    """Fixed-shape chunked evaluation of (N, 3) points -> (N,)."""
    n = pts.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        pts = np.concatenate([pts, np.zeros((n_pad, 3), np.float32)], 0)
    out = np.empty(pts.shape[0], np.float32)
    for i in range(0, pts.shape[0], chunk):
        out[i:i + chunk] = np.asarray(jitted(jnp.asarray(pts[i:i + chunk])))
    return out[:n]


def sdf_grid_eval(sdf_fn, xs, ys, zs, chunk: int = 131072) -> np.ndarray:
    """Dense evaluation of sdf_fn on the grid xs × ys × zs.

    sdf_fn: (N,3) jnp -> (N,) jnp.
    Returns (len(xs), len(ys), len(zs)) numpy array.
    """
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)
    out = _eval_points(jax.jit(sdf_fn), pts, chunk)
    return out.reshape(len(xs), len(ys), len(zs))


def sdf_grid_eval_pyramid(
    sdf_fn,
    xs,
    ys,
    zs,
    chunk: int = 131072,
    levels: int = 3,
    threshold_scale: float = 2.0,
    jitted=None,
) -> np.ndarray:
    """Coarse-to-fine masked evaluation (the reference's 4-level point
    pyramid, plots.py:152-196).

    The coarse grid (stride 2^levels) is evaluated densely; at each finer
    level only points whose nearest already-evaluated neighbour is within
    ``threshold_scale * cell_diagonal`` of the surface go through the
    network — everything else inherits the neighbour's value (sign-correct
    far from the surface, which is all marching cubes needs).
    """
    nx, ny, nz = len(xs), len(ys), len(zs)
    jitted = jitted or jax.jit(sdf_fn)
    stride0 = 2 ** levels
    # require grids that subdivide cleanly; else fall back to dense
    if (nx - 1) % stride0 or (ny - 1) % stride0 or (nz - 1) % stride0:
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)
        return _eval_points(jitted, pts, chunk).reshape(nx, ny, nz)

    spacing = float(xs[1] - xs[0]) if nx > 1 else 1.0
    sdf = np.full((nx, ny, nz), np.nan, np.float32)

    def eval_mask(mask):
        ii, jj, kk = np.nonzero(mask)
        if len(ii) == 0:
            return
        pts = np.stack(
            [np.asarray(xs)[ii], np.asarray(ys)[jj], np.asarray(zs)[kk]], axis=-1
        ).astype(np.float32)
        sdf[ii, jj, kk] = _eval_points(jitted, pts, chunk)

    # level 0: dense at the coarsest stride
    coarse = np.zeros((nx, ny, nz), bool)
    coarse[::stride0, ::stride0, ::stride0] = True
    eval_mask(coarse)

    known = coarse.copy()
    for lvl in range(levels):
        stride = stride0 // (2 ** lvl)
        fine = stride // 2
        cell_diag = np.sqrt(3.0) * stride * spacing
        thresh = threshold_scale * cell_diag

        # fill every not-yet-known point with its block's coarse value
        rep = sdf[::stride, ::stride, ::stride]
        filled = rep.repeat(stride, 0).repeat(stride, 1).repeat(stride, 2)[
            :nx, :ny, :nz
        ]
        near = np.abs(filled) < thresh

        new_mask = np.zeros((nx, ny, nz), bool)
        new_mask[::fine, ::fine, ::fine] = True
        new_mask &= ~known & near
        eval_mask(new_mask)
        known |= new_mask
        # points skipped at this level inherit the coarse fill
        skipped = np.zeros((nx, ny, nz), bool)
        skipped[::fine, ::fine, ::fine] = True
        skipped &= ~known
        sdf[skipped] = filled[skipped]
        known |= skipped
    return sdf


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
    from ..native import marching_tetrahedra_native, native_available

    use_native = native_available()
    lo, hi = float(grid_boundary[0]), float(grid_boundary[1])
    n_crops = max(1, -(-resolution // crop_n))
    # global grid coordinates (resolution+1 points so crops share planes)
    coords = np.linspace(lo, hi, resolution + 1, dtype=np.float32)

    all_verts, all_faces = [], []
    v_offset = 0
    per = resolution // n_crops
    jitted = jax.jit(sdf_fn)
    for ci in range(n_crops):
        for cj in range(n_crops):
            for ck in range(n_crops):
                xs = coords[ci * per:(ci + 1) * per + 1]
                ys = coords[cj * per:(cj + 1) * per + 1]
                zs = coords[ck * per:(ck + 1) * per + 1]
                if per >= 64:
                    sdf = sdf_grid_eval_pyramid(
                        sdf_fn, xs, ys, zs, chunk=chunk, jitted=jitted
                    )
                else:
                    sdf = sdf_grid_eval(sdf_fn, xs, ys, zs, chunk=chunk)
                if (sdf > level).all() or (sdf < level).all():
                    continue
                spacing = np.array(
                    [xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]], np.float32
                )
                origin = np.array([xs[0], ys[0], zs[0]], np.float32)
                # Native path streams cubes and welds vertices on the fly
                # (O(surface) memory); NumPy fallback emits per-triangle verts.
                if use_native:
                    verts, faces = marching_tetrahedra_native(
                        sdf, origin, spacing, level
                    )
                else:
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
