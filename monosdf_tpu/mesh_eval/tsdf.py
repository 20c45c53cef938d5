"""TSDF fusion and the "refuse" mesh-refinement pipeline.

Reference behavior (scannet_eval/evaluate.py:76-137, postprocess/refuse.py):
render the predicted mesh's depth from every evaluation pose, integrate the
depth maps into a truncated signed distance volume, and re-extract the mesh
— this carves the mesh down to what the evaluation cameras actually observe.

TPU-native: the volume update is one fused jnp expression over the full
(X, Y, Z) voxel grid per view (project -> nearest-depth lookup -> truncated
SDF -> running weighted mean); no ScalableTSDF hashing is needed because
evaluation scenes are bounded and a dense grid at 1cm fits comfortably.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial

from .rasterize import rasterize_depth


@partial(jax.jit, static_argnames=("H", "W"))
def _integrate_view(tsdf, weight, coords, depth, intr, w2c, trunc, H: int, W: int):
    """One fusion step. coords (N,3) world voxel centers; depth (H,W)."""
    vh = jnp.concatenate([coords, jnp.ones_like(coords[:, :1])], axis=-1)
    cam = (w2c @ vh.T)[:3].T
    z = cam[:, 2]
    p = (intr[:3, :3] @ cam.T).T
    zc = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
    u = p[:, 0] / zc
    v = p[:, 1] / zc
    iu = jnp.round(u - 0.5).astype(jnp.int32)
    iv = jnp.round(v - 0.5).astype(jnp.int32)
    inb = (z > 1e-6) & (iu >= 0) & (iu < W) & (iv >= 0) & (iv < H)
    d = depth[jnp.clip(iv, 0, H - 1), jnp.clip(iu, 0, W - 1)]
    has_depth = d > 0
    sdf = d - z
    valid = inb & has_depth & (sdf > -trunc)
    tsdf_obs = jnp.clip(sdf / trunc, -1.0, 1.0)
    w_new = weight + valid.astype(tsdf.dtype)
    tsdf_new = jnp.where(
        valid,
        (tsdf * weight + tsdf_obs) / jnp.maximum(w_new, 1.0),
        tsdf,
    )
    return tsdf_new, w_new


class TSDFVolume:
    """Dense TSDF over an axis-aligned bbox."""

    def __init__(self, bbox_min, bbox_max, voxel: float, trunc: float | None = None):
        self.origin = np.asarray(bbox_min, np.float32)
        self.voxel = float(voxel)
        self.trunc = float(trunc if trunc is not None else 3.0 * voxel)
        extent = np.asarray(bbox_max, np.float64) - self.origin
        self.dims = np.maximum(np.ceil(extent / voxel).astype(int) + 1, 2)
        xs, ys, zs = [
            self.origin[i] + np.arange(self.dims[i]) * voxel for i in range(3)
        ]
        g = np.meshgrid(xs, ys, zs, indexing="ij")
        self._coords = jnp.asarray(
            np.stack([a.reshape(-1) for a in g], axis=-1), jnp.float32
        )
        n = int(np.prod(self.dims))
        self.tsdf = jnp.full((n,), 1.0, jnp.float32)
        self.weight = jnp.zeros((n,), jnp.float32)

    def integrate(self, depth: np.ndarray, intr: np.ndarray, pose: np.ndarray):
        H, W = depth.shape
        w2c = np.linalg.inv(np.asarray(pose, np.float64)).astype(np.float32)
        self.tsdf, self.weight = _integrate_view(
            self.tsdf, self.weight, self._coords, jnp.asarray(depth, jnp.float32),
            jnp.asarray(np.asarray(intr, np.float32)), jnp.asarray(w2c),
            jnp.float32(self.trunc), H, W,
        )

    def extract(self):
        from ..meshing.marching import marching_tetrahedra, weld_vertices

        tsdf = np.asarray(self.tsdf).reshape(tuple(self.dims))
        w = np.asarray(self.weight).reshape(tuple(self.dims))
        # Unobserved voxels must produce NO surface (o3d meshes only cells
        # with weight > 0): mark them NaN so crossings into unobserved space
        # interpolate to NaN vertices, then drop that geometry.
        tsdf = np.where(w > 0, tsdf, np.nan)
        verts, faces = marching_tetrahedra(
            tsdf, origin=self.origin, spacing=(self.voxel,) * 3, level=0.0
        )
        if len(verts):
            finite = np.isfinite(verts).all(axis=-1)
            from .cull import apply_vertex_mask

            verts, faces = apply_vertex_mask(verts, faces, finite)
        return weld_vertices(verts, faces)


def refuse_mesh(
    verts,
    faces,
    intrinsics,
    poses,
    H: int,
    W: int,
    voxel: float = 0.01,
    trunc: float | None = None,
    bbox_pad: float = 0.05,
):
    """Full refuse pipeline: rasterize depth from every pose, fuse, extract."""
    verts = np.asarray(verts)
    vol = TSDFVolume(
        verts.min(axis=0) - bbox_pad, verts.max(axis=0) + bbox_pad, voxel, trunc
    )
    for intr, pose in zip(intrinsics, poses):
        depth = rasterize_depth(verts, faces, intr, pose, H, W)
        vol.integrate(depth, intr, pose)
    return vol.extract()
