"""Camera math and ray geometry.

Reference: code/utils/rend_util.py (load_K_Rt_from_P:38-60, get_camera_params:63-91,
lift:105-118, quat<->rot:121-159, get_sphere_intersections:162-178) and the
cube intersection in code/model/ray_sampler.py:48-60.

Host-side loading helpers (load_K_Rt_from_P) run in numpy/cv2; everything that
participates in training steps is pure jnp and jit-safe.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host-side (numpy) camera decomposition — data loading only.
# ---------------------------------------------------------------------------

def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection matrix into intrinsics (4x4) and
    camera-to-world pose (4x4). Matches cv2.decomposeProjectionMatrix use in
    the reference (rend_util.py:38-60) but implemented with an RQ
    decomposition so the data path has no cv2 dependency.
    """
    P = np.asarray(P, dtype=np.float64)[:3, :4]
    M = P[:, :3]
    # RQ decomposition of M: M = K @ R with K upper-triangular.
    # Build from QR of the flipped transpose.
    flip = np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], dtype=np.float64)
    Q, R_ = np.linalg.qr((flip @ M).T)
    K = flip @ R_.T @ flip
    R = flip @ Q.T
    # Fix signs so K has positive diagonal.
    signs = np.sign(np.diag(K))
    signs[signs == 0] = 1.0
    S = np.diag(signs)
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        R = -R
        K = -K  # keep K @ R = M; renormalize below
    # Camera center: the null space of P (cv2 returns homogeneous center).
    # Solve P @ [c;1] = 0 -> c = -M^-1 p4.
    c = -np.linalg.solve(M, P[:, 3])

    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K.astype(np.float32)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T.astype(np.float32)  # world-from-camera rotation
    pose[:3, 3] = c.astype(np.float32)
    return intrinsics, pose


# ---------------------------------------------------------------------------
# jnp ray math (jit-safe)
# ---------------------------------------------------------------------------

def lift(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray, intrinsics: jnp.ndarray):
    """Pixel coords -> homogeneous camera-space points at depth z, with skew
    support (reference rend_util.py:105-118).

    x, y, z: (B, N); intrinsics: (B, 4, 4). Returns (B, N, 4).
    """
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, y_lift, z, jnp.ones_like(z)], axis=-1)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (B,4) [w,x,y,z] -> rotation matrices (B,3,3)
    (reference rend_util.py:121-140)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(-1, 3, 3)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (B,3,3) -> quaternions (B,4) [w,x,y,z]
    (reference rend_util.py:143-159). Assumes trace > -1 like the reference."""
    w = jnp.sqrt(jnp.maximum(1.0 + R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2], 1e-12)) / 2.0
    x = (R[:, 2, 1] - R[:, 1, 2]) / (4.0 * w)
    y = (R[:, 0, 2] - R[:, 2, 0]) / (4.0 * w)
    z = (R[:, 1, 0] - R[:, 0, 1]) / (4.0 * w)
    return jnp.stack([w, x, y, z], axis=-1)


def quat_to_rot_np(q: np.ndarray) -> np.ndarray:
    """Single unit quaternion [w,x,y,z] -> (3,3), host numpy."""
    return np.asarray(quat_to_rot(jnp.asarray(q)[None]))[0]


def rot_to_quat_np(R: np.ndarray) -> np.ndarray:
    """Single (3,3) rotation -> quaternion [w,x,y,z], host numpy."""
    return np.asarray(rot_to_quat(jnp.asarray(R)[None]))[0]


def get_camera_params(uv: jnp.ndarray, pose: jnp.ndarray, intrinsics: jnp.ndarray):
    """uv (B,N,2) + pose (B,4,4) [or quaternion (B,7)] + intrinsics (B,4,4)
    -> normalized world ray directions (B,N,3) and camera locations (B,3)
    (reference rend_util.py:63-91)."""
    if pose.shape[1] == 7:
        cam_loc = pose[:, 4:]
        R = quat_to_rot(pose[:, :4])
        p = jnp.tile(jnp.eye(4, dtype=pose.dtype)[None], (pose.shape[0], 1, 1))
        p = p.at[:, :3, :3].set(R).at[:, :3, 3].set(cam_loc)
    else:
        cam_loc = pose[:, :3, 3]
        p = pose

    batch_size, num_samples, _ = uv.shape
    depth = jnp.ones((batch_size, num_samples), dtype=uv.dtype)
    x_cam = uv[:, :, 0]
    y_cam = uv[:, :, 1]

    pixel_points_cam = lift(x_cam, y_cam, depth, intrinsics)  # (B,N,4)
    world_coords = jnp.einsum("bij,bnj->bni", p, pixel_points_cam)[:, :, :3]
    ray_dirs = world_coords - cam_loc[:, None, :]
    ray_dirs = ray_dirs / (jnp.linalg.norm(ray_dirs, axis=2, keepdims=True) + 1e-12)
    return ray_dirs, cam_loc


def get_sphere_intersections(cam_loc: jnp.ndarray, ray_dirs: jnp.ndarray, r: float = 1.0):
    """Near/far ray-sphere intersections (R,2). Assumes all rays intersect
    (the reference hard-fails otherwise, rend_util.py:162-178); here the
    discriminant is clamped at 0."""
    ray_cam_dot = jnp.einsum("rd,rd->r", ray_dirs, cam_loc)
    under_sqrt = ray_cam_dot**2 - (jnp.sum(cam_loc**2, axis=-1) - r**2)
    sqrt_term = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    ints = jnp.stack([-sqrt_term, sqrt_term], axis=-1) - ray_cam_dot[:, None]
    return jnp.maximum(ints, 0.0)


def near_far_from_cube(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, bound: float,
    min_near: float = 0.0, max_far: float = 1e9,
):
    """Slab-test ray/axis-aligned-cube intersection (reference
    ray_sampler.py:48-60). Non-intersecting rays get near=far=1e9."""
    tmin = (-bound - rays_o) / (rays_d + 1e-15)
    tmax = (bound - rays_o) / (rays_d + 1e-15)
    near = jnp.max(jnp.minimum(tmin, tmax), axis=-1, keepdims=True)
    far = jnp.min(jnp.maximum(tmin, tmax), axis=-1, keepdims=True)
    miss = far < near
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)
    near = jnp.maximum(near, min_near)
    far = jnp.minimum(far, max_far)
    return near, far
