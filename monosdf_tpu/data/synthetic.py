"""Synthetic analytic-SDF scene for tests and smoke training.

The reference has no test suite; SURVEY.md §4 prescribes an end-to-end smoke
train on an analytic sphere with monocular-style cues. This module builds
exactly that: cameras on a ring looking at a unit-ish sphere, with
ground-truth rgb (lambertian), z-depth, camera-frame normals, and masks — the
same per-ray tensors the real pixel-mode dataset produces.
"""

from __future__ import annotations

import numpy as np


def _look_at(eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    eye = np.asarray(eye, np.float64)
    f = np.asarray(target, np.float64) - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float64))
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    pose = np.eye(4, dtype=np.float32)
    # camera-to-world with +z forward (OpenCV convention, like the reference)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = r, -u, f, eye
    return pose


def make_synthetic_sphere_scene(
    n_images: int = 8,
    img_res: int = 32,
    radius: float = 0.5,
    cam_dist: float = 1.5,
    light_dir=(0.3, 0.5, -0.8),
    seed: int = 0,
):
    """Returns a dict of flat per-ray arrays over all images:

    rays_o, rays_d (world), depth_scale, pose (per-ray c2w), rgb, depth
    (monocular-style: z-depth, normalized to ~[0,1] scale), normal
    (camera-frame), mask, indices (frame idx per ray).
    """
    H = W = img_res
    f = 0.5 * W / np.tan(0.3)  # ~35deg half-fov
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)

    light = np.asarray(light_dir, np.float64)
    light /= np.linalg.norm(light)

    all_rays_o, all_rays_d, all_scale, all_pose = [], [], [], []
    all_rgb, all_depth, all_normal, all_mask, all_idx = [], [], [], [], []

    for i in range(n_images):
        ang = 2 * np.pi * i / n_images
        eye = np.array([cam_dist * np.sin(ang), 0.3, -cam_dist * np.cos(ang)])
        pose = _look_at(eye)

        u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
        dirs_cam = np.stack(
            [(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1], np.ones_like(u)], -1
        )
        depth_scale = (
            dirs_cam[..., 2:] / np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
        )
        dirs_world = dirs_cam @ pose[:3, :3].T
        dirs_world /= np.linalg.norm(dirs_world, axis=-1, keepdims=True)
        o = np.broadcast_to(pose[:3, 3], dirs_world.shape)

        # analytic ray-sphere intersection
        b = np.einsum("hwc,hwc->hw", dirs_world, o)
        c = np.sum(o**2, -1) - radius**2
        disc = b**2 - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        hit &= t > 0
        t = np.where(hit, t, 0.0)

        pts = o + t[..., None] * dirs_world
        normal_world = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
        lambert = np.clip(np.einsum("hwc,c->hw", normal_world, -light), 0.05, 1.0)
        rgb = np.stack([lambert * 0.9, lambert * 0.6, lambert * 0.4], -1)
        rgb = np.where(hit[..., None], rgb, 1.0)  # white background

        z_depth = t * depth_scale[..., 0]
        # monocular cue convention: depth in ~[0,1]; mimic Omnidata scaling
        depth_cue = np.where(hit, z_depth / (2 * cam_dist), 0.5)
        normal_cam = np.einsum("ij,hwj->hwi", pose[:3, :3].T, normal_world)
        normal_cam = np.where(hit[..., None], normal_cam, np.array([0.0, 0.0, -1.0]))

        n_pix = H * W
        all_rays_o.append(o.reshape(-1, 3))
        all_rays_d.append(dirs_world.reshape(-1, 3))
        all_scale.append(depth_scale.reshape(-1, 1))
        all_pose.append(np.broadcast_to(pose, (n_pix, 4, 4)))
        all_rgb.append(rgb.reshape(-1, 3))
        all_depth.append(depth_cue.reshape(-1, 1))
        all_normal.append(normal_cam.reshape(-1, 3))
        all_mask.append(np.ones((n_pix, 1), np.float32))
        all_idx.append(np.full((n_pix,), i, np.int32))

    cat = lambda xs: np.concatenate(xs, 0).astype(np.float32)
    return {
        "rays_o": cat(all_rays_o),
        "rays_d": cat(all_rays_d),
        "depth_scale": cat(all_scale),
        "pose": cat(all_pose),
        "rgb": cat(all_rgb),
        "depth": cat(all_depth),
        "normal": cat(all_normal),
        "mask": cat(all_mask),
        "indices": np.concatenate(all_idx, 0),
        "n_images": n_images,
        "img_res": (H, W),
    }


def sample_ray_batch(scene: dict, rng: np.random.Generator, num_rays: int):
    """Random global pixel batch (the fork's pixel-mode sampling,
    scene_dataset.py:468-478)."""
    n = scene["rays_o"].shape[0]
    idx = rng.integers(0, n, size=(num_rays,))
    rays = {k: scene[k][idx] for k in ("rays_o", "rays_d", "depth_scale", "pose")}
    gt = {k: scene[k][idx] for k in ("rgb", "depth", "normal", "mask")}
    return {"rays": rays, "gt": gt, "indices": scene["indices"][idx]}
