"""Top-level MonoSDF model: ray generation -> error-bounded sampling ->
SDF+radiance evaluation -> volume rendering (+ eikonal points at train time).

Reference: code/model/network.py — MonoSDFNetwork (:472-640).

Functional API: ``render_rays(params, cfg, rays, key, training)`` over a flat
ray batch. Image-mode inputs (uv + pose + K) are converted by
``rays_from_camera`` which mirrors the reference's forward preamble
(network.py:502-526); pixel-mode datasets precompute the same ray tensors.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.density import get_beta, laplace_density
from ..ops.geometry import get_camera_params
from ..ops.render import render_ray_outputs, volume_rendering_weights
from ..ops.sampler import SamplerConfig, error_bound_z_vals
from .fields import (
    ImplicitNetConfig,
    RenderingNetConfig,
    init_implicit_net,
    init_rendering_net,
    rendering_apply,
    sdf_feat_grad,
    sdf_gradient,
    sdf_value,
)


@dataclasses.dataclass(frozen=True)
class MonoSDFConfig:
    implicit: ImplicitNetConfig = ImplicitNetConfig()
    rendering: RenderingNetConfig = RenderingNetConfig()
    sampler: SamplerConfig = SamplerConfig()
    scene_bounding_sphere: float = 1.1
    white_bkgd: bool = False
    bg_color: tuple = (1.0, 1.0, 1.0)
    beta_init: float = 0.1
    beta_min: float = 1e-4
    if_hdr: bool = False
    # dtype for sampler-sweep network compute; params stay f32
    compute_dtype: str = "float32"
    # bf16 matmuls (f32 accumulate) in the DIFFERENTIATED forward too —
    # the main TPU throughput lever; gradients flow through bf16 MXU ops
    # while weight-norm math, activations and the loss stay f32
    mixed_precision: bool = False
    # Grid mode: evaluate only the first K hash-grid levels in the
    # sampler's NO-GRAD sweeps (None = full schedule, the reference
    # behavior). Sample placement tolerates a coarse SDF — the final
    # rendered forward always uses all levels — and the sweep gathers are
    # the measured wall of the grids step (PERFORMANCE.md round 4), so
    # this trades bounded sampler fidelity for a near-linear cut in sweep
    # gather rows. Quality-gated: see QUALITY.md before changing defaults.
    sweep_max_level: int | None = None
    # 'jnp' or 'pallas': backend for the sampler's no-grad SDF sweeps.
    # 'pallas' = fused VMEM-resident MLP kernel (MLP-mode only).
    sampler_backend: str = "jnp"
    # 'jnp' or 'pallas': backend for the DIFFERENTIATED sdf+grad evaluation.
    # 'pallas' = custom_vjp with a hand-written VMEM-resident backward kernel
    # (ops/pallas_sdf_grad.py; MLP-mode only) — removes the HBM activation
    # temps XLA's reverse-over-forward autodiff saves.
    diff_backend: str = "jnp"
    # 'jnp' or 'pallas': backend for the radiance MLP (fwd + VJP with input
    # cotangents, ops/pallas_rgb_grad.py). Measured perf-NEUTRAL at the
    # 1024-ray budget (XLA already handles the small trunk well) — kept as
    # an option for larger batches; non-spec modes only. 'fused' (requires
    # diff_backend='pallas', idr non-spec) routes the SDF kernel's raw
    # (N, 128) gradient block into a radiance kernel that normalizes
    # IN-KERNEL and emits both rgb and normals — no (N, 3) gradient glue.
    rgb_backend: str = "jnp"
    # compute the sweep kernel's positional encoding in-kernel from raw xyz
    # (removes the per-sweep XLA PE fusion + lane pad + layout copy at the
    # cost of in-kernel trig) — only meaningful with sampler_backend=pallas
    sweep_pe_in_kernel: bool = False
    # append the eikonal batch to the main point batch so ONE diff-kernel
    # launch serves both (clamp_rows gates the bounding-sphere clamp off for
    # the appended rows); pallas diff path only
    fold_eikonal: bool = True


def init_monosdf(key, cfg: MonoSDFConfig) -> dict:
    k_imp, k_ren = jax.random.split(key)
    return {
        "implicit": init_implicit_net(k_imp, cfg.implicit),
        "rendering": init_rendering_net(k_ren, cfg.rendering),
        "density": {"beta": jnp.asarray(cfg.beta_init, jnp.float32)},
    }


def rays_from_camera(uv: jnp.ndarray, pose: jnp.ndarray, intrinsics: jnp.ndarray):
    """uv (B,N,2), pose (B,4,4), intrinsics (B,4,4) -> flat ray batch dict.

    depth_scale is the z component of the *camera-frame* normalized ray
    direction so that rendered distance becomes z-depth (reference
    network.py:509-522)."""
    ray_dirs, cam_loc = get_camera_params(uv, pose, intrinsics)
    eye = jnp.tile(jnp.eye(4, dtype=pose.dtype)[None], (pose.shape[0], 1, 1))
    ray_dirs_cam, _ = get_camera_params(uv, eye, intrinsics)

    B, N, _ = ray_dirs.shape
    rays_o = jnp.repeat(cam_loc[:, None, :], N, axis=1).reshape(-1, 3)
    poses = jnp.repeat(pose[:, None], N, axis=1).reshape(-1, 4, 4)
    return {
        "rays_o": rays_o,
        "rays_d": ray_dirs.reshape(-1, 3),
        "depth_scale": ray_dirs_cam.reshape(-1, 3)[:, 2:],
        "pose": poses,
    }


def render_rays(
    params: dict,
    cfg: MonoSDFConfig,
    rays: dict,
    key: jax.Array,
    training: bool,
    image_code: jnp.ndarray | None = None,
) -> dict:
    """Render a flat ray batch.

    rays: dict with rays_o (R,3), rays_d (R,3) normalized, depth_scale (R,1),
    pose (R,4,4) camera-to-world (for rotating normals into camera frame).
    image_code: optional (R, code_dim) per-ray appearance code (already
    gathered by frame index).

    Returns the reference's output dict (network.py:564-624): rgb, rgb_values,
    depth_values, z_vals, depth_vals, sdf, weights, normal_map and, when
    training, grad_theta / grad_theta_nei.
    """
    k_sampler, k_eik_uniform, k_eik_neigh = jax.random.split(key, 3)
    rays_o, rays_d = rays["rays_o"], rays["rays_d"]
    R = rays_o.shape[0]

    if cfg.implicit.use_grid and cfg.implicit.use_grid_feature:
        # derive the quad gather table ONCE per step; every encode call
        # (5 sampler sweeps + diff forward + eikonal) reuses it
        from ..ops.hashgrid import with_table_cache

        params = {
            **params,
            "implicit": {
                **params["implicit"],
                "encoding": with_table_cache(
                    params["implicit"]["encoding"], cfg.implicit.grid
                ),
            },
        }

    beta0 = jax.lax.stop_gradient(get_beta(params["density"]["beta"], cfg.beta_min))

    # The sampler's SDF sweeps only guide sample placement (no gradients
    # flow); run them in the configured compute dtype (bf16 on TPU) while
    # the differentiated forward below stays f32.
    sampler_dtype = (
        jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype != "float32" else None
    )

    if cfg.sampler_backend == "pallas" and not cfg.implicit.use_grid:
        from .fields import sdf_value_pallas

        def sampler_sdf(pts):
            return sdf_value_pallas(
                params["implicit"], cfg.implicit, pts, dtype=sampler_dtype,
                pe_in_kernel=cfg.sweep_pe_in_kernel,
            )[..., 0]
    elif cfg.sampler_backend == "pallas" and cfg.implicit.use_grid:
        from .fields import sdf_value_pallas_grid

        def sampler_sdf(pts):
            return sdf_value_pallas_grid(
                params["implicit"], cfg.implicit, pts, dtype=sampler_dtype,
                max_level=cfg.sweep_max_level,
            )[..., 0]
    else:
        def sampler_sdf(pts):
            return sdf_value(
                params["implicit"], cfg.implicit, pts, dtype=sampler_dtype,
                max_level=cfg.sweep_max_level,
            )[..., 0]

    z_vals, z_eik = error_bound_z_vals(
        sampler_sdf, rays_o, rays_d, beta0, cfg.sampler, k_sampler, training
    )
    S = z_vals.shape[1]

    points = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    points_flat = points.reshape(-1, 3)
    dirs_flat = jnp.repeat(rays_d[:, None, :], S, axis=1).reshape(-1, 3)

    main_dtype = (
        jnp.dtype(cfg.compute_dtype)
        if (cfg.mixed_precision and cfg.compute_dtype != "float32")
        else None
    )
    use_pallas_diff = cfg.diff_backend == "pallas" and not cfg.implicit.use_grid
    # fully-fused gradient path: the SDF kernel's raw (N, 128) grad block
    # flows into the radiance kernel which normalizes IN-KERNEL and routes
    # the summed normal cotangents straight back — no (N, 3) glue in XLA
    rgb_fused = (
        cfg.rgb_backend == "fused"
        and use_pallas_diff
        and not cfg.rendering.spec
        and cfg.rendering.mode == "idr"
    )
    # Eikonal points (training): uniform-in-box + near-surface + jittered
    # neighbours (reference network.py:583-600). On the pallas diff path they
    # are APPENDED to the main point batch so one kernel launch serves both —
    # the separate 4096-point backward paid ~0.6 ms/step of per-block
    # param-grad fixed cost. clamp_rows keeps their sdf/grad UNclamped
    # (reference gradient_sdf vs get_outputs).
    all_eik = None
    if training:
        bs = cfg.scene_bounding_sphere
        eik_uniform = jax.random.uniform(
            k_eik_uniform, (R, 3), minval=-bs, maxval=bs, dtype=rays_o.dtype
        )
        eik_near = rays_o + z_eik * rays_d
        eik_points = jnp.concatenate([eik_uniform, eik_near], axis=0)
        neighbours = eik_points + (
            jax.random.uniform(k_eik_neigh, eik_points.shape, dtype=rays_o.dtype) - 0.5
        ) * 0.01
        all_eik = jnp.concatenate([eik_points, neighbours], axis=0)

    n_main = points_flat.shape[0]
    # grid-mode pallas diff path: hash encode + basis JVPs stay XLA-side,
    # the 2x256 trunk's stacked fwd+bwd runs as one kernel pair
    # (ops/pallas_sdf_grad_grid.py); eikonal batch folds like the jnp path
    use_pallas_diff_grid = (
        cfg.diff_backend == "pallas" and cfg.implicit.use_grid
    )
    fold_eik = training and use_pallas_diff and cfg.fold_eikonal
    # Grid mode applies no bounding-sphere clamp (reference
    # ImplicitNetworkGrid), so the eikonal batch can fold into the main
    # differentiated evaluation on the jnp path too: ONE hash-grid gather
    # and ONE backward scatter-add instead of two of each (the separate
    # 4096-point eikonal gather alone measured ~21 ms/step on a v5e).
    fold_eik_jnp = (
        training and not use_pallas_diff and cfg.fold_eikonal
        and cfg.implicit.use_grid
    )
    if use_pallas_diff_grid:
        from .fields import sdf_feat_grad_pallas_grid

        pts_in = (
            jnp.concatenate([points_flat, all_eik], axis=0)
            if fold_eik_jnp else points_flat
        )
        sdf, feature_vectors, gradients = sdf_feat_grad_pallas_grid(
            params["implicit"], cfg.implicit, pts_in, dtype=main_dtype
        )
        if fold_eik_jnp:
            grad_theta_all = gradients[n_main:]
            sdf = sdf[:n_main]
            feature_vectors = feature_vectors[:n_main]
            gradients = gradients[:n_main]
    elif use_pallas_diff:
        from .fields import sdf_feat_grad_pallas

        pts_in = (
            jnp.concatenate([points_flat, all_eik], axis=0)
            if fold_eik else points_flat
        )
        sdf, feature_vectors, gradients = sdf_feat_grad_pallas(
            params["implicit"], cfg.implicit, pts_in, dtype=main_dtype,
            wide_grad=rgb_fused, clamp_rows=n_main if fold_eik else -1,
        )
        if fold_eik:
            grad_theta_all = gradients[n_main:, :3]
            sdf = sdf[:n_main]
            feature_vectors = feature_vectors[:n_main]
            gradients = gradients[:n_main]
    else:
        pts_in = (
            jnp.concatenate([points_flat, all_eik], axis=0)
            if fold_eik_jnp else points_flat
        )
        sdf, feature_vectors, gradients = sdf_feat_grad(
            params["implicit"], cfg.implicit, pts_in, dtype=main_dtype
        )
        if fold_eik_jnp:
            grad_theta_all = gradients[n_main:]
            sdf = sdf[:n_main]
            feature_vectors = feature_vectors[:n_main]
            gradients = gradients[:n_main]

    code_flat = None
    if image_code is not None:
        code_flat = jnp.repeat(image_code[:, None, :], S, axis=1).reshape(
            -1, image_code.shape[-1]
        )

    # the radiance kernel is independent of the implicit net's mode (it
    # also applies in grid mode), unlike the SDF kernel above
    if rgb_fused:
        from .fields import positional_encoding, rendering_apply_pallas_wide

        # view dirs are constant along a ray: encode (R, 3) once and repeat
        # over samples — identical values, 1/S of the trig and none of the
        # flat-dirs layout copies
        dirs_in = dirs_flat
        if cfg.rendering.multires_view > 0:
            dirs_in = jnp.repeat(
                positional_encoding(rays_d, cfg.rendering.multires_view)[:, None, :],
                S, axis=1,
            ).reshape(R * S, -1)
        render_out = rendering_apply_pallas_wide(
            params["rendering"], cfg.rendering,
            points_flat, gradients, dirs_in, feature_vectors, code_flat,
            dtype=main_dtype,
        )
        normals = render_out["normals128"][:, :3].reshape(R, S, 3)
    elif (
        cfg.rgb_backend == "pallas"
        and not cfg.rendering.spec
        and cfg.rendering.mode == "idr"
    ):
        from .fields import rendering_apply_pallas

        render_out = rendering_apply_pallas(
            params["rendering"], cfg.rendering,
            points_flat, gradients, dirs_flat, feature_vectors, code_flat,
            dtype=main_dtype,
        )
    else:
        render_out = rendering_apply(
            params["rendering"], cfg.rendering,
            points_flat, gradients, dirs_flat, feature_vectors, code_flat,
            dtype=main_dtype,
        )
    rgb = render_out["rgb"].reshape(R, S, 3)

    beta = get_beta(params["density"]["beta"], cfg.beta_min)
    density = laplace_density(sdf[..., 0].reshape(R, S), beta)
    weights = volume_rendering_weights(z_vals, density)

    if not rgb_fused:
        # guarded norm: jnp.linalg.norm has a NaN grad at exactly-zero input
        grad_sq = jnp.sum(gradients * gradients, axis=-1, keepdims=True)
        normals = gradients / (jnp.sqrt(jnp.maximum(grad_sq, 1e-24)) + 1e-6)
        normals = normals.reshape(R, S, 3)

    rgb_values, depth_values, normal_map = render_ray_outputs(
        weights, z_vals, rgb, normals, rays["depth_scale"]
    )

    if cfg.white_bkgd:
        acc_map = jnp.sum(weights, axis=-1)
        bg = jnp.asarray(cfg.bg_color, dtype=rgb_values.dtype)
        rgb_values = rgb_values + (1.0 - acc_map[..., None]) * bg[None]

    # Rotate world normals into the camera frame (reference network.py:607-620).
    rot = jnp.swapaxes(rays["pose"][:, :3, :3], 1, 2)
    normal_map = jnp.einsum("rij,rj->ri", rot, normal_map)

    output = {
        "rgb": rgb,
        "rgb_values": rgb_values,
        "depth_values": depth_values,
        "z_vals": z_vals,
        "depth_vals": z_vals * rays["depth_scale"],
        "sdf": sdf.reshape(R, S),
        "weights": weights,
        "normal_map": normal_map,
    }

    if cfg.rendering.spec:
        rgb_spec = render_out["rgb_spec"].reshape(R, S, 3)
        output["rgb_spec"] = rgb_spec
        output["rgb_spec_values"] = jnp.sum(weights[..., None] * rgb_spec, axis=1)

    if training:
        if fold_eik or fold_eik_jnp:
            grad_theta = grad_theta_all
        elif use_pallas_diff:
            from .fields import sdf_gradient_pallas

            grad_theta = sdf_gradient_pallas(
                params["implicit"], cfg.implicit, all_eik, dtype=main_dtype
            )
        else:
            grad_theta = sdf_gradient(
                params["implicit"], cfg.implicit, all_eik, dtype=main_dtype
            )
        half = all_eik.shape[0] // 2
        output["grad_theta"] = grad_theta[:half]
        output["grad_theta_nei"] = grad_theta[half:]

    return output
