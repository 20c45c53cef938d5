"""SDF and radiance field networks (functional).

Reference: code/model/network.py — ImplicitNetwork (:12-137),
ImplicitNetworkGrid (:141-322), RenderingNetwork (:325-470).

One ImplicitNetConfig covers both the pure-MLP and hash-grid variants
(`use_grid`); the reference's `use_grid_feature=False` zero-feature mode is
also supported. Gradients of the SDF w.r.t. positions come from `jax.grad`
(sum-trick over independent points) and remain differentiable, replacing the
reference's `torch.autograd.grad(create_graph=True)` (network.py:111-129) and
the hand-written CUDA double-backward.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..nn import apply_linear, geometric_linear_init, init_linear, softplus_beta
from ..ops.embedder import pe_dim, positional_encoding
from ..ops.hashgrid import HashGridConfig, hash_encode, init_hashgrid


# ---------------------------------------------------------------------------
# Implicit (SDF) network
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ImplicitNetConfig:
    feature_vector_size: int = 256
    sdf_bounding_sphere: float = 1.1  # 0.0 disables the sphere clamp
    d_in: int = 3
    d_out: int = 1
    dims: tuple = (256, 256)
    geometric_init: bool = True
    bias: float = 0.9
    skip_in: tuple = ()
    weight_norm: bool = True
    multires: int = 6
    sphere_scale: float = 1.0
    inside_outside: bool = True
    # hash-grid variant (reference ImplicitNetworkGrid)
    use_grid: bool = False
    use_grid_feature: bool = True
    divide_factor: float = 1.5
    grid: HashGridConfig = HashGridConfig()

    @property
    def grid_feature_dim(self) -> int:
        return self.grid.output_dim if self.use_grid else 0

    @property
    def input_dim(self) -> int:
        """Width of the MLP input: PE(x) [+ grid features]."""
        return pe_dim(self.multires, self.d_in) + self.grid_feature_dim

    @property
    def layer_dims(self) -> tuple:
        return (self.input_dim, *self.dims, self.d_out + self.feature_vector_size)

    @property
    def num_layers(self) -> int:
        return len(self.layer_dims)


def init_implicit_net(key, cfg: ImplicitNetConfig) -> dict:
    dims = cfg.layer_dims
    params: dict = {}
    keys = jax.random.split(key, cfg.num_layers)
    for l in range(cfg.num_layers - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        if cfg.geometric_init:
            params[f"lin{l}"] = geometric_linear_init(
                keys[l], dims[l], out_dim, l, cfg.num_layers, dims[0],
                cfg.multires, tuple(cfg.skip_in), cfg.bias, cfg.inside_outside,
                cfg.weight_norm,
            )
        else:
            params[f"lin{l}"] = init_linear(keys[l], dims[l], out_dim, cfg.weight_norm)
    if cfg.use_grid:
        params["encoding"] = init_hashgrid(keys[-1], cfg.grid)
    return params


def implicit_apply(
    params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray, dtype=None,
    max_level: int | None = None,
) -> jnp.ndarray:
    """x (..., 3) -> raw net output (..., 1 + feature_vector_size).

    Reference forward: network.py:79-96 (MLP) / :247-275 (grid).
    ``dtype`` enables mixed-precision matmuls (bf16 in, f32 accumulate).
    ``max_level`` (grid mode): evaluate only the first K hash-grid levels
    and zero the rest — Instant-NGP/Neuralangelo-style level masking. Used
    for the sampler's NO-GRAD sweeps (MonoSDFConfig.sweep_max_level) where
    sample placement tolerates a coarse SDF; the differentiated forward
    always runs the full schedule."""
    inp = _net_input(params, cfg, x, max_level)
    h = inp
    for l in range(cfg.num_layers - 1):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inp.astype(h.dtype)], axis=-1) / math.sqrt(2.0)
        last = l == cfg.num_layers - 2
        h = apply_linear(params[f"lin{l}"], h, dtype=dtype, keep_dtype=not last)
        if not last:
            h = softplus_beta(h, 100.0)
    return h.astype(jnp.float32) if dtype is not None else h


def _clamp_sdf(cfg: ImplicitNetConfig, sdf: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bounding-sphere SDF clamp so all rays eventually occlude
    (reference network.py:115-118). The grid variant does NOT clamp
    (reference ImplicitNetworkGrid.get_sdf_vals:307-309)."""
    if cfg.use_grid or cfg.sdf_bounding_sphere <= 0.0:
        return sdf
    sphere_sdf = cfg.sphere_scale * (
        cfg.sdf_bounding_sphere - jnp.linalg.norm(x, axis=-1, keepdims=True)
    )
    return jnp.minimum(sdf, sphere_sdf)


def _net_input(
    params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray,
    max_level: int | None = None,
) -> jnp.ndarray:
    """The trunk's layer-0 input: PE(x) for MLP mode, [PE(x) | grid
    features] for grid mode. ``max_level`` truncates the grid schedule for
    the sampler's no-grad sweeps (levels beyond it are zero-padded so the
    trunk weights see their full input width); when the truncation matches
    HashGridConfig.sweep_oct_levels the features come from the per-step
    oct sweep cache (one 8C gather row per level-point)."""
    if not cfg.use_grid:
        return positional_encoding(x, cfg.multires)
    if cfg.use_grid_feature:
        gcfg = cfg.grid
        if max_level is not None and max_level < gcfg.num_levels:
            import dataclasses as _dc

            if (
                gcfg.layout == "quad"
                and gcfg.scatter_impl == "fold"
                and gcfg.sweep_oct_levels == max_level
            ):
                # serve the coarse sweeps from the per-step OCT cache:
                # one 8C row per level-point instead of quad's two
                # (HashGridConfig.sweep_oct_levels; values identical)
                from ..ops.hashgrid import sweep_cfg

                gcfg = sweep_cfg(gcfg)
            else:
                gcfg = _dc.replace(
                    gcfg, num_levels=max_level,
                    # preserve the per-level geometry of the full schedule
                    per_level_scale=cfg.grid.scale,
                    desired_resolution=None,
                )
        feature = hash_encode(params["encoding"], gcfg, x / cfg.divide_factor)
        if gcfg.output_dim < cfg.grid.output_dim:
            feature = jnp.concatenate(
                [
                    feature,
                    jnp.zeros(
                        (*feature.shape[:-1],
                         cfg.grid.output_dim - gcfg.output_dim),
                        feature.dtype,
                    ),
                ],
                axis=-1,
            )
    else:
        feature = jnp.zeros((*x.shape[:-1], cfg.grid_feature_dim), dtype=x.dtype)
    return jnp.concatenate(
        [positional_encoding(x, cfg.multires), feature], axis=-1
    )


def sdf_value(
    params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray, dtype=None,
    max_level: int | None = None,
) -> jnp.ndarray:
    """x (..., 3) -> sdf (..., 1)."""
    out = implicit_apply(params, cfg, x, dtype=dtype, max_level=max_level)
    return _clamp_sdf(cfg, out[..., :1], x)


def sdf_value_pallas(
    params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray, dtype=None,
    pe_in_kernel: bool = False,
) -> jnp.ndarray:
    """Fused-Pallas SDF evaluation (sampler's no-grad sweeps): the whole MLP
    in one VMEM-resident kernel, sphere clamp after. MLP-mode only (the
    hash-grid gather stays an XLA op).

    pe_in_kernel: compute the positional encoding inside the kernel from raw
    xyz (kernel_pe) instead of on the XLA side. Kernel-side trig costs ~+14%
    kernel time at the sweep's single-row-block budget, but removes the
    XLA-side PE fusion + 39->128-lane pad + layout copy per sweep — measure
    per config (bench_step --sweep_pe)."""
    from ..ops.pallas_mlp import effective_linear_weights, fused_sdf_mlp_nograd

    assert not cfg.use_grid, "pallas fused MLP is for MLP-mode sweeps"
    ws, bs = effective_linear_weights(params, cfg.num_layers)
    # the sweeps read ONLY the SDF scalar: truncate the last layer to its
    # first column so the kernel skips the 256 feature outputs (-2/3 of the
    # final matmul after 128-lane padding)
    ws[-1] = ws[-1][:, :1]
    bs[-1] = bs[-1][:1]
    if pe_in_kernel:
        flat = x.reshape(-1, 3)
        out = fused_sdf_mlp_nograd(
            ws, bs, flat, cfg.skip_in, dtype=dtype, multires=cfg.multires
        )
    else:
        # PE at its true 39-lane width + an XLA pad. Both lane-padded
        # variants REGRESS despite killing the per-sweep pad+copy:
        # sin+cos over 128 lanes +1.5 ms/step; single-sin phase-folded
        # (positional_encoding_lanepad_sin) also +1.5 ms — the 128-lane
        # trig plus the HIGHEST-precision lane-replication matmul cost
        # more than the ~0.15 ms/sweep pad they remove.
        inp = positional_encoding(x, cfg.multires)
        flat = inp.reshape(-1, inp.shape[-1])
        out = fused_sdf_mlp_nograd(ws, bs, flat, cfg.skip_in, dtype=dtype)
    sdf = out[:, :1].reshape(*x.shape[:-1], 1)
    return _clamp_sdf(cfg, sdf, x)


def sdf_value_pallas_grid(
    params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray, dtype=None,
    max_level: int | None = None,
) -> jnp.ndarray:
    """Grid-mode fused-Pallas SDF sweeps: the hash-grid gather/interp stays
    an XLA op (the fastest gather primitive on this hardware — probe waves
    7/8 closed every in-kernel alternative), its [PE | features] output
    feeds the 2x256 trunk as ONE VMEM-resident kernel with the last layer
    truncated to the sdf column (reference grid trunk: network.py:247-275).
    Composes with the oct sweep cache and sweep_max_level."""
    from ..ops.pallas_mlp import effective_linear_weights, fused_sdf_mlp_nograd

    assert cfg.use_grid, "use sdf_value_pallas for MLP mode"
    ws, bs = effective_linear_weights(params, cfg.num_layers)
    ws[-1] = ws[-1][:, :1]
    bs[-1] = bs[-1][:1]
    inp = _net_input(params, cfg, x, max_level)
    flat = inp.reshape(-1, inp.shape[-1])
    out = fused_sdf_mlp_nograd(ws, bs, flat, cfg.skip_in, dtype=dtype)
    sdf = out[:, :1].reshape(*x.shape[:-1], 1)
    return _clamp_sdf(cfg, sdf, x)


def sdf_feat_grad_pallas_grid(
    params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray, dtype=None,
    block: int = 512,
):
    """Grid-mode Pallas diff path: (sdf, features, grad_x sdf) with the
    2x256 trunk's stacked primal+tangent forward AND hand-written backward
    as one VMEM-resident kernel pair (ops/pallas_sdf_grad_grid.py). The
    hash encode and its three spatial basis JVPs stay XLA-side
    (jax.linearize shares the gathered rows across tangents); the kernel's
    input cotangents flow back through the linearization's transpose into
    the fold scatter, so table gradients — including the eikonal
    grad-of-grad — are exact (parity-tested vs sdf_feat_grad)."""
    from ..ops.pallas_mlp import effective_linear_weights
    from ..ops.pallas_sdf_grad_grid import sdf_mlp_with_grad_in

    assert cfg.use_grid, "use sdf_feat_grad_pallas for MLP mode"
    # the kernel is built with empty skips; a reachable skip (index below
    # num_layers-1) would silently diverge from the jnp path (note the
    # asymmetry with sdf_value_pallas_grid, whose fused_sdf_mlp_nograd
    # handles skips)
    assert not any(s < cfg.num_layers - 1 for s in cfg.skip_in), (
        f"sdf_feat_grad_pallas_grid does not support skip connections "
        f"(skip_in={cfg.skip_in}); use diff_backend='jnp'"
    )
    ws, bs = effective_linear_weights(params, cfg.num_layers)

    def inp_fn(y):
        return _net_input(params, cfg, y)

    inp, jvp_fn = jax.linearize(inp_fn, x)
    basis = jnp.eye(3, dtype=x.dtype)
    tg = jnp.stack(
        [jvp_fn(jnp.broadcast_to(bv, x.shape)) for bv in basis], axis=0
    )
    dtype_name = "" if dtype is None else jnp.dtype(dtype).name
    sdf, feat, g = sdf_mlp_with_grad_in(
        tuple(ws), tuple(bs), inp, tg, dtype_name, block
    )
    return _clamp_sdf(cfg, sdf, x), feat, g


def sdf_feat_grad(params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray, dtype=None):
    """x (..., 3) -> (sdf (...,1), features (...,F), grad_x sdf (...,3)).

    The spatial gradient uses FORWARD mode (jax.linearize + 3 basis JVPs):
    the primal forward is shared across tangents, and the eikonal loss's
    grad-of-grad becomes reverse-over-forward — exact, and unlike
    reverse-over-reverse it does not crash the TPU XLA fusion pass (observed
    SIGILL in TpuPriorityFusionQueue on the double-backward graph). This is
    the idiomatic TPU formulation of the reference's
    torch.autograd.grad(create_graph=True) (network.py:111-129)."""
    def f(xx):
        out = implicit_apply(params, cfg, xx, dtype=dtype)
        sdf = _clamp_sdf(cfg, out[..., :1], xx)
        return jnp.concatenate([sdf, out[..., 1:]], axis=-1)

    out, jvp_fn = jax.linearize(f, x)
    basis = jnp.eye(3, dtype=x.dtype)
    grads = jnp.stack(
        [jvp_fn(jnp.broadcast_to(b, x.shape))[..., 0] for b in basis], axis=-1
    )
    return out[..., :1], out[..., 1:], grads


def sdf_feat_grad_pallas(params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray,
                         dtype=None, block: int = 512,
                         wide_grad: bool = False, clamp_rows: int = -1):
    """sdf_feat_grad with fully-fused Pallas kernels
    (ops/pallas_sdf_grad.py): the positional encoding, its basis tangents,
    and the stacked primal+tangent MLP run in one VMEM-resident forward that
    streams pre-activations; the hand-written VJP reads them back and
    reverses without recompute. MLP-mode only.

    Semantics match sdf_feat_grad (incl. the bounding-sphere clamp on both
    the value and its spatial gradient); parameter gradients only — sample
    points are stop-gradient'ed data in every reference loss."""
    from ..ops.pallas_mlp import effective_linear_weights
    from ..ops.pallas_sdf_grad import sdf_mlp_with_grad

    assert not cfg.use_grid, "pallas diff path is for MLP mode"
    prefix = x.shape[:-1]
    xf = x.reshape(-1, 3)
    ws, bs = effective_linear_weights(params, cfg.num_layers)
    dtype_name = jnp.dtype(dtype).name if dtype is not None else ""
    # the bounding-sphere clamp (value + gradient select + the VJP's
    # cotangent gating) runs IN-KERNEL — the XLA-side norm/compare/select
    # chain on (N, 1)-shaped arrays cost ~0.5 ms/step
    sdf, feat, grad = sdf_mlp_with_grad(
        tuple(ws), tuple(bs), xf, cfg.multires, tuple(cfg.skip_in),
        dtype_name, block, True, float(cfg.sdf_bounding_sphere),
        float(cfg.sphere_scale), wide_grad, clamp_rows,
    )
    return (
        sdf.reshape(*prefix, 1),
        feat.reshape(*prefix, -1),
        grad if wide_grad else grad.reshape(*prefix, 3),
    )


def sdf_gradient_pallas(params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray,
                        dtype=None, block: int = 512) -> jnp.ndarray:
    """sdf_gradient (UNclamped, reference network.py:98-109) via the fused
    Pallas-backward path. MLP-mode only."""
    from ..ops.pallas_mlp import effective_linear_weights
    from ..ops.pallas_sdf_grad import sdf_mlp_with_grad

    assert not cfg.use_grid, "pallas diff path is for MLP mode"
    prefix = x.shape[:-1]
    xf = x.reshape(-1, 3)
    ws, bs = effective_linear_weights(params, cfg.num_layers)
    dtype_name = jnp.dtype(dtype).name if dtype is not None else ""
    _, _, grad = sdf_mlp_with_grad(
        tuple(ws), tuple(bs), xf, cfg.multires, tuple(cfg.skip_in),
        dtype_name, block
    )
    return grad.reshape(*prefix, 3)


def rendering_apply_pallas(
    params: dict,
    cfg: "RenderingNetConfig",
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
    image_code: jnp.ndarray | None = None,
    dtype=None,
    block: int = 1024,
) -> dict:
    """rendering_apply (idr-mode non-spec trunk) with the split-operand
    Pallas VJP (ops/pallas_rgb_grad.py radiance_split): normals, the
    [points|viewPE] block, features and the per-image code ship as SEPARATE
    aligned operands with the first layer's weight rows split to match — the
    (N, 289) input concatenate and its cotangent split never materialize.
    The backward recomputes in VMEM and emits normal/feature/code cotangents
    (no points/view cotangent — stop-gradient'ed data). View PE and the
    final sigmoid/HDR-relu stay in XLA."""
    from ..ops.pallas_mlp import effective_linear_weights
    from ..ops.pallas_rgb_grad import mlp_with_input_grad, radiance_split

    assert not cfg.spec, "pallas radiance path covers the plain trunk only"
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    if cfg.mode != "idr":
        # nerf mode has no normals block — use the concatenated-h0 kernel
        h = jnp.concatenate([view_dirs, feature_vectors], axis=-1)
        if cfg.per_image_code:
            assert image_code is not None
            h = jnp.concatenate([h, image_code], axis=-1)
        ws, bs = effective_linear_weights(params, cfg.num_layers)
        dtype_name = jnp.dtype(dtype).name if dtype is not None else ""
        out = mlp_with_input_grad(tuple(ws), tuple(bs), h, dtype_name, 256)
        out = jax.nn.relu(out) if cfg.if_hdr else jax.nn.sigmoid(out)
        return {"rgb": out}
    sv = jnp.concatenate([points, view_dirs], axis=-1)
    n128 = jnp.pad(normals, ((0, 0), (0, 128 - normals.shape[1])))
    code = image_code if cfg.per_image_code else None
    if cfg.per_image_code:
        assert image_code is not None

    ws, bs = effective_linear_weights(params, cfg.num_layers)
    dtype_name = jnp.dtype(dtype).name if dtype is not None else ""
    out = radiance_split(
        tuple(ws), tuple(bs), n128, sv, feature_vectors, code,
        sv.shape[1], dtype_name, block,
    )
    out = jax.nn.relu(out) if cfg.if_hdr else jax.nn.sigmoid(out)
    return {"rgb": out}


def rendering_apply_pallas_wide(
    params: dict,
    cfg: "RenderingNetConfig",
    points: jnp.ndarray,
    g128: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
    image_code: jnp.ndarray | None = None,
    dtype=None,
    block: int = 1024,
) -> dict:
    """Fused wide-I/O radiance (idr non-spec): takes the SDF kernel's RAW
    (N, 128) gradient block, normalizes it IN-KERNEL, and returns both
    the rgb and the (N, 128) normals — the whole gradient path flows
    kernel-to-kernel with no (N, 3) slice/normalize/pad chain in XLA
    (ops/pallas_rgb_grad.py radiance_norm)."""
    from ..ops.pallas_mlp import effective_linear_weights
    from ..ops.pallas_rgb_grad import radiance_norm

    assert not cfg.spec and cfg.mode == "idr"
    if cfg.multires_view > 0 and view_dirs.shape[-1] == 3:
        # (callers may pass view_dirs ALREADY encoded — e.g. per-ray PE
        # repeated over samples, 98x less trig for identical values)
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    sv = jnp.concatenate([points, view_dirs], axis=-1)
    code = image_code if cfg.per_image_code else None

    ws, bs = effective_linear_weights(params, cfg.num_layers)
    dtype_name = jnp.dtype(dtype).name if dtype is not None else ""
    out, normals128 = radiance_norm(
        tuple(ws), tuple(bs), g128, sv, feature_vectors, code,
        sv.shape[1], dtype_name, block,
    )
    out = jax.nn.relu(out) if cfg.if_hdr else jax.nn.sigmoid(out)
    return {"rgb": out, "normals128": normals128}


def sdf_gradient(
    params: dict, cfg: ImplicitNetConfig, x: jnp.ndarray, dtype=None
) -> jnp.ndarray:
    """x (..., 3) -> grad_x sdf (..., 3) by forward-mode (see sdf_feat_grad).
    NOTE: the reference's gradient_sdf does NOT apply the sphere clamp
    (network.py:98-109); match that."""
    def f(xx):
        return implicit_apply(params, cfg, xx, dtype=dtype)[..., 0]

    _, jvp_fn = jax.linearize(f, x)
    basis = jnp.eye(3, dtype=x.dtype)
    return jnp.stack(
        [jvp_fn(jnp.broadcast_to(b, x.shape)) for b in basis], axis=-1
    )


# ---------------------------------------------------------------------------
# Rendering (radiance) network
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RenderingNetConfig:
    feature_vector_size: int = 256
    mode: str = "idr"  # 'idr' (x, view, n, feat) or 'nerf' (view, feat)
    d_in: int = 9
    d_out: int = 3
    dims: tuple = (256, 256)
    weight_norm: bool = True
    multires_view: int = 4
    per_image_code: bool = False
    if_hdr: bool = False
    spec: bool = False
    max_images: int = 1024
    code_dim: int = 32

    @property
    def layer_dims(self) -> tuple:
        d0 = self.d_in + self.feature_vector_size
        if self.multires_view > 0:
            d0 += pe_dim(self.multires_view, 3) - 3
        if self.per_image_code:
            d0 += self.code_dim
        return (d0, *self.dims, self.d_out)

    @property
    def num_layers(self) -> int:
        return len(self.layer_dims)


def init_rendering_net(key, cfg: RenderingNetConfig) -> dict:
    dims = cfg.layer_dims
    params: dict = {}
    keys = jax.random.split(key, cfg.num_layers)
    for l in range(cfg.num_layers - 1):
        d_in = dims[l]
        if cfg.spec and l == cfg.num_layers - 3:
            d_in = dims[l] - 3  # diffuse RGB split off before the spec branch
        params[f"lin{l}"] = init_linear(keys[l], d_in, dims[l + 1], cfg.weight_norm)
    if cfg.per_image_code:
        params["embeddings"] = jax.random.uniform(
            keys[-1], (cfg.max_images, cfg.code_dim), minval=-1e-4, maxval=1e-4
        )
    return params


def rendering_apply(
    params: dict,
    cfg: RenderingNetConfig,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
    image_code: jnp.ndarray | None = None,
    dtype=None,
) -> dict:
    """Per-sample radiance (reference network.py:389-470).

    All inputs are (N, ·) flat sample tensors; image_code (N, code_dim) is the
    already-gathered per-image latent (or None)."""
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)

    if cfg.mode == "idr":
        h = jnp.concatenate([points, view_dirs, normals, feature_vectors], axis=-1)
    elif cfg.mode == "nerf":
        h = jnp.concatenate([view_dirs, feature_vectors], axis=-1)
    else:
        raise NotImplementedError(cfg.mode)

    if cfg.per_image_code:
        assert image_code is not None
        h = jnp.concatenate([h, image_code], axis=-1)

    if cfg.spec:
        # diffuse trunk -> split 3ch diffuse + spec branch, summed
        # (reference network.py:427-454); HDR only.
        assert cfg.if_hdr
        for l in range(cfg.num_layers - 3):
            h = jax.nn.relu(apply_linear(params[f"lin{l}"], h, dtype=dtype))
        color_diff, h = h[:, :3], h[:, 3:]
        for l in range(cfg.num_layers - 3, cfg.num_layers - 1):
            h = jax.nn.relu(apply_linear(params[f"lin{l}"], h, dtype=dtype))
        color_spec = h
        return {
            "rgb": color_diff + color_spec,
            "rgb_diff": color_diff,
            "rgb_spec": color_spec,
        }

    for l in range(cfg.num_layers - 1):
        last = l == cfg.num_layers - 2
        h = apply_linear(params[f"lin{l}"], h, dtype=dtype, keep_dtype=not last)
        if not last:
            h = jax.nn.relu(h)
    h = jax.nn.relu(h) if cfg.if_hdr else jax.nn.sigmoid(h)
    return {"rgb": h.astype(jnp.float32) if dtype is not None else h}
