"""Numerical parity against the PyTorch reference implementation.

Loads the reference's model code (CPU; CUDA calls monkeypatched to no-ops,
external viz modules stubbed), copies OUR parameters into it, and checks
forward outputs, spatial gradients, parameter gradients (through the
eikonal-style double backward), and the full eval-mode render against our
JAX implementation. This is the BASELINE.md "rendered images & pixel
gradients allclose" contract.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REF = "/root/reference/code"


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference model package with CPU/headless shims."""
    for name in ("skimage", "imageio"):
        sys.modules.setdefault(name, types.ModuleType(name))
    # hash encoder would JIT-compile CUDA at import; MLP mode never uses it
    he = types.ModuleType("hashencoder")
    hg = types.ModuleType("hashencoder.hashgrid")
    hg.HashEncoder = object
    hg._hash_encode = None
    he.hashgrid = hg
    sys.modules.setdefault("hashencoder", he)
    sys.modules.setdefault("hashencoder.hashgrid", hg)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    network = importlib.import_module("model.network")
    yield network
    torch.Tensor.cuda = orig_cuda


class MiniConf:
    """pyhocon ConfigTree shim over a plain dict (only the accessors the
    reference model constructor uses)."""

    def __init__(self, d):
        self.d = d

    _MISS = object()

    def _get(self, k, default=_MISS):
        if k in self.d:
            return self.d[k]
        if default is self._MISS:
            raise KeyError(k)
        return default

    def get_int(self, k, default=_MISS):
        return int(self._get(k, default))

    def get_float(self, k, default=_MISS):
        return float(self._get(k, default))

    def get_bool(self, k, default=_MISS):
        return bool(self._get(k, default))

    def get_string(self, k, default=_MISS):
        return str(self._get(k, default))

    def get_list(self, k, default=_MISS):
        return list(self._get(k, default))

    def get_config(self, k, default=_MISS):
        v = self._get(k, default)
        return MiniConf(dict(v)) if isinstance(v, dict) else v

    def get(self, k, default=_MISS):
        v = self._get(k, default)
        return MiniConf(v) if isinstance(v, dict) else v

    def get_bool_(self, k, default=None):
        return self.get_bool(k, default)

    def __contains__(self, k):
        return k in self.d

    def keys(self):
        return self.d.keys()

    def __iter__(self):
        return iter(self.d)

    def __getitem__(self, k):
        v = self.d[k]
        return MiniConf(v) if isinstance(v, dict) else v


DIMS = (64, 64, 64, 64)
SKIP = (2,)
MULTIRES = 6
FEAT = 64
SPHERE = 1.1

# Production ScanNet-MLP shapes (real_DormRoom_v1_MLP.conf:14-17 /
# network.py:51-96): 8x256 SDF with skip@4, 2x256 radiance, feat 256.
PROD = dict(dims=(256,) * 8, skip=(4,), feat=256, rdims=(256, 256),
            inside_outside=True, bias=0.9)
SMALL = dict(dims=DIMS, skip=SKIP, feat=FEAT, rdims=(64, 64),
             inside_outside=False, bias=0.6)


def _our_cfg(shape=SMALL):
    from monosdf_tpu.models import MonoSDFConfig
    from monosdf_tpu.models.fields import ImplicitNetConfig, RenderingNetConfig
    from monosdf_tpu.ops.sampler import SamplerConfig

    return MonoSDFConfig(
        implicit=ImplicitNetConfig(
            feature_vector_size=shape["feat"], dims=shape["dims"],
            skip_in=shape["skip"], multires=MULTIRES,
            inside_outside=shape["inside_outside"], bias=shape["bias"],
            sdf_bounding_sphere=SPHERE,
        ),
        rendering=RenderingNetConfig(
            feature_vector_size=shape["feat"], dims=shape["rdims"],
            multires_view=4,
        ),
        sampler=SamplerConfig(
            scene_bounding_sphere=SPHERE, N_samples=16, N_samples_eval=32,
            N_samples_extra=8, max_total_iters=3, intersection="sphere",
        ),
        scene_bounding_sphere=SPHERE,
    )


def _ref_conf(shape=SMALL):
    return MiniConf({
        "feature_vector_size": shape["feat"],
        "scene_bounding_sphere": SPHERE,
        "white_bkgd": False,
        "Grid_MLP": False,
        "implicit_network": {
            "d_in": 3, "d_out": 1, "dims": list(shape["dims"]),
            "geometric_init": True, "bias": shape["bias"],
            "skip_in": list(shape["skip"]), "weight_norm": True,
            "multires": MULTIRES, "inside_outside": shape["inside_outside"],
        },
        "rendering_network": {
            "mode": "idr", "d_in": 9, "d_out": 3, "dims": list(shape["rdims"]),
            "weight_norm": True, "multires_view": 4, "per_image_code": False,
        },
        "density": {"params_init": {"beta": 0.1}, "beta_min": 1e-4},
        # NOTE: this reference checkout hard-codes sphere intersection in
        # ErrorBoundSampler's uniform sampler (ray_sampler.py:95).
        "ray_sampler": {
            "near": 0.0, "N_samples": 16, "N_samples_eval": 32,
            "N_samples_extra": 8, "eps": 0.1, "beta_iters": 10,
            "max_total_iters": 3,
        },
    })


def _copy_linear(our_p, t_lin):
    """Copy our (v, g, b)/(w, b) into a torch (weight-norm) Linear."""
    with torch.no_grad():
        if "v" in our_p:
            t_lin.weight_v.copy_(torch.from_numpy(np.asarray(our_p["v"]).T.copy()))
            t_lin.weight_g.copy_(
                torch.from_numpy(np.asarray(our_p["g"]).copy())[:, None]
            )
        else:
            t_lin.weight.copy_(torch.from_numpy(np.asarray(our_p["w"]).T.copy()))
        t_lin.bias.copy_(torch.from_numpy(np.asarray(our_p["b"]).copy()))


def _build_pair(ref_modules, seed=0, shape=SMALL):
    """(our params, our cfg, reference torch model with copied params)."""
    from monosdf_tpu.models import init_monosdf

    cfg = _our_cfg(shape)
    params = init_monosdf(jax.random.PRNGKey(seed), cfg)
    model = ref_modules.MonoSDFNetwork(_ref_conf(shape))
    model.eval()

    n_imp = cfg.implicit.num_layers - 1
    for l in range(n_imp):
        _copy_linear(params["implicit"][f"lin{l}"],
                     getattr(model.implicit_network, f"lin{l}"))
    n_ren = cfg.rendering.num_layers - 1
    for l in range(n_ren):
        _copy_linear(params["rendering"][f"lin{l}"],
                     getattr(model.rendering_network, f"lin{l}"))
    with torch.no_grad():
        model.density.beta.copy_(
            torch.tensor(float(np.asarray(params["density"]["beta"])))
        )
    return params, cfg, model


class TestImplicitParity:
    def test_forward(self, ref_modules):
        params, cfg, model = _build_pair(ref_modules)
        from monosdf_tpu.models.fields import implicit_apply

        x = np.random.default_rng(0).uniform(-1, 1, (50, 3)).astype(np.float32)
        ours = np.asarray(implicit_apply(params["implicit"], cfg.implicit,
                                         jnp.asarray(x)))
        theirs = model.implicit_network(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_spatial_gradient(self, ref_modules):
        params, cfg, model = _build_pair(ref_modules)
        from monosdf_tpu.models.fields import sdf_gradient

        x = np.random.default_rng(1).uniform(-1, 1, (30, 3)).astype(np.float32)
        ours = np.asarray(sdf_gradient(params["implicit"], cfg.implicit,
                                       jnp.asarray(x)))
        xt = torch.from_numpy(x.copy())
        theirs = model.implicit_network.gradient_sdf(xt).detach().numpy()
        theirs = theirs.reshape(ours.shape)
        np.testing.assert_allclose(ours, theirs, atol=2e-4)

    def test_param_grads_through_eikonal(self, ref_modules):
        """grad wrt params of mean((|grad_x sdf| - 1)^2) — the double
        backward the reference hand-writes in CUDA for grids."""
        params, cfg, model = _build_pair(ref_modules)
        from monosdf_tpu.models.fields import sdf_gradient

        x = np.random.default_rng(2).uniform(-1, 1, (20, 3)).astype(np.float32)

        def our_loss(p):
            g = sdf_gradient(p, cfg.implicit, jnp.asarray(x))
            return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

        our_g = jax.grad(our_loss)(params["implicit"])

        xt = torch.from_numpy(x.copy())
        gt = model.implicit_network.gradient_sdf(xt).reshape(-1, 3)
        loss = ((gt.norm(dim=-1) - 1.0) ** 2).mean()
        loss.backward()

        for l in range(cfg.implicit.num_layers - 1):
            t_lin = getattr(model.implicit_network, f"lin{l}")
            ours_v = np.asarray(our_g[f"lin{l}"]["v"])
            theirs_v = t_lin.weight_v.grad.detach().numpy().T
            np.testing.assert_allclose(
                ours_v, theirs_v, atol=2e-5,
                err_msg=f"lin{l} weight_v grad mismatch",
            )


class TestProductionWidthParity:
    """Same contracts at the benchmarked production shapes (ScanNet MLP:
    8x256 SDF skip@4, 2x256 radiance, feat 256 — real_DormRoom_v1_MLP.conf,
    network.py:51-96). Guards against width-dependent drift (skip-concat
    scaling, weight-norm accumulation order) that the 64-wide cases could
    mask."""

    def test_forward_and_radiance(self, ref_modules):
        params, cfg, model = _build_pair(ref_modules, shape=PROD)
        from monosdf_tpu.models.fields import implicit_apply, rendering_apply

        rng = np.random.default_rng(10)
        x = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
        ours = np.asarray(implicit_apply(params["implicit"], cfg.implicit,
                                         jnp.asarray(x)))
        theirs = model.implicit_network(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

        n = rng.normal(size=(64, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        v = rng.normal(size=(64, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        feat = ours[:, 1:].astype(np.float32)
        ours_rgb = np.asarray(rendering_apply(
            params["rendering"], cfg.rendering, jnp.asarray(x),
            jnp.asarray(n), jnp.asarray(v), jnp.asarray(feat))["rgb"])
        theirs_rgb = model.rendering_network(
            torch.from_numpy(x), torch.from_numpy(n), torch.from_numpy(v),
            torch.from_numpy(feat), indices=None, if_pixel_input=True,
        )["rgb"].detach().numpy()
        np.testing.assert_allclose(ours_rgb, theirs_rgb.reshape(ours_rgb.shape),
                                   atol=2e-5)

    def test_param_grads_through_eikonal(self, ref_modules):
        params, cfg, model = _build_pair(ref_modules, shape=PROD)
        from monosdf_tpu.models.fields import sdf_gradient

        x = np.random.default_rng(11).uniform(-1, 1, (16, 3)).astype(np.float32)

        def our_loss(p):
            g = sdf_gradient(p, cfg.implicit, jnp.asarray(x))
            return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

        our_g = jax.grad(our_loss)(params["implicit"])

        xt = torch.from_numpy(x.copy())
        gt = model.implicit_network.gradient_sdf(xt).reshape(-1, 3)
        loss = ((gt.norm(dim=-1) - 1.0) ** 2).mean()
        loss.backward()

        for l in range(cfg.implicit.num_layers - 1):
            t_lin = getattr(model.implicit_network, f"lin{l}")
            ours_v = np.asarray(our_g[f"lin{l}"]["v"])
            theirs_v = t_lin.weight_v.grad.detach().numpy().T
            np.testing.assert_allclose(
                ours_v, theirs_v, atol=2e-4,
                err_msg=f"lin{l} weight_v grad mismatch (production width)",
            )


class TestDensityParity:
    def test_laplace(self, ref_modules):
        from monosdf_tpu.ops.density import laplace_density

        sys.path.insert(0, REF)
        from model.density import LaplaceDensity

        ld = LaplaceDensity(params_init={"beta": 0.1}, beta_min=1e-4)
        sdf = np.linspace(-0.5, 0.5, 101).astype(np.float32)
        theirs = ld(torch.from_numpy(sdf)).detach().numpy()
        beta = 0.1 + 1e-4
        ours = np.asarray(laplace_density(jnp.asarray(sdf), jnp.asarray(beta)))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestFullRenderParity:
    def test_eval_mode_outputs(self, ref_modules):
        """Full eval-mode forward (deterministic: linspace sampling) on
        identical rays: rgb/depth/normal allclose."""
        params, cfg, model = _build_pair(ref_modules)
        from monosdf_tpu.models import render_rays

        n = 6
        rng = np.random.default_rng(3)
        d = rng.normal(size=(n, 3))
        d[:, 2] = np.abs(d[:, 2]) + 1.5
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile([[0.0, 0.0, -1.5]], (n, 1)).astype(np.float32)
        d = d.astype(np.float32)
        scale = np.abs(rng.uniform(0.8, 1.0, (n, 1))).astype(np.float32)

        rays = {
            "rays_o": jnp.asarray(o),
            "rays_d": jnp.asarray(d),
            "depth_scale": jnp.asarray(scale),
            "pose": jnp.tile(jnp.eye(4)[None], (n, 1, 1)),
        }
        ours = render_rays(params, cfg, rays, jax.random.PRNGKey(0),
                           training=False)

        inp = {
            "ray_dirs": torch.from_numpy(d),
            "ray_cam_loc": torch.from_numpy(o),
            # depth_scale comes from ray_dirs_tmp[0, :, 2:]
            "ray_dirs_tmp": torch.from_numpy(
                np.concatenate([np.zeros((n, 2), np.float32), scale], -1)
            ),
            "ray_pose": torch.eye(4)[None].repeat(n, 1, 1),
        }
        # no torch.no_grad(): the reference's get_outputs uses autograd.grad
        # for the SDF normals even in eval mode (network.py:111-129)
        theirs = model(inp, indices=None, if_pixel_input=True)
        theirs = {k: v.detach() for k, v in theirs.items()
                  if isinstance(v, torch.Tensor)}

        # Tolerances: strict per-component parity is established above at
        # 2e-5; the full pipeline goes through the error-bounded sampler,
        # where a ray converging at the eps boundary can take one fewer/extra
        # upsampling round than the reference's data-dependent while loop
        # (our loop is a fixed-trip masked unroll) — shifting its sample
        # positions and moving outputs by ~1e-2 on that ray.
        np.testing.assert_allclose(
            np.asarray(ours["rgb_values"]),
            theirs["rgb_values"].numpy(),
            atol=1.5e-2,
        )
        np.testing.assert_allclose(
            np.asarray(ours["depth_values"]).ravel(),
            theirs["depth_values"].numpy().ravel(),
            atol=1.5e-2,
        )
        np.testing.assert_allclose(
            np.asarray(ours["normal_map"]),
            theirs["normal_map"].numpy(),
            atol=1.5e-2,
        )
