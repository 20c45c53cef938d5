"""Tests for the NN layer library and field networks, including
weight-norm parity against torch and geometric-init properties."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosdf_tpu.nn import apply_linear, init_linear, softplus_beta
from monosdf_tpu.models import (
    ImplicitNetConfig,
    RenderingNetConfig,
    init_implicit_net,
    init_rendering_net,
    implicit_apply,
    sdf_value,
    sdf_feat_grad,
    sdf_gradient,
    rendering_apply,
)


class TestWeightNorm:
    def test_parity_with_torch(self):
        torch = pytest.importorskip("torch")
        d_in, d_out = 7, 5
        params = init_linear(jax.random.PRNGKey(0), d_in, d_out, weight_norm=True)
        lin = torch.nn.Linear(d_in, d_out)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.asarray(params["v"]).T.copy()))
            lin.bias.copy_(torch.from_numpy(np.asarray(params["b"]).copy()))
        lin = torch.nn.utils.weight_norm(lin)
        # Perturb g the same way on both sides to make the test non-trivial.
        with torch.no_grad():
            lin.weight_g.mul_(1.7)
        params = dict(params, g=params["g"] * 1.7)

        x = np.random.default_rng(1).normal(size=(11, d_in)).astype(np.float32)
        y_jax = np.asarray(apply_linear(params, jnp.asarray(x)))
        y_torch = lin(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(y_jax, y_torch, rtol=1e-5, atol=1e-6)

    def test_softplus_beta_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = np.linspace(-1, 1, 101).astype(np.float32)
        ours = np.asarray(softplus_beta(jnp.asarray(x), 100.0))
        theirs = torch.nn.Softplus(beta=100)(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestImplicitNet:
    def _cfg(self, **kw):
        base = dict(
            feature_vector_size=16,
            sdf_bounding_sphere=1.1,
            dims=(32, 32),
            bias=0.9,
            multires=6,
            inside_outside=True,
        )
        base.update(kw)
        return ImplicitNetConfig(**base)

    def test_shapes(self):
        cfg = self._cfg()
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((13, 3))
        out = implicit_apply(params, cfg, x)
        assert out.shape == (13, 17)
        sdf, feat, grad = sdf_feat_grad(params, cfg, x)
        assert sdf.shape == (13, 1) and feat.shape == (13, 16) and grad.shape == (13, 3)

    def test_geometric_init_sphere(self):
        """inside_outside init approximates sdf(x) ~ bias - |x| (positive
        inside): center positive, eikonal ~1 away from origin."""
        cfg = self._cfg(dims=(64, 64), feature_vector_size=32)
        params = init_implicit_net(jax.random.PRNGKey(3), cfg)
        sdf0 = float(sdf_value(params, cfg, jnp.zeros((1, 3)))[0, 0])
        assert sdf0 > 0.3, f"center SDF {sdf0} should be positive (inside)"
        pts = jax.random.normal(jax.random.PRNGKey(1), (256, 3)) * 0.5
        g = sdf_gradient(params, cfg, pts)
        norms = np.asarray(jnp.linalg.norm(g, axis=-1))
        assert 0.5 < norms.mean() < 2.0, f"eikonal at init: {norms.mean()}"

    def test_outside_init_sphere(self):
        cfg = self._cfg(inside_outside=False, bias=0.6)
        params = init_implicit_net(jax.random.PRNGKey(3), cfg)
        sdf0 = float(sdf_value(params, cfg, jnp.zeros((1, 3)))[0, 0])
        assert sdf0 < -0.2, "outside-mode center SDF should be negative"

    def test_sphere_clamp(self):
        cfg = self._cfg()
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        far_pt = jnp.array([[3.0, 0.0, 0.0]])
        sdf = float(sdf_value(params, cfg, far_pt)[0, 0])
        # clamp: min(net, 1.0*(1.1 - 3.0)) = at most -1.9
        assert sdf <= -1.89

    def test_skip_connection(self):
        # hidden width must exceed the PE input width (39) for a skip layer
        cfg = self._cfg(dims=(64,) * 8, skip_in=(4,))
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        out = implicit_apply(params, cfg, jnp.ones((2, 3)) * 0.1)
        assert out.shape == (2, 17) and bool(jnp.all(jnp.isfinite(out)))

    def test_grad_of_grad(self):
        """Eikonal loss needs d/dparams of d/dx sdf — must trace."""
        cfg = self._cfg(dims=(16, 16), feature_vector_size=8)
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        pts = jax.random.normal(jax.random.PRNGKey(2), (32, 3)) * 0.3

        def eikonal(p):
            g = sdf_gradient(p, cfg, pts)
            return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

        grads = jax.grad(eikonal)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_grid_variant_shapes(self):
        from monosdf_tpu.ops.hashgrid import HashGridConfig

        cfg = self._cfg(
            use_grid=True,
            grid=HashGridConfig(num_levels=4, log2_hashmap_size=10, desired_resolution=64),
        )
        params = init_implicit_net(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (7, 3)) * 0.4
        sdf, feat, grad = sdf_feat_grad(params, cfg, x)
        assert sdf.shape == (7, 1) and grad.shape == (7, 3)
        assert bool(jnp.all(jnp.isfinite(grad)))


class TestRenderingNet:
    def _apply(self, cfg, n=9, code=None):
        params = init_rendering_net(jax.random.PRNGKey(0), cfg)
        pts = jnp.ones((n, 3)) * 0.2
        nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        view = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
        feat = jnp.ones((n, cfg.feature_vector_size)) * 0.1
        return rendering_apply(params, cfg, pts, nrm, view, feat, code)

    def test_idr_ldr(self):
        cfg = RenderingNetConfig(feature_vector_size=16, dims=(32, 32), multires_view=4)
        out = self._apply(cfg)
        assert out["rgb"].shape == (9, 3)
        assert bool(jnp.all((out["rgb"] >= 0) & (out["rgb"] <= 1)))

    def test_hdr_relu(self):
        cfg = RenderingNetConfig(
            feature_vector_size=16, dims=(32, 32), multires_view=4, if_hdr=True
        )
        out = self._apply(cfg)
        assert bool(jnp.all(out["rgb"] >= 0))

    def test_per_image_code(self):
        cfg = RenderingNetConfig(
            feature_vector_size=16, dims=(32, 32), per_image_code=True, max_images=4
        )
        code = jnp.ones((9, 32)) * 0.01
        out = self._apply(cfg, code=code)
        assert out["rgb"].shape == (9, 3)

    def test_spec_split(self):
        cfg = RenderingNetConfig(
            feature_vector_size=16, dims=(32, 32, 32), if_hdr=True, spec=True
        )
        out = self._apply(cfg)
        assert set(out) == {"rgb", "rgb_diff", "rgb_spec"}
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(out["rgb_diff"] + out["rgb_spec"]),
            rtol=1e-6,
        )
