"""Grid-mode Pallas diff path (ops/pallas_sdf_grad_grid.py): parity of
values, parameter gradients, hash-table gradients (through the fold
scatter), and the eikonal grad-of-grad against the jnp linearize path.

Reference semantics: the grid trunk forward network.py:247-275 and the
hash encoder's first+second backward hashencoder.cu:257-595. Runs in
interpret mode on CPU; the real-chip compile is exercised by
scripts/bench_step.py --grid --diff pallas.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from monosdf_tpu.models.fields import (
    ImplicitNetConfig,
    init_implicit_net,
    sdf_feat_grad,
    sdf_feat_grad_pallas_grid,
)
from monosdf_tpu.ops.hashgrid import HashGridConfig, with_table_cache


@pytest.fixture(scope="module")
def setup():
    grid = HashGridConfig(
        num_levels=4, level_dim=2, base_resolution=16,
        log2_hashmap_size=12, desired_resolution=64, hash_scheme="add",
        layout="quad", scatter_impl="fold", fold_impl="pallas",
        build_impl="pallas", param_flat=True,
    )
    cfg = ImplicitNetConfig(
        feature_vector_size=16, dims=(32, 32), multires=6,
        inside_outside=False, bias=0.5, sdf_bounding_sphere=0.0,
        use_grid=True, grid=grid, divide_factor=1.1,
    )
    params = init_implicit_net(jax.random.PRNGKey(0), cfg)
    # perturb away from geometric init: the reference zero-initializes
    # lin0's feature columns (network.py grid init), which would leave the
    # table-gradient path trivially zero
    leaves, tdef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        tdef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, ks)],
    )
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (130, 3), minval=-1, maxval=1
    )
    return grid, cfg, params, x


def _cached(params, grid):
    return {**params, "encoding": with_table_cache(params["encoding"], grid)}


def test_values_match_jnp(setup):
    grid, cfg, params, x = setup
    p = _cached(params, grid)
    s1, f1, g1 = sdf_feat_grad(p, cfg, x)
    s2, f2, g2 = sdf_feat_grad_pallas_grid(p, cfg, x, block=128)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=5e-5)


def test_grads_match_jnp_including_table(setup):
    """Full reverse pass parity: net params AND the hash table (via the
    kernel's da0 -> encode transpose -> fold scatter), with the eikonal
    term exercising grad-of-grad."""
    grid, cfg, params, x = setup

    def loss(pp, fn):
        p = _cached(pp, grid)
        if fn is sdf_feat_grad:
            s, f, g = fn(p, cfg, x)
        else:
            s, f, g = fn(p, cfg, x, block=128)
        eik = (jnp.linalg.norm(g, axis=-1) - 1.0) ** 2
        return jnp.sum(s**2) + 0.1 * jnp.sum(f**2) + jnp.sum(eik)

    ga = jax.grad(lambda p: loss(p, sdf_feat_grad))(params)
    gb = jax.grad(lambda p: loss(p, sdf_feat_grad_pallas_grid))(params)
    fa, _ = ravel_pytree(ga)
    fb, _ = ravel_pytree(gb)
    scale = float(jnp.abs(fa).max())
    assert float(jnp.abs(fa - fb).max()) < 3e-5 * scale
    ea = np.asarray(ga["encoding"]["embeddings"])
    eb = np.asarray(gb["encoding"]["embeddings"])
    assert np.abs(ea).max() > 1e-2  # the table path is actually exercised
    np.testing.assert_allclose(eb, ea, rtol=0, atol=1e-3 * np.abs(ea).max())


def test_step_runs_with_grid_pallas_diff():
    import numpy as _np

    from monosdf_tpu.data import make_synthetic_sphere_scene, sample_ray_batch
    from monosdf_tpu.losses import LossConfig
    from monosdf_tpu.models import MonoSDFConfig, init_monosdf
    from monosdf_tpu.models.fields import RenderingNetConfig
    from monosdf_tpu.ops.sampler import SamplerConfig
    from monosdf_tpu.train import (
        OptimConfig, init_train_state, make_optimizer, make_train_step,
    )

    cfg = MonoSDFConfig(
        implicit=ImplicitNetConfig(
            feature_vector_size=16, dims=(32, 32), multires=6,
            inside_outside=False, bias=0.5, sdf_bounding_sphere=0.0,
            use_grid=True,
            grid=HashGridConfig(
                num_levels=4, level_dim=2, base_resolution=16,
                log2_hashmap_size=12, desired_resolution=64,
                hash_scheme="add", layout="quad", scatter_impl="fold",
                fold_impl="pallas", build_impl="pallas", param_flat=True,
            ),
        ),
        rendering=RenderingNetConfig(
            feature_vector_size=16, dims=(32, 32), multires_view=4
        ),
        sampler=SamplerConfig(
            N_samples=8, N_samples_eval=16, N_samples_extra=4,
            max_total_iters=2, intersection="cube",
        ),
        scene_bounding_sphere=1.1,
        diff_backend="pallas",
    )
    params = init_monosdf(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(OptimConfig(decay_steps=1000, grid_mode=True))
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(cfg, LossConfig(), opt))
    scene = make_synthetic_sphere_scene(n_images=2, img_res=8)
    batch = jax.tree_util.tree_map(
        jnp.asarray, sample_ray_batch(scene, _np.random.default_rng(0), 16)
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert _np.isfinite(float(metrics["loss"]))
