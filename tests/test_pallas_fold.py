"""Exactness of the round-4 Pallas fold/build kernels (ops/pallas_fold.py)
against the XLA fold path, at 0th/1st/2nd order.

The kernels re-express the corner-affine fold backward and the quad-table
build as static lane-permute matmuls on 128-lane packed views (reference
semantics: hashencoder.cu:103-254 forward, :257-343 backward). Everything
here runs on CPU in interpret mode; the real-chip compile is exercised by
scripts/bench_step.py --grid --fold_impl pallas.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from monosdf_tpu.ops.hashgrid import (
    HashGridConfig, hash_encode_01, init_hashgrid, _hash_group,
)


def _cfg(**kw):
    base = dict(
        num_levels=4, level_dim=2, base_resolution=16,
        log2_hashmap_size=12, desired_resolution=128,
        hash_scheme="add", layout="quad", scatter_impl="fold",
    )
    base.update(kw)
    return HashGridConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    key = jax.random.PRNGKey(7)
    params = init_hashgrid(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (257, 3), minval=0.02,
                           maxval=0.98)
    return cfg, params, x


def test_hash_group_flagship_schedule():
    cfg = HashGridConfig(
        num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=19, desired_resolution=2048, hash_scheme="add",
    )
    h0, n_hash, hms, (s1, s2) = _hash_group(cfg)
    assert (h0, n_hash, hms) == (5, 11, 2 ** 19)
    assert s1 == 2654435761 % (2 ** 19) and s2 == 805459861 % (2 ** 19)


def test_forward_exact(setup):
    cfg, params, x = setup
    ref = hash_encode_01(params, cfg, x)
    cfgp = dataclasses.replace(cfg, fold_impl="pallas", build_impl="pallas")
    out = hash_encode_01(params, cfgp, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_table_grad_exact(setup):
    cfg, params, x = setup
    cfgp = dataclasses.replace(cfg, fold_impl="pallas", build_impl="pallas")

    def loss(p, c):
        out = hash_encode_01(p, c, x)
        return jnp.sum(jnp.sin(3.0 * out) * out)

    g_ref = jax.grad(lambda p: loss(p, cfg))(params)["embeddings"]
    g_pal = jax.grad(lambda p: loss(p, cfgp))(params)["embeddings"]
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_pal), rtol=0, atol=2e-6
    )


def test_second_order_exact(setup):
    """Eikonal-style grad-of-grad: table gradient of the spatial-gradient
    norm must match the XLA fold path."""
    cfg, params, x = setup
    cfgp = dataclasses.replace(cfg, fold_impl="pallas", build_impl="pallas")
    xs = x[:33]

    def spatial_grad_norm(p, c):
        # production-style spatial gradient: basis JVPs, no vmap
        # (linear_call has no batching rule, like the real model path)
        def f(pts):
            return hash_encode_01(p, c, pts)

        gs = []
        for k in range(3):
            e = jnp.zeros_like(xs).at[:, k].set(1.0)
            _, t = jax.jvp(f, (xs,), (e,))
            gs.append(t)
        g = jnp.stack(gs, axis=-1)
        return jnp.sum(g * g)

    g_ref = jax.grad(lambda p: spatial_grad_norm(p, cfg))(params)["embeddings"]
    g_pal = jax.grad(lambda p: spatial_grad_norm(p, cfgp))(params)["embeddings"]
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_pal), rtol=0, atol=5e-5
    )


def test_fold_only_without_build(setup):
    """fold_impl='pallas' with build_impl='xla' (unpermuted take rows)."""
    cfg, params, x = setup
    cfgf = dataclasses.replace(cfg, fold_impl="pallas")
    ref = hash_encode_01(params, cfg, x)
    out = hash_encode_01(params, cfgf, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    def loss(p, c):
        return jnp.sum(hash_encode_01(p, c, x) ** 2)

    g_ref = jax.grad(lambda p: loss(p, cfg))(params)["embeddings"]
    g_pal = jax.grad(lambda p: loss(p, cfgf))(params)["embeddings"]
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_pal), rtol=0, atol=2e-6
    )


def test_oct_layout_fold_kernel(setup):
    """The fold kernel is layout-agnostic: oct + fold_impl='pallas' must
    match oct + XLA fold."""
    cfg, params, x = setup
    cfgo = dataclasses.replace(cfg, layout="oct")
    cfgop = dataclasses.replace(cfgo, fold_impl="pallas")

    def loss(p, c):
        return jnp.sum(hash_encode_01(p, c, x) ** 2)

    ref = hash_encode_01(params, cfgo, x)
    out = hash_encode_01(params, cfgop, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    g_ref = jax.grad(lambda p: loss(p, cfgo))(params)["embeddings"]
    g_pal = jax.grad(lambda p: loss(p, cfgop))(params)["embeddings"]
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_pal), rtol=0, atol=2e-6
    )


def test_level_truncation_matches_prefix(setup):
    """The sweep_max_level machinery: a truncated schedule (num_levels=K,
    explicit per_level_scale) must reproduce the full encode's first K*C
    features exactly — same per-level geometry, same table region."""
    cfg, params, x = setup
    K = 2
    cfgk = dataclasses.replace(
        cfg, num_levels=K, per_level_scale=cfg.scale, desired_resolution=None
    )
    full = np.asarray(hash_encode_01(params, cfg, x))
    trunc = np.asarray(hash_encode_01(params, cfgk, x))
    np.testing.assert_array_equal(full[:, :K * cfg.level_dim], trunc)


def test_sweep_max_level_step_runs():
    """A grid-mode train step with coarse-level-only sweeps runs and the
    loss is finite (quality evidence: QUALITY.md sweep_max_level A/B)."""
    import jax
    from monosdf_tpu.data import make_synthetic_sphere_scene, sample_ray_batch
    from monosdf_tpu.losses import LossConfig
    from monosdf_tpu.models import MonoSDFConfig, init_monosdf
    from monosdf_tpu.models.fields import (
        ImplicitNetConfig, RenderingNetConfig,
    )
    from monosdf_tpu.ops.sampler import SamplerConfig
    from monosdf_tpu.train import (
        OptimConfig, init_train_state, make_optimizer, make_train_step,
    )

    cfg = MonoSDFConfig(
        implicit=ImplicitNetConfig(
            feature_vector_size=16, dims=(32, 32), multires=6,
            inside_outside=False, bias=0.5, sdf_bounding_sphere=0.0,
            use_grid=True,
            grid=_cfg(num_levels=4, log2_hashmap_size=12,
                      desired_resolution=64),
        ),
        rendering=RenderingNetConfig(
            feature_vector_size=16, dims=(32, 32), multires_view=4
        ),
        sampler=SamplerConfig(
            N_samples=8, N_samples_eval=16, N_samples_extra=4,
            max_total_iters=2, intersection="cube",
        ),
        scene_bounding_sphere=1.1,
        sweep_max_level=2,
    )
    params = init_monosdf(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(OptimConfig(decay_steps=1000, grid_mode=True))
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(cfg, LossConfig(), opt))
    scene = make_synthetic_sphere_scene(n_images=2, img_res=8)
    import numpy as _np
    batch = jax.tree_util.tree_map(
        jnp.asarray, sample_ray_batch(scene, _np.random.default_rng(0), 16)
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert _np.isfinite(float(metrics["loss"]))


def test_table_cache_exact(setup):
    """with_table_cache (the once-per-step build hoist) must not change
    outputs or table gradients, XLA and Pallas builds alike."""
    from monosdf_tpu.ops.hashgrid import with_table_cache

    cfg, params, x = setup
    for c in (cfg, dataclasses.replace(cfg, fold_impl="pallas",
                                       build_impl="pallas")):
        ref = hash_encode_01(params, c, x)
        out = hash_encode_01(with_table_cache(params, c), c, x)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

        def loss(p, cc=c):
            return jnp.sum(hash_encode_01(with_table_cache(p, cc), cc, x) ** 2)

        def loss_ref(p, cc=c):
            return jnp.sum(hash_encode_01(p, cc, x) ** 2)

        g_ref = jax.grad(loss_ref)(params)["embeddings"]
        g_cache = jax.grad(loss)(params)["embeddings"]
        np.testing.assert_allclose(
            np.asarray(g_ref), np.asarray(g_cache), rtol=0, atol=2e-6
        )


def test_param_flat_exact(setup):
    """param_flat=True (1-D table leaf) must be value- and gradient-exact
    vs the (T, C) leaf, including through the cache + pallas kernels."""
    from monosdf_tpu.ops.hashgrid import with_table_cache

    cfg, params, x = setup
    cfgf = dataclasses.replace(
        cfg, param_flat=True, fold_impl="pallas", build_impl="pallas"
    )
    pflat = {"embeddings": params["embeddings"].reshape(-1)}

    ref = hash_encode_01(params, cfg, x)
    out = hash_encode_01(with_table_cache(pflat, cfgf), cfgf, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    def loss(p, c):
        return jnp.sum(hash_encode_01(with_table_cache(p, c), c, x) ** 2)

    g_ref = jax.grad(lambda p: loss(p, cfg))(params)["embeddings"]
    g_flat = jax.grad(lambda p: loss(p, cfgf))(pflat)["embeddings"]
    assert g_flat.ndim == 1
    np.testing.assert_allclose(
        np.asarray(g_ref).reshape(-1), np.asarray(g_flat), rtol=0, atol=2e-6
    )


def test_oct_sweep_cache_exact(setup):
    """The oct sweep cache (HashGridConfig.sweep_oct_levels): the truncated
    oct-layout encode served from the per-step cache must reproduce the
    truncated QUAD encode's values — same corners, same weights, only the
    row packing differs (one 8C row vs two 4C rows per level-point)."""
    from monosdf_tpu.ops.hashgrid import sweep_cfg, with_table_cache

    cfg, params, x = setup
    K = 2
    cfgq = dataclasses.replace(
        cfg, num_levels=K, per_level_scale=cfg.scale, desired_resolution=None
    )
    ref = np.asarray(hash_encode_01(params, cfgq, x))

    cfgs = dataclasses.replace(cfg, sweep_oct_levels=K)
    cached = with_table_cache(params, cfgs)
    assert "_oct_sweep" in cached
    out = np.asarray(hash_encode_01(cached, sweep_cfg(cfgs), x))
    np.testing.assert_allclose(ref, out, rtol=0, atol=1e-6)

    # without the cache entry the truncated-oct encode rebuilds in-graph
    # and must still agree
    out2 = np.asarray(hash_encode_01(params, sweep_cfg(cfgs), x))
    np.testing.assert_allclose(ref, out2, rtol=0, atol=1e-6)


def test_oct_sweep_step_matches_quad_sweeps():
    """A grid-mode train step with sweep_oct_levels must produce the same
    loss and parameter update as plain coarse-level quad sweeps: the sweeps
    only place samples (stop-gradient), and oct serves identical values."""
    import dataclasses as _dc

    import jax
    from monosdf_tpu.data import make_synthetic_sphere_scene, sample_ray_batch
    from monosdf_tpu.losses import LossConfig
    from monosdf_tpu.models import MonoSDFConfig, init_monosdf
    from monosdf_tpu.models.fields import (
        ImplicitNetConfig, RenderingNetConfig,
    )
    from monosdf_tpu.ops.sampler import SamplerConfig
    from monosdf_tpu.train import (
        OptimConfig, init_train_state, make_optimizer, make_train_step,
    )

    def run(sweep_oct):
        cfg = MonoSDFConfig(
            implicit=ImplicitNetConfig(
                feature_vector_size=16, dims=(32, 32), multires=6,
                inside_outside=False, bias=0.5, sdf_bounding_sphere=0.0,
                use_grid=True,
                grid=_cfg(num_levels=4, log2_hashmap_size=12,
                          desired_resolution=64,
                          sweep_oct_levels=2 if sweep_oct else 0),
            ),
            rendering=RenderingNetConfig(
                feature_vector_size=16, dims=(32, 32), multires_view=4
            ),
            sampler=SamplerConfig(
                N_samples=8, N_samples_eval=16, N_samples_extra=4,
                max_total_iters=2, intersection="cube",
            ),
            scene_bounding_sphere=1.1,
            sweep_max_level=2,
        )
        params = init_monosdf(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(OptimConfig(decay_steps=1000, grid_mode=True))
        state = init_train_state(params, opt)
        step = jax.jit(make_train_step(cfg, LossConfig(), opt))
        scene = make_synthetic_sphere_scene(n_images=2, img_res=8)
        import numpy as _np
        batch = jax.tree_util.tree_map(
            jnp.asarray,
            sample_ray_batch(scene, _np.random.default_rng(0), 16),
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        return float(metrics["loss"]), state.params["implicit"]["encoding"]["embeddings"]

    loss_q, emb_q = run(False)
    loss_o, emb_o = run(True)
    np.testing.assert_allclose(loss_q, loss_o, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(emb_q), np.asarray(emb_o), rtol=0, atol=1e-7
    )
