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
