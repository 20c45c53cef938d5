"""Hash-grid encoder tests: index math vs a numpy mirror of the CUDA kernel
(reference hashencoder.cu:35-93), smoothstep interpolation, autodiff depth."""

import numpy as np
import jax
import jax.numpy as jnp

from monosdf_tpu.ops.hashgrid import (
    HashGridConfig,
    init_hashgrid,
    hash_encode,
    hash_encode_01,
    _smoothstep,
)

PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint64)


def numpy_hash_encode(emb, cfg: HashGridConfig, x01):
    """Straightforward numpy mirror of hashencoder.cu kernel_grid."""
    B, D = x01.shape
    C = cfg.level_dim
    out = np.zeros((B, cfg.num_levels * C), dtype=np.float64)
    for li, (offset, hsize, res, fscale) in enumerate(cfg.level_params()):
        dense = res**D <= hsize
        for b in range(B):
            if (x01[b] < 0).any() or (x01[b] > 1).any():
                continue
            pos = x01[b] * fscale
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            w = frac * frac * (3 - 2 * frac)
            acc = np.zeros(C)
            for corner in range(1 << D):
                cw = 1.0
                pc = pg.copy()
                for d in range(D):
                    if (corner >> d) & 1:
                        cw *= w[d]
                        pc[d] += 1
                    else:
                        cw *= 1 - w[d]
                if dense:
                    idx = 0
                    stride = 1
                    for d in range(D):
                        idx += int(pc[d]) * stride
                        stride *= res
                else:
                    idx = 0
                    for d in range(D):
                        idx ^= int((np.uint64(pc[d]) * PRIMES[d]) & np.uint64(0xFFFFFFFF))
                idx = idx % hsize
                acc += cw * emb[offset + idx]
            out[b, li * C:(li + 1) * C] = acc
    return out


class TestHashGrid:
    def _cfg(self):
        return HashGridConfig(
            num_levels=4, level_dim=2, base_resolution=4,
            log2_hashmap_size=6, desired_resolution=32,
        )

    def test_offsets_and_table_size(self):
        cfg = HashGridConfig()  # defaults: 16 levels, 2^19, 16->2048
        levels = cfg.level_params()
        assert len(levels) == 16
        # level 0: res 16 -> dense 16^3 = 4096 params
        assert levels[0][1] == 4096
        # top levels clamp at 2^19
        assert levels[-1][1] == 2**19
        assert cfg.table_size == sum(l[1] for l in levels)

    def test_parity_with_numpy_mirror(self):
        cfg = self._cfg()
        params = init_hashgrid(jax.random.PRNGKey(0), cfg)
        emb = np.asarray(params["embeddings"], dtype=np.float64)
        rng = np.random.default_rng(0)
        x01 = rng.uniform(0.02, 0.98, size=(32, 3)).astype(np.float32)
        ours = np.asarray(hash_encode_01(params, cfg, jnp.asarray(x01)))
        ref = numpy_hash_encode(emb, cfg, x01.astype(np.float64))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)

    def test_dense_vs_hash_levels(self):
        cfg = self._cfg()
        levels = cfg.level_params()
        # base res 4 -> 64 <= 2^6 dense; res 32 -> 32768 > 64 hashed
        assert levels[0][2] ** 3 <= levels[0][1]
        assert levels[-1][2] ** 3 > levels[-1][1]

    def test_out_of_bounds_zero(self):
        cfg = self._cfg()
        params = init_hashgrid(jax.random.PRNGKey(0), cfg)
        x = jnp.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
        out = np.asarray(hash_encode_01(params, cfg, x))
        np.testing.assert_allclose(out, 0.0)

    def test_oob_zero_gradient(self):
        cfg = self._cfg()
        params = init_hashgrid(jax.random.PRNGKey(0), cfg)

        def f(x):
            return jnp.sum(hash_encode_01(params, cfg, x))

        g = jax.grad(f)(jnp.array([[1.5, 0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(g), 0.0)

    def test_input_gradient_finite_diff(self):
        cfg = self._cfg()
        params = init_hashgrid(jax.random.PRNGKey(1), cfg)
        x = jnp.array([[0.33, 0.57, 0.71]])

        def f(xx):
            return jnp.sum(hash_encode_01(params, cfg, xx))

        g = np.asarray(jax.grad(f)(x))
        eps = 1e-4
        for d in range(3):
            xp = x.at[0, d].add(eps)
            xm = x.at[0, d].add(-eps)
            fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
            np.testing.assert_allclose(g[0, d], fd, rtol=2e-2, atol=1e-6)

    def test_second_order_grad(self):
        """Eikonal-through-encoder: grad wrt embeddings of grad wrt x must be
        finite and nonzero (smoothstep makes the encoding C^1)."""
        cfg = self._cfg()
        params = init_hashgrid(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(
            np.random.default_rng(2).uniform(0.1, 0.9, size=(8, 3)), jnp.float32
        )

        def eikonal(p):
            def enc_sum(xx):
                return jnp.sum(hash_encode_01(p, cfg, xx))
            g = jax.grad(enc_sum)(x)
            return jnp.sum(g**2)

        ge = jax.grad(eikonal)(params)["embeddings"]
        assert bool(jnp.all(jnp.isfinite(ge)))
        assert float(jnp.abs(ge).max()) > 0

    def test_real_range_mapping(self):
        cfg = self._cfg()
        params = init_hashgrid(jax.random.PRNGKey(0), cfg)
        x = jnp.array([[0.0, 0.0, 0.0]])  # maps to 0.5^3
        a = hash_encode(params, cfg, x, size=1.0)
        b = hash_encode_01(params, cfg, jnp.array([[0.5, 0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_smoothstep_c1(self):
        # s(0)=0, s(1)=1, s'(0)=s'(1)=0
        assert float(_smoothstep(jnp.asarray(0.0))) == 0.0
        assert float(_smoothstep(jnp.asarray(1.0))) == 1.0
        ds = jax.grad(lambda v: _smoothstep(v))
        assert abs(float(ds(0.0))) < 1e-6 and abs(float(ds(1.0))) < 1e-6

    def test_scatter_impls_identical_grads(self):
        """The custom-transpose scatter encoding (flat scalar rows) must
        reproduce XLA's native row scatter exactly, at first AND second
        order (the transpose runs inside the eikonal grad-of-grad)."""
        import dataclasses as dc

        base = self._cfg()
        params = init_hashgrid(jax.random.PRNGKey(1), base)
        x = jnp.asarray(
            np.random.default_rng(3).uniform(0.1, 0.9, size=(16, 3)), jnp.float32
        )

        def grads_for(impl):
            cfg = dc.replace(base, scatter_impl=impl)

            def loss1(p):
                return jnp.sum(hash_encode_01(p, cfg, x) ** 2)

            def eikonal(p):
                def enc_sum(xx):
                    return jnp.sum(hash_encode_01(p, cfg, xx))
                g = jax.grad(enc_sum)(x)
                return jnp.sum(g**2)

            return (
                jax.grad(loss1)(params)["embeddings"],
                jax.grad(eikonal)(params)["embeddings"],
            )

        g1_rows, g2_rows = grads_for("rows")
        for impl in ("flat",):
            g1, g2 = grads_for(impl)
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g1_rows), rtol=0, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(g2), np.asarray(g2_rows), rtol=1e-6, atol=1e-5
            )

    def test_bf16_table_grad_accumulates_f32(self):
        """table_dtype=bfloat16: values gather in bf16 but the table gradient
        must accumulate in f32 (_table_take's transpose) — many small
        contributions to one entry must not collapse to bf16 rounding."""
        import dataclasses as dc

        cfg = dc.replace(self._cfg(), table_dtype="bfloat16")
        params = init_hashgrid(jax.random.PRNGKey(1), cfg)
        # many points in the same cell -> many contributions to few entries
        x = jnp.asarray(
            0.5 + 0.001 * np.random.default_rng(0).uniform(size=(256, 3)),
            jnp.float32,
        )

        def loss(p):
            return jnp.sum(hash_encode_01(p, cfg, x))

        g = jax.grad(loss)(params)["embeddings"]
        cfg32 = dc.replace(cfg, table_dtype="float32")
        g32 = jax.grad(lambda p: jnp.sum(hash_encode_01(p, cfg32, x)))(params)[
            "embeddings"
        ]
        # bf16 gather of the VALUES doesn't affect the (value-independent)
        # smoothstep-weight gradient; accumulation error must stay tiny
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g32), rtol=1e-2, atol=1e-4
        )
        assert float(jnp.abs(g).max()) > 0


class TestQuadLayout:
    """The corner-duplicated 'quad' gather layout (2 wide rows per
    level-point) must be EXACTLY the 'rows' gather under the same additive
    scheme — same indices via the roll construction's mod-hms cyclicity —
    at zeroth, first, and second order."""

    def _cfg(self, **kw):
        import dataclasses as dc

        base = HashGridConfig(
            num_levels=4, level_dim=2, base_resolution=4,
            log2_hashmap_size=6, desired_resolution=32, hash_scheme="add",
        )
        return dc.replace(base, **kw)

    def test_forward_exact(self):
        rows_cfg = self._cfg(layout="rows")
        quad_cfg = self._cfg(layout="quad")
        params = init_hashgrid(jax.random.PRNGKey(2), rows_cfg)
        x = jnp.asarray(
            np.random.default_rng(7).uniform(0.0, 1.0, size=(64, 3)), jnp.float32
        )
        a = np.asarray(hash_encode_01(params, rows_cfg, x))
        b = np.asarray(hash_encode_01(params, quad_cfg, x))
        # identical indices/weights; only the reduction association differs
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)

    def test_flagship_levels_forward_exact(self):
        # the production schedule (16 levels, 2^19, 16->2048) includes the
        # awkward hashed-but-not-pow2 boundary level; cover it
        rows_cfg = self._cfg(
            num_levels=16, base_resolution=16, log2_hashmap_size=19,
            desired_resolution=2048, layout="rows",
        )
        quad_cfg = self._cfg(
            num_levels=16, base_resolution=16, log2_hashmap_size=19,
            desired_resolution=2048, layout="quad",
        )
        params = init_hashgrid(jax.random.PRNGKey(3), rows_cfg)
        x = jnp.asarray(
            np.random.default_rng(8).uniform(0.0, 1.0, size=(16, 3)), jnp.float32
        )
        a = np.asarray(hash_encode_01(params, rows_cfg, x))
        b = np.asarray(hash_encode_01(params, quad_cfg, x))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)

    def test_grads_exact(self):
        rows_cfg = self._cfg(layout="rows")
        quad_cfg = self._cfg(layout="quad")
        params = init_hashgrid(jax.random.PRNGKey(2), rows_cfg)
        x = jnp.asarray(
            np.random.default_rng(9).uniform(0.05, 0.95, size=(32, 3)),
            jnp.float32,
        )

        def table_grad(cfg):
            return jax.grad(
                lambda p: jnp.sum(hash_encode_01(p, cfg, x) ** 2)
            )(params)["embeddings"]

        def eikonal_table_grad(cfg):
            def eik(p):
                g = jax.grad(lambda xx: jnp.sum(hash_encode_01(p, cfg, xx)))(x)
                return jnp.sum(g**2)
            return jax.grad(eik)(params)["embeddings"]

        np.testing.assert_allclose(
            np.asarray(table_grad(quad_cfg)), np.asarray(table_grad(rows_cfg)),
            rtol=0, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(eikonal_table_grad(quad_cfg)),
            np.asarray(eikonal_table_grad(rows_cfg)),
            rtol=1e-6, atol=1e-5,
        )

    def test_spatial_gradient_finite_diff(self):
        cfg = self._cfg(layout="quad")
        params = init_hashgrid(jax.random.PRNGKey(2), cfg)
        x0 = jnp.asarray([[0.33, 0.57, 0.41]], jnp.float32)

        def f(xx):
            return jnp.sum(hash_encode_01(params, cfg, xx))

        g = np.asarray(jax.grad(lambda xx: f(xx))(x0))[0]
        eps = 1e-3
        for d in range(3):
            dx = np.zeros((1, 3), np.float32)
            dx[0, d] = eps
            fd = (float(f(x0 + dx)) - float(f(x0 - dx))) / (2 * eps)
            np.testing.assert_allclose(g[d], fd, rtol=2e-2, atol=1e-4)


class TestFoldScatter:
    """The corner-affine FOLD backward (one 16-channel row per level-point
    scattered at the base index + 8 static rolls) must reproduce the
    per-corner scatter exactly — forward, first order, and second order
    (eikonal) — on both toy and flagship level schedules."""

    def _cfg(self, **kw):
        import dataclasses as dc

        base = HashGridConfig(
            num_levels=4, level_dim=2, base_resolution=4,
            log2_hashmap_size=6, desired_resolution=32, hash_scheme="add",
            layout="quad",
        )
        return dc.replace(base, **kw)

    def _check(self, ref_cfg, fold_cfg, n_pts=48, seed=11, g_atol=1e-6,
               e_rtol=1e-6, e_atol=1e-5):
        params = init_hashgrid(jax.random.PRNGKey(2), ref_cfg)
        x = jnp.asarray(
            np.random.default_rng(seed).uniform(0.02, 0.98, size=(n_pts, 3)),
            jnp.float32,
        )

        def fwd(cfg):
            return np.asarray(hash_encode_01(params, cfg, x))

        def table_grad(cfg):
            return jax.grad(
                lambda p: jnp.sum(hash_encode_01(p, cfg, x) ** 2)
            )(params)["embeddings"]

        def eikonal_table_grad(cfg):
            def eik(p):
                g = jax.grad(lambda xx: jnp.sum(hash_encode_01(p, cfg, xx)))(x)
                return jnp.sum(g**2)
            return jax.grad(eik)(params)["embeddings"]

        np.testing.assert_allclose(fwd(fold_cfg), fwd(ref_cfg), rtol=0, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(table_grad(fold_cfg)), np.asarray(table_grad(ref_cfg)),
            rtol=1e-6, atol=g_atol,
        )
        np.testing.assert_allclose(
            np.asarray(eikonal_table_grad(fold_cfg)),
            np.asarray(eikonal_table_grad(ref_cfg)),
            rtol=e_rtol, atol=e_atol,
        )

    def test_fold_exact_toy(self):
        self._check(self._cfg(scatter_impl="flat"), self._cfg(scatter_impl="fold"))

    def test_fold_exact_flagship_levels(self):
        kw = dict(
            num_levels=16, base_resolution=16, log2_hashmap_size=19,
            desired_resolution=2048,
        )
        self._check(
            self._cfg(scatter_impl="flat", **kw),
            self._cfg(scatter_impl="fold", **kw),
            n_pts=24, seed=13,
        )

    def test_fold_bf16_table(self):
        # the fold bwd accumulates and folds in f32 end-to-end; the flat
        # path rounds its per-corner sums through the bf16 quad table and
        # sums the 4 corner blocks in bf16 — tolerances cover that
        # (flat-side) bf16 rounding class; fold is the more precise one
        self._check(
            self._cfg(scatter_impl="flat", table_dtype="bfloat16"),
            self._cfg(scatter_impl="fold", table_dtype="bfloat16"),
            g_atol=3e-6, e_rtol=3e-2, e_atol=1e-3,
        )

    def test_fold_requires_quad(self):
        import pytest

        cfg = self._cfg(scatter_impl="fold", layout="rows")
        params = init_hashgrid(jax.random.PRNGKey(2), cfg)
        x = jnp.ones((4, 3), jnp.float32) * 0.5
        with pytest.raises(ValueError):
            hash_encode_01(params, cfg, x)



class TestOctLayout:
    """The fully corner-duplicated 'oct' gather layout (ONE wide row per
    level-point) must be exactly the 'rows' gather under the additive
    scheme, with the fold backward exactly the per-corner scatter."""

    def _cfg(self, **kw):
        import dataclasses as dc

        base = HashGridConfig(
            num_levels=4, level_dim=2, base_resolution=4,
            log2_hashmap_size=6, desired_resolution=32, hash_scheme="add",
            layout="oct",
        )
        return dc.replace(base, **kw)

    def _grads(self, cfg, params, x):
        def table_grad():
            return jax.grad(
                lambda p: jnp.sum(hash_encode_01(p, cfg, x) ** 2)
            )(params)["embeddings"]

        def eik_grad():
            def eik(p):
                g = jax.grad(lambda xx: jnp.sum(hash_encode_01(p, cfg, xx)))(x)
                return jnp.sum(g**2)
            return jax.grad(eik)(params)["embeddings"]

        return np.asarray(table_grad()), np.asarray(eik_grad())

    def test_forward_and_grads_exact_vs_rows(self):
        rows_cfg = self._cfg(layout="rows")
        for impl in ("flat", "fold"):
            oct_cfg = self._cfg(scatter_impl=impl)
            params = init_hashgrid(jax.random.PRNGKey(2), rows_cfg)
            x = jnp.asarray(
                np.random.default_rng(7).uniform(0.02, 0.98, size=(40, 3)),
                jnp.float32,
            )
            a = np.asarray(hash_encode_01(params, rows_cfg, x))
            b = np.asarray(hash_encode_01(params, oct_cfg, x))
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)
            g1r, g2r = self._grads(rows_cfg, params, x)
            g1o, g2o = self._grads(oct_cfg, params, x)
            np.testing.assert_allclose(g1o, g1r, rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(g2o, g2r, rtol=1e-6, atol=1e-5)

    def test_flagship_levels_forward_exact(self):
        kw = dict(
            num_levels=16, base_resolution=16, log2_hashmap_size=19,
            desired_resolution=2048,
        )
        rows_cfg = self._cfg(layout="rows", **kw)
        oct_cfg = self._cfg(scatter_impl="fold", **kw)
        params = init_hashgrid(jax.random.PRNGKey(3), rows_cfg)
        x = jnp.asarray(
            np.random.default_rng(8).uniform(0.0, 1.0, size=(16, 3)),
            jnp.float32,
        )
        a = np.asarray(hash_encode_01(params, rows_cfg, x))
        b = np.asarray(hash_encode_01(params, oct_cfg, x))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)

    def test_spatial_gradient_finite_diff(self):
        cfg = self._cfg(scatter_impl="fold")
        params = init_hashgrid(jax.random.PRNGKey(2), cfg)
        x0 = jnp.asarray([[0.33, 0.57, 0.41]], jnp.float32)

        def f(xx):
            return jnp.sum(hash_encode_01(params, cfg, xx))

        g = np.asarray(jax.grad(lambda xx: f(xx))(x0))[0]
        eps = 1e-3
        for d in range(3):
            dx = np.zeros((1, 3), np.float32)
            dx[0, d] = eps
            fd = (float(f(x0 + dx)) - float(f(x0 - dx))) / (2 * eps)
            np.testing.assert_allclose(g[d], fd, rtol=2e-2, atol=1e-4)


class TestOctFullCache:
    """layout='oct' + scatter_impl='fold' with the FULL-schedule oct cache
    (with_table_cache '_oct_full'): forward, table gradients and the
    eikonal grad-of-grad must be exact vs the no-cache oct path, and a
    TRUNCATED (sweep) schedule must gather correctly from the full cache's
    level-prefix rows."""

    def _cfg(self, **kw):
        import dataclasses as dc

        base = HashGridConfig(
            num_levels=4, level_dim=2, base_resolution=4,
            log2_hashmap_size=6, desired_resolution=32, hash_scheme="add",
            layout="oct", scatter_impl="fold",
        )
        return dc.replace(base, **kw)

    def test_cached_matches_uncached(self):
        from monosdf_tpu.ops.hashgrid import with_table_cache

        cfg = self._cfg()
        params = init_hashgrid(jax.random.PRNGKey(2), cfg)
        x = jnp.asarray(
            np.random.default_rng(7).uniform(0.02, 0.98, size=(40, 3)),
            jnp.float32,
        )

        def run(p):
            return hash_encode_01(p, cfg, x)

        a = np.asarray(run(params))
        b = np.asarray(run(with_table_cache(params, cfg)))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)

        def tgrad(p):
            return np.asarray(jax.grad(
                lambda e: jnp.sum(
                    hash_encode_01({**p, "embeddings": e}, cfg, x) ** 2
                )
            )(p["embeddings"]))

        g_plain = tgrad(params)
        g_cached = tgrad(with_table_cache(params, cfg))
        np.testing.assert_allclose(g_cached, g_plain, rtol=1e-6, atol=1e-7)

        def eik(p):
            def inner(e):
                g = jax.grad(
                    lambda xx: jnp.sum(
                        hash_encode_01({**p, "embeddings": e}, cfg, xx)
                    )
                )(x)
                return jnp.sum(g ** 2)
            return np.asarray(jax.grad(inner)(p["embeddings"]))

        np.testing.assert_allclose(
            eik(with_table_cache(params, cfg)), eik(params),
            rtol=1e-6, atol=1e-6,
        )

    def test_truncated_sweep_from_full_cache(self):
        import dataclasses as dc

        from monosdf_tpu.ops.hashgrid import with_table_cache

        cfg = self._cfg()
        params = init_hashgrid(jax.random.PRNGKey(3), cfg)
        x = jnp.asarray(
            np.random.default_rng(9).uniform(0.02, 0.98, size=(24, 3)),
            jnp.float32,
        )
        trunc = dc.replace(
            cfg, num_levels=2, per_level_scale=cfg.scale,
            desired_resolution=None,
        )
        # level geometry of the truncated schedule must equal the prefix
        assert trunc.level_params() == cfg.level_params()[:2]
        plain = np.asarray(hash_encode_01(params, trunc, x))
        cached = np.asarray(
            hash_encode_01(with_table_cache(params, cfg), trunc, x)
        )
        np.testing.assert_allclose(cached, plain, rtol=0, atol=1e-9)

    def test_param_flat_cached(self):
        from monosdf_tpu.ops.hashgrid import with_table_cache

        # fold_impl='pallas' needs production-sized levels (hms >= 4096 for
        # the kernel's window reads) — covered by tests/test_pallas_fold.py
        cfg = self._cfg(param_flat=True, table_dtype="bfloat16")
        params = init_hashgrid(jax.random.PRNGKey(4), cfg)
        x = jnp.asarray(
            np.random.default_rng(11).uniform(0.02, 0.98, size=(16, 3)),
            jnp.float32,
        )
        ref_cfg = self._cfg(table_dtype="bfloat16")
        ref_params = {"embeddings": params["embeddings"].reshape(-1, 2)}
        a = np.asarray(hash_encode_01(ref_params, ref_cfg, x))
        b = np.asarray(hash_encode_01(with_table_cache(params, cfg), cfg, x))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)

        def tgrad(p, c):
            g = jax.grad(
                lambda e: jnp.sum(
                    hash_encode_01({**p, "embeddings": e}, c, x) ** 2
                )
            )(p["embeddings"])
            return np.asarray(g).reshape(-1, 2)

        np.testing.assert_allclose(
            tgrad(with_table_cache(params, cfg), cfg),
            tgrad(ref_params, ref_cfg),
            rtol=1e-6, atol=1e-7,
        )
