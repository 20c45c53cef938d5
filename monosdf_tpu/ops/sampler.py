"""Ray samplers: uniform + VolSDF error-bounded sampler (Algorithm 1).

Reference: code/model/ray_sampler.py (UniformSampler:16-83,
ErrorBoundSampler:86-271). Re-cast for XLA:

* The reference runs a data-dependent python ``while`` loop (≤ max_total_iters)
  with a *global* convergence test ``beta.max() > beta0``. Here the loop is
  statically unrolled for ``max_total_iters`` rounds, so every shape is static
  and one XLA program serves every step. Early global convergence in the
  reference only saves compute; the final sample set is drawn from the same
  weights CDF either way (when converged, the error-bound PDF degenerates to
  ~uniform and the extra rounds are harmless refinement).
* SDF evaluation happens only on the 128 new samples per round and is merged
  with cached values by a sort-gather, exactly like the reference's
  ``torch.gather(sdf_merge, samples_idx)`` (ray_sampler.py:129-137).
* All sampler outputs are ``stop_gradient``-ed: the reference evaluates the
  sampler's SDF sweeps under ``torch.no_grad()`` (ray_sampler.py:130).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .density import laplace_density
from .geometry import get_sphere_intersections, near_far_from_cube


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    scene_bounding_sphere: float = 1.1
    near: float = 0.0
    far: float = -1.0  # -1 -> 2 * R * 1.75 (reference ray_sampler.py:19,91)
    N_samples: int = 64
    N_samples_eval: int = 128
    N_samples_extra: int = 32
    eps: float = 0.1
    beta_iters: int = 10
    max_total_iters: int = 5
    add_tiny: float = 1.0e-6
    # How the uniform init finds `far`: 'cube' (replica/scannet/tnt),
    # 'sphere' (dtu/bmvs w/ take_sphere_intersection), or 'none' (constant far).
    intersection: str = "cube"
    # Sorted-merge implementation for the cached-SDF upsampling loop
    # (all three are exact — tests assert bitwise-equal outputs):
    # 'sort' = lax.sort of the concatenation (full bitonic sort);
    # 'bitonic' = bitonic MERGE network (log2 K compare-exchange stages —
    # exploits that both inputs are already sorted; measured on v5e it wins
    # only at unpadded power-of-two widths >= 512, where relayout cost
    # doesn't swamp the log-factor saving: 0.65 vs 0.94 ms at 384+128);
    # 'onehot' = rank computation + one-hot matmul (MXU, but materializes
    # (R, N, K) one-hots; measured slower at production shapes);
    # 'auto' = per-shape choice of the measured winner.
    merge_impl: str = "auto"
    # NeRF++-style inverse-sphere background (reference ray_sampler.py:88,
    # 105-108, 236-239, 257-260). When set, the extra-sample `far` is the
    # scene sphere's EXIT intersection, and `inverse_sphere_bg_z_vals` below
    # supplies the background samples. No shipped reference conf enables
    # this (it is carried, unused, from VolSDF); kept for capability parity.
    inverse_sphere_bg: bool = False
    N_samples_inverse_sphere: int = 0
    # 'jnp' | 'pallas': backend for the per-iteration beta-bisection /
    # error-bound / pdf machinery. 'pallas' fuses the 11 error-bound
    # evaluations + density/transmittance/pdf into ONE kernel per
    # iteration (ops/pallas_sampler.py) with cumsums as triangular MXU
    # matmuls at the machinery_dtype; outputs steer sample placement only
    # (stop-gradient'ed, same deviation class as the bf16 sweeps). 'jnp'
    # remains the torch-parity oracle. (A 'pallas_fused' variant that also
    # absorbed the sort-merge + inverse-CDF draw measured 22.8 vs 21.6
    # ms/step — its kernel cost exceeded the glue it absorbed; removed in
    # round 4, record in PERFORMANCE.md.)
    machinery: str = "jnp"
    machinery_dtype: str = "bfloat16"

    def __post_init__(self):
        # fail loudly on removed/unknown variants (e.g. a stale conf still
        # saying 'pallas_fused') instead of silently running the jnp path
        if self.machinery not in ("jnp", "pallas"):
            raise ValueError(
                f"unknown sampler machinery {self.machinery!r}; valid: "
                "'jnp', 'pallas' ('pallas_fused' was measured-rejected and "
                "removed in round 4 — see PERFORMANCE.md)"
            )
        if self.merge_impl not in ("auto", "sort", "bitonic", "onehot"):
            raise ValueError(f"unknown merge_impl {self.merge_impl!r}")

    @property
    def far_value(self) -> float:
        return 2.0 * self.scene_bounding_sphere * 1.75 if self.far < 0 else self.far

    @property
    def total_samples(self) -> int:
        """Final per-ray sample count: N_samples + N_samples_extra + near + far."""
        return self.N_samples + self.N_samples_extra + 2


def uniform_z_vals(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: SamplerConfig,
    n_samples: int,
    key: jax.Array | None,
    training: bool,
):
    """Uniform samples in [near, far] with optional stratified jitter
    (reference ray_sampler.py:25-83). Returns (z_vals, near, far)."""
    R = rays_o.shape[0]
    near = jnp.full((R, 1), cfg.near, dtype=rays_o.dtype)
    if cfg.intersection == "cube":
        _, far = near_far_from_cube(
            rays_o, rays_d, bound=cfg.scene_bounding_sphere,
            min_near=cfg.near, max_far=cfg.far_value,
        )
    elif cfg.intersection == "sphere":
        far = get_sphere_intersections(rays_o, rays_d, r=cfg.scene_bounding_sphere)[:, 1:]
    else:
        far = jnp.full((R, 1), cfg.far_value, dtype=rays_o.dtype)

    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=rays_o.dtype)
    z_vals = near * (1.0 - t_vals) + far * t_vals

    if training:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals, near, far


def _searchsorted_right(sorted_arr: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Batched searchsorted(side='right') as a comparison-count: TPU-friendly
    (the vmap'd binary-search lowering is ~6x slower on TPU for these sizes).
    sorted_arr (R,N), values (R,M) -> int32 (R,M)."""
    return jnp.sum(
        sorted_arr[:, None, :] <= values[:, :, None], axis=-1
    ).astype(jnp.int32)


def _merge_sorted_sort(z_old, s_old, z_new, s_new):
    """Sorted merge via one lax.sort with the SDF cache as payload
    (the direct analog of the reference's torch.sort + gather,
    ray_sampler.py:232-233 + :133-135)."""
    z = jnp.concatenate([z_old, z_new], axis=-1)
    s = jnp.concatenate([s_old, s_new], axis=-1)
    return jax.lax.sort((z, s), num_keys=1)


def _merge_sorted(z_old, s_old, z_new, s_new):
    """Merge two per-ray SORTED (z, payload) pairs into sorted output.

    Replaces the reference's torch.sort + gather merge
    (ray_sampler.py:133-135, 232-233). Both inputs are sorted by
    construction (stratified uniform init is ordered; linspace-u inverse-CDF
    draws are monotone), so output positions are exact rank computations and
    placement is a one-hot matmul — MXU work instead of an O(n log^2 n)
    bitonic sort (~3x faster at (1024, 640) on v5e).
    """
    R, N = z_old.shape
    M = z_new.shape[1]
    K = N + M
    cnt_new_lt_old = jnp.sum(z_new[:, None, :] < z_old[:, :, None], axis=-1)
    cnt_old_le_new = jnp.sum(z_old[:, None, :] <= z_new[:, :, None], axis=-1)
    rank_old = jnp.arange(N, dtype=jnp.int32)[None] + cnt_new_lt_old.astype(jnp.int32)
    rank_new = jnp.arange(M, dtype=jnp.int32)[None] + cnt_old_le_new.astype(jnp.int32)
    oh_old = jax.nn.one_hot(rank_old, K, dtype=z_old.dtype)  # (R,N,K)
    oh_new = jax.nn.one_hot(rank_new, K, dtype=z_old.dtype)  # (R,M,K)
    z = jnp.einsum("rn,rnk->rk", z_old, oh_old) + jnp.einsum("rm,rmk->rk", z_new, oh_new)
    s = jnp.einsum("rn,rnk->rk", s_old, oh_old) + jnp.einsum("rm,rmk->rk", s_new, oh_new)
    return z, s


def _merge_sorted_bitonic(z_old, s_old, z_new, s_new):
    """Sorted merge via a bitonic MERGE network (not a full sort).

    Both inputs are sorted per ray, so [z_old asc, +inf pad, reverse(z_new)]
    is a bitonic sequence and log2(K) compare-exchange stages suffice —
    O(K log K) work vs lax.sort's O(K log^2 K) bitonic sort. Payload (the
    SDF cache) swaps with its key. Pads sort to the tail and are sliced off.
    """
    R, N = z_old.shape
    M = z_new.shape[1]
    K = N + M
    Kp = 1 << (K - 1).bit_length()
    pad = Kp - K
    if pad:
        z = jnp.concatenate(
            [z_old, jnp.full((R, pad), jnp.inf, z_old.dtype), z_new[:, ::-1]],
            axis=-1,
        )
        s = jnp.concatenate(
            [s_old, jnp.zeros((R, pad), s_old.dtype), s_new[:, ::-1]], axis=-1
        )
    else:
        z = jnp.concatenate([z_old, z_new[:, ::-1]], axis=-1)
        s = jnp.concatenate([s_old, s_new[:, ::-1]], axis=-1)

    d = Kp // 2
    while d >= 1:
        z4 = z.reshape(R, Kp // (2 * d), 2, d)
        s4 = s.reshape(R, Kp // (2 * d), 2, d)
        zlo, zhi = z4[:, :, 0], z4[:, :, 1]
        slo, shi = s4[:, :, 0], s4[:, :, 1]
        swap = zlo > zhi
        z = jnp.stack(
            [jnp.where(swap, zhi, zlo), jnp.where(swap, zlo, zhi)], axis=2
        ).reshape(R, Kp)
        s = jnp.stack(
            [jnp.where(swap, shi, slo), jnp.where(swap, slo, shi)], axis=2
        ).reshape(R, Kp)
        d //= 2
    return z[:, :K], s[:, :K]


def _onehot_gather2(a: jnp.ndarray, b: jnp.ndarray, idx: jnp.ndarray):
    """Batched gather of two row-aligned arrays via a one-hot matmul.

    a, b (R,N); idx (R,M) int32 in [0,N) -> (a[r, idx], b[r, idx]).
    TPU's native batched gather lowering is HBM-latency bound (~10x slower
    than this at the sampler's shapes); a 0/1 one-hot contraction on the MXU
    with HIGHEST precision is BITWISE identical to the gather (every product
    is value*1.0 or value*0.0, summation adds exact zeros)."""
    N = a.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    onehot = (idx[:, :, None] == iota).astype(a.dtype)  # (R,M,N)
    stacked = jnp.stack([a, b], axis=-1)  # (R,N,2)
    g = jnp.einsum(
        "rmn,rnc->rmc", onehot, stacked, precision=jax.lax.Precision.HIGHEST
    )
    return g[..., 0], g[..., 1]


def _sample_pdf(bins: jnp.ndarray, pdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF sampling (reference ray_sampler.py:191-228).

    bins (R,N) sorted, pdf (R,N-1) unnormalized, u (R,M) in [0,1].

    The reference does searchsorted + two gathers. Here the interval
    containing each u is located DIRECTLY as a 0/1 membership mask
    ``cdf[n] <= u < cdf[n+1]`` (+inf-padded tail, so u >= cdf[-1] lands on
    the last interval exactly like the reference's index clamps), and one
    MXU contraction of that mask against the 4-channel payload
    [cdf_below, bins_below, cdf_above, bins_above] produces all four gathered
    values. Bitwise identical to searchsorted+gather (the mask is exactly
    one-hot; products are value*1.0/value*0.0 at HIGHEST precision) while
    touching the (R,M,N) intermediate once instead of three times."""
    pdf = pdf / jnp.sum(pdf, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R,N)

    # cdf[0] = 0 <= u always, so searchsorted_right's below = inds-1 is the
    # unique n with cdf[n] <= u AND cdf[n+1] > u (ties collapse correctly:
    # equal consecutive cdf entries fail the right test except at the run's
    # end). above = min(below+1, N-1) is folded into the shifted payload.
    cdf_next = jnp.concatenate(
        [cdf[:, 1:], jnp.full_like(cdf[:, :1], jnp.inf)], axis=-1
    )
    uu = u[:, :, None]
    onehot = (
        (cdf[:, None, :] <= uu) & (cdf_next[:, None, :] > uu)
    ).astype(bins.dtype)  # (R,M,N), exactly one-hot per (r,m)
    cdf_above = jnp.concatenate([cdf[:, 1:], cdf[:, -1:]], axis=-1)
    bins_above = jnp.concatenate([bins[:, 1:], bins[:, -1:]], axis=-1)
    # payload channels on axis 1 so N stays the 128-lane axis of every
    # operand (an (R,N,4) stack forces a T(4,128) relayout, ~0.4 ms/step)
    payload = jnp.stack([cdf, bins, cdf_above, bins_above], axis=1)  # (R,4,N)
    g = jnp.einsum(
        "rmn,rcn->rmc", onehot, payload, precision=jax.lax.Precision.HIGHEST
    )
    cdf_g0, bins_g0, cdf_g1, bins_g1 = g[..., 0], g[..., 1], g[..., 2], g[..., 3]

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def _d_star(z_vals: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Per-interval distance lower bound d* (VolSDF Theorem 1; reference
    ray_sampler.py:140-153). z_vals (R,N), d = sdf at z (R,N) -> (R,N-1)."""
    a = z_vals[:, 1:] - z_vals[:, :-1]
    b = jnp.abs(d[:, :-1])
    c = jnp.abs(d[:, 1:])
    first_cond = a**2 + b**2 <= c**2
    second_cond = a**2 + c**2 <= b**2
    s = (a + b + c) / 2.0
    area_sq = jnp.maximum(s * (s - a) * (s - b) * (s - c), 0.0)
    heron_ok = b + c - a > 0
    heron = jnp.where(heron_ok, 2.0 * jnp.sqrt(area_sq) / jnp.maximum(a, 1e-12), 0.0)
    d_star = jnp.where(first_cond, b, jnp.where(second_cond, c, heron))
    # Fixing the sign: d* only counts when both endpoint SDFs share a sign.
    same_sign = jnp.sign(d[:, 1:]) * jnp.sign(d[:, :-1]) == 1
    return jnp.where(same_sign, d_star, 0.0)


def _error_bound(beta, sdf, z_vals, dists, d_star):
    """Max per-ray opacity error bound (reference ray_sampler.py:264-271).
    beta: scalar or (R,1); sdf (R,N); z_vals (R,N); dists (R,N-1); d_star (R,N-1)."""
    density = laplace_density(sdf, beta)
    shifted = jnp.concatenate(
        [jnp.zeros_like(density[:, :1]), dists * density[:, :-1]], axis=-1
    )
    integral_estimation = jnp.cumsum(shifted, axis=-1)
    error_per_section = jnp.exp(-d_star / beta) * dists**2 / (4.0 * beta**2)
    error_integral = jnp.cumsum(error_per_section, axis=-1)
    bound_opacity = (
        jnp.clip(jnp.exp(error_integral), max=1.0e6) - 1.0
    ) * jnp.exp(-integral_estimation[:, :-1])
    return jnp.max(bound_opacity, axis=-1)


def _final_tail(
    z_vals, samples, rays_o, rays_d, cfg: SamplerConfig, k_extra, k_eik,
    training: bool,
):
    """Shared post-loop tail: near/far + N_samples_extra draw from the
    merged buffer, final sort, and the per-ray eikonal z pick (reference
    ray_sampler.py:236-255). Used by both the fused and per-iteration
    machinery paths so the two cannot drift."""
    R = rays_o.shape[0]
    dtype = rays_o.dtype
    near = jnp.full((R, 1), cfg.near, dtype=dtype)
    if cfg.inverse_sphere_bg:
        # foreground ends where the ray EXITS the scene sphere
        # (reference ray_sampler.py:238-239).
        far = get_sphere_intersections(
            rays_o, rays_d, r=cfg.scene_bounding_sphere
        )[:, 1:].astype(dtype)
    else:
        far = jnp.full((R, 1), cfg.far_value, dtype=dtype)
    if cfg.N_samples_extra > 0:
        n_buf = z_vals.shape[1]
        if training:
            idx = jax.random.permutation(k_extra, n_buf)[: cfg.N_samples_extra]
        else:
            idx = jnp.linspace(0, n_buf - 1, cfg.N_samples_extra).astype(
                jnp.int32
            )
        z_vals_extra = jnp.concatenate([near, far, z_vals[:, idx]], axis=-1)
    else:
        z_vals_extra = jnp.concatenate([near, far], axis=-1)

    z_final = jnp.sort(
        jnp.concatenate([samples, z_vals_extra], axis=-1), axis=-1
    )

    # One random existing sample per ray for the eikonal near-surface points
    # (reference ray_sampler.py:253-255).
    eik_idx = jax.random.randint(k_eik, (R, 1), 0, z_final.shape[-1])
    z_eik, _ = _onehot_gather2(z_final, z_final, eik_idx)
    return jax.lax.stop_gradient(z_final), jax.lax.stop_gradient(z_eik)


def error_bound_z_vals(
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    beta0: jnp.ndarray,
    cfg: SamplerConfig,
    key: jax.Array,
    training: bool,
):
    """VolSDF error-bounded sampling.

    sdf_fn: (..., 3) -> (...) SDF evaluation (no gradients needed).
    rays_o, rays_d: (R, 3). beta0: scalar current Laplace beta (detached).
    Returns (z_vals (R, N_samples+N_extra+2) sorted, z_eik (R, 1)).
    All outputs carry stop_gradient.
    """
    k_init, k_final, k_extra, k_eik = jax.random.split(key, 4)
    R = rays_o.shape[0]
    dtype = rays_o.dtype
    beta0 = jnp.asarray(beta0, dtype=dtype)

    def eval_sdf(z):
        pts = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
        return jax.lax.stop_gradient(sdf_fn(pts))

    # --- uniform init (N_samples_eval) -------------------------------------
    z_vals, _, _ = uniform_z_vals(rays_o, rays_d, cfg, cfg.N_samples_eval, k_init, training)
    sdf = eval_sdf(z_vals)

    # Beta upper bound from Lemma 2 (reference ray_sampler.py:117-120).
    dists0 = z_vals[:, 1:] - z_vals[:, :-1]
    bound = (1.0 / (4.0 * jnp.log(jnp.asarray(cfg.eps + 1.0, dtype)))) * jnp.sum(
        dists0**2, axis=-1
    )
    beta = jnp.sqrt(bound)  # (R,)

    samples = z_vals  # final-draw carrier (matches reference variable role)

    # --- Algorithm 1, statically unrolled -----------------------------------
    use_pallas_machinery = cfg.machinery == "pallas"
    for it in range(cfg.max_total_iters):
        last = it == cfg.max_total_iters - 1
        if use_pallas_machinery:
            from .pallas_sampler import sampler_iter_machinery_nograd

            dists = z_vals[:, 1:] - z_vals[:, :-1]
            dists_tail = jnp.concatenate(
                [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1
            )
            d_star_t = jnp.pad(_d_star(z_vals, sdf), ((0, 0), (0, 1)))
            beta_col, pdf_full = sampler_iter_machinery_nograd(
                sdf, dists_tail, d_star_t, beta[:, None], beta0,
                eps=cfg.eps, add_tiny=cfg.add_tiny, last=last,
                beta_iters=cfg.beta_iters, dtype=jnp.dtype(cfg.machinery_dtype),
            )
            beta = beta_col[:, 0]
            pdf = pdf_full[:, :-1]
            if not last:
                u = jnp.tile(
                    jnp.linspace(0.0, 1.0, cfg.N_samples_eval, dtype=dtype)[None],
                    (R, 1),
                )
                new_z = _sample_pdf(z_vals, pdf, u)
                new_sdf = eval_sdf(new_z)
                impl = cfg.merge_impl
                if impl == "auto":
                    k_tot = z_vals.shape[1] + new_z.shape[1]
                    pow2 = (k_tot & (k_tot - 1)) == 0
                    impl = "bitonic" if (pow2 and k_tot >= 512) else "sort"
                merge = {
                    "sort": _merge_sorted_sort,
                    "bitonic": _merge_sorted_bitonic,
                    "onehot": _merge_sorted,
                }[impl]
                z_vals, sdf = merge(z_vals, sdf, new_z, new_sdf)
            else:
                if training:
                    u = jax.random.uniform(
                        k_final, (R, cfg.N_samples), dtype=dtype
                    )
                else:
                    u = jnp.tile(
                        jnp.linspace(0.0, 1.0, cfg.N_samples, dtype=dtype)[None],
                        (R, 1),
                    )
                samples = _sample_pdf(z_vals, pdf, u)
            continue

        dists = z_vals[:, 1:] - z_vals[:, :-1]
        d_star = _d_star(z_vals, sdf)

        # Line-search beta by bisection against the error bound eps
        # (reference ray_sampler.py:156-165).
        curr_error = _error_bound(beta0, sdf, z_vals, dists, d_star)
        beta = jnp.where(curr_error <= cfg.eps, beta0, beta)
        beta_min = jnp.full_like(beta, beta0)
        beta_max = beta
        for _ in range(cfg.beta_iters):
            beta_mid = 0.5 * (beta_min + beta_max)
            mid_error = _error_bound(beta_mid[:, None], sdf, z_vals, dists, d_star)
            ok = mid_error <= cfg.eps
            beta_max = jnp.where(ok, beta_mid, beta_max)
            beta_min = jnp.where(ok, beta_min, beta_mid)
        beta = beta_max

        # Opacity with the per-ray beta (reference ray_sampler.py:168-175).
        density = laplace_density(sdf, beta[:, None])
        dists_tail = jnp.concatenate([dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1)
        free_energy = dists_tail * density
        shifted = jnp.concatenate(
            [jnp.zeros_like(free_energy[:, :1]), free_energy[:, :-1]], axis=-1
        )
        alpha = 1.0 - jnp.exp(-free_energy)
        transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
        weights = alpha * transmittance

        if not last:
            # Upsample N_samples_eval more points proportional to the error
            # bound (reference ray_sampler.py:181-194) with u = linspace.
            error_per_section = (
                jnp.exp(-d_star / beta[:, None]) * dists**2 / (4.0 * beta[:, None] ** 2)
            )
            error_integral = jnp.cumsum(error_per_section, axis=-1)
            bound_opacity = (
                jnp.clip(jnp.exp(error_integral), max=1.0e6) - 1.0
            ) * transmittance[:, :-1]
            pdf = bound_opacity + cfg.add_tiny
            u = jnp.tile(
                jnp.linspace(0.0, 1.0, cfg.N_samples_eval, dtype=dtype)[None], (R, 1)
            )
            # linspace u is increasing and CDF inversion is monotone, so
            # new_z comes out sorted per ray.
            new_z = _sample_pdf(z_vals, pdf, u)
            new_sdf = eval_sdf(new_z)
            # Merge cached SDF with the new samples (replaces the
            # reference's sort+gather, ray_sampler.py:133-135, 232-233).
            impl = cfg.merge_impl
            if impl == "auto":
                k_tot = z_vals.shape[1] + new_z.shape[1]
                pow2 = (k_tot & (k_tot - 1)) == 0
                impl = "bitonic" if (pow2 and k_tot >= 512) else "sort"
            merge = {
                "sort": _merge_sorted_sort,
                "bitonic": _merge_sorted_bitonic,
                "onehot": _merge_sorted,
            }[impl]
            z_vals, sdf = merge(z_vals, sdf, new_z, new_sdf)
        else:
            # Final draw from the rendering weights CDF
            # (reference ray_sampler.py:196-228).
            pdf = weights[..., :-1] + 1e-5
            if training:
                u = jax.random.uniform(k_final, (R, cfg.N_samples), dtype=dtype)
            else:
                u = jnp.tile(
                    jnp.linspace(0.0, 1.0, cfg.N_samples, dtype=dtype)[None], (R, 1)
                )
            samples = _sample_pdf(z_vals, pdf, u)

    # --- extra samples + near/far (reference ray_sampler.py:236-251) --------
    return _final_tail(
        z_vals, samples, rays_o, rays_d, cfg, k_extra, k_eik, training
    )


def inverse_sphere_bg_z_vals(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: SamplerConfig,
    key: jax.Array | None,
    training: bool,
):
    """NeRF++ background samples in inverted-sphere space (reference
    ray_sampler.py:106-108, 257-260): uniform on [0, 1] (the 1/r parameter of
    the outer volume), scaled by 1/scene_bounding_sphere. Returns (R, N_bg).
    """
    R = rays_o.shape[0]
    dtype = rays_o.dtype
    t = jnp.linspace(0.0, 1.0, cfg.N_samples_inverse_sphere, dtype=dtype)
    z = jnp.tile(t[None], (R, 1))
    if training:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, z.shape, dtype=dtype)
        z = lower + (upper - lower) * u
    return jax.lax.stop_gradient(z * (1.0 / cfg.scene_bounding_sphere))
