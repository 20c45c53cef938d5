"""Optimizer: Adam with per-group learning rates + per-iteration exponential
decay.

Reference: code/training/monosdf_train.py:210-226 — grid-mode uses three param
groups {encoding: lr*lr_factor_for_grid, net: lr, density: lr} with
betas=(0.9, 0.99), eps=1e-15; MLP-mode uses plain Adam defaults
(betas=(0.9, 0.999), eps=1e-8). The scheduler multiplies lr by
``decay_rate ** (1/decay_steps)`` every iteration.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 5.0e-4
    lr_factor_for_grid: float = 20.0
    sched_decay_rate: float = 0.25
    decay_steps: int = 150_000
    grid_mode: bool = False  # reference Grid_MLP flag
    # Run the Adam update on ONE raveled parameter vector instead of
    # per-leaf ops (numerically identical elementwise math; ~350 tiny XLA
    # ops collapse into a handful of vector ops — measured ~0.5 ms/step at
    # the ScanNet MLP budget). In grid mode the x20 encoding lr rides a
    # per-leaf scale vector in raveled space (same updates as the per-group
    # multi_transform path, which remains available via fused=False).
    fused: bool = True


class FlatAdamState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    mu: jnp.ndarray  # (n,) first moment, raveled
    nu: jnp.ndarray  # (n,) second moment, raveled


def flat_adam(schedule, b1: float, b2: float, eps: float, lr_scale_fn=None):
    """optax.adam with moments stored as ONE raveled vector.

    Elementwise math mirrors optax.scale_by_adam + scale_by_learning_rate
    exactly (same bias-correction formulas, eps outside the sqrt), so the
    produced updates are bitwise identical to optax.adam's per-leaf path —
    but the XLA program is ~10 vector ops instead of ~7 ops x n_leaves.
    Requires all leaves share one dtype (true for every monosdf param set).

    lr_scale_fn: optional ``path -> float`` per-leaf lr multiplier — the
    raveled-space equivalent of optax.multi_transform param groups
    (reference monosdf_train.py:210-221 grid-mode lr x20).
    Besides collapsing the op count, the single raveled update avoids the
    per-leaf layout churn XLA inserts around the (6.1M, 2) hash table
    (measured ~25 ms/step of copies on a v5e in grid mode).
    """

    # The moments and the update math live on a zero-PADDED vector whose
    # length is a multiple of 1024, viewed as an explicit (n/1024, 1024)
    # 2-D array: with the raw length (12,488,577 = 3 x 4,162,859 at the
    # flagship grids config) XLA's only 2-D factorization of the raveled
    # elementwise chain is (N, 3) — a 3-of-128-lane layout that measured
    # 6.3 ms/step of reshape/copy on a v5e (round-5 profile). The padded
    # tail stays exactly zero through every Adam step, so updates are
    # bitwise identical to the unpadded form.
    PAD = 1024

    def _padded(v):
        p = (-v.shape[0]) % PAD
        return jnp.pad(v, (0, p)) if p else v

    def init(params):
        dtypes = {l.dtype for l in jax.tree_util.tree_leaves(params)}
        assert len(dtypes) == 1, (
            f"flat_adam requires a single param dtype (ravel_pytree would "
            f"silently promote mixed dtypes and corrupt the moments); got "
            f"{sorted(str(d) for d in dtypes)} — use fused=False"
        )
        flat, _ = ravel_pytree(params)
        padded = _padded(flat)
        # two DISTINCT zero buffers: aliasing mu and nu to one array breaks
        # buffer donation ("attempt to donate the same buffer twice")
        return FlatAdamState(
            jnp.zeros([], jnp.int32),
            jnp.zeros_like(padded),
            jnp.zeros_like(padded),
        )

    def update(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        n = g.shape[0]
        g2 = _padded(g).reshape(-1, PAD)
        count_inc = state.count + 1
        mu2 = b1 * state.mu.reshape(-1, PAD) + (1.0 - b1) * g2
        nu2 = b2 * state.nu.reshape(-1, PAD) + (1.0 - b2) * (g2 * g2)
        cf = count_inc.astype(g.dtype)
        mu_hat = mu2 / (1.0 - b1**cf)
        nu_hat = nu2 / (1.0 - b2**cf)
        lr = schedule(state.count)
        upd2 = (-lr) * (mu_hat / (jnp.sqrt(nu_hat) + eps))
        if lr_scale_fn is not None:
            scale, _ = ravel_pytree(
                jax.tree_util.tree_map_with_path(
                    lambda path, gl: jnp.full(gl.shape, lr_scale_fn(path), gl.dtype),
                    grads,
                )
            )
            upd2 = upd2 * _padded(scale).reshape(-1, PAD)
        upd = upd2.reshape(-1)[:n]
        return unravel(upd), FlatAdamState(
            count_inc, mu2.reshape(-1), nu2.reshape(-1)
        )

    return optax.GradientTransformation(init, update)


def _schedule(cfg: OptimConfig, factor: float = 1.0):
    gamma = cfg.sched_decay_rate ** (1.0 / cfg.decay_steps)
    return optax.exponential_decay(
        init_value=cfg.learning_rate * factor,
        transition_steps=1,
        decay_rate=gamma,
    )


def _grid_label(path) -> str:
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    if "encoding" in names:
        return "encoding"
    if names and names[0] == "density":
        return "density"
    return "net"


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    if not cfg.grid_mode:
        # torch.optim.Adam defaults (reference monosdf_train.py:221)
        if cfg.fused:
            return flat_adam(_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8)
        return optax.adam(_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8)

    if cfg.fused:
        # grid-mode betas/eps (reference monosdf_train.py:210-221); the x20
        # encoding lr rides a per-leaf scale vector in raveled space —
        # identical updates to multi_transform, none of the per-leaf layout
        # copies XLA wraps around the (6.1M, 2) table
        return flat_adam(
            _schedule(cfg), b1=0.9, b2=0.99, eps=1e-15,
            lr_scale_fn=lambda path: (
                cfg.lr_factor_for_grid if _grid_label(path) == "encoding" else 1.0
            ),
        )

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _grid_label(path), params
        )

    adam = lambda factor: optax.adam(
        _schedule(cfg, factor), b1=0.9, b2=0.99, eps=1e-15
    )
    return optax.multi_transform(
        {
            "encoding": adam(cfg.lr_factor_for_grid),
            "net": adam(1.0),
            "density": adam(1.0),
        },
        label_fn,
    )
