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

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 5.0e-4
    lr_factor_for_grid: float = 20.0
    sched_decay_rate: float = 0.25
    decay_steps: int = 150_000
    grid_mode: bool = False  # reference Grid_MLP flag


def _schedule(cfg: OptimConfig, factor: float = 1.0):
    gamma = cfg.sched_decay_rate ** (1.0 / cfg.decay_steps)
    return optax.exponential_decay(
        init_value=cfg.learning_rate * factor,
        transition_steps=1,
        decay_rate=gamma,
    )


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    if not cfg.grid_mode:
        # torch.optim.Adam defaults (reference monosdf_train.py:221)
        return optax.adam(_schedule(cfg), b1=0.9, b2=0.999, eps=1e-8)

    def label_fn(params):
        def label_path(path):
            names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
            if "encoding" in names:
                return "encoding"
            if names and names[0] == "density":
                return "density"
            return "net"

        return jax.tree_util.tree_map_with_path(
            lambda path, _: label_path(path), params
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
