"""Checkpointing: params/opt_state/step snapshots with keep-last-N GC.

Reference keeps three .pth families (Model/Optimizer/Scheduler Parameters),
each saved as <epoch>.pth + latest.pth, GC'd to the last 3
(monosdf_train.py:277-299 + tools/clean_funcs.py:11-29). Here one file holds
the whole training state (the LR schedule is a pure function of `step`, so no
separate scheduler state exists).
"""

from __future__ import annotations

import os
import pickle
import re

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, state, epoch: int, keep_last: int = 3):
    """Write <epoch>.ckpt and latest.ckpt; GC to keep_last numbered files."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": _to_numpy(state.params),
        "opt_state": _to_numpy(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        # optimizer flavor tag so a mismatched restore can explain itself
        "opt_flavor": type(state.opt_state).__name__,
    }
    for name in (f"{epoch}.ckpt", "latest.ckpt"):
        tmp = os.path.join(ckpt_dir, name + ".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, os.path.join(ckpt_dir, name))
    _gc(ckpt_dir, keep_last)


def _gc(ckpt_dir: str, keep_last: int):
    numbered = []
    for fn in os.listdir(ckpt_dir):
        m = re.fullmatch(r"(\d+)\.ckpt", fn)
        if m:
            numbered.append((int(m.group(1)), fn))
    for _, fn in sorted(numbered)[:-keep_last] if keep_last > 0 else []:
        os.remove(os.path.join(ckpt_dir, fn))


def load_checkpoint(ckpt_dir: str, name: str = "latest"):
    """Returns dict {params, opt_state, step, epoch} with numpy leaves."""
    path = os.path.join(ckpt_dir, f"{name}.ckpt")
    with open(path, "rb") as f:
        return pickle.load(f)


def _is_adam_node(t):
    return hasattr(t, "_fields") and {"count", "mu", "nu"} <= set(t._fields)


def _find_adam_node(tree):
    """First namedtuple carrying (count, mu, nu) — covers both FlatAdamState
    and optax ScaleByAdamState."""
    if _is_adam_node(tree):
        return tree
    children = (
        tree.values() if isinstance(tree, dict)
        else tree if isinstance(tree, (tuple, list)) else ()
    )
    for c in children:
        r = _find_adam_node(c)
        if r is not None:
            return r
    return None


def _fill_counts_and_moments(live, count, mu_tree, nu_tree):
    """Rebuild the live opt-state structure with every `count` field set and
    the Adam node's moments replaced."""
    if _is_adam_node(live):
        return live._replace(count=count, mu=mu_tree, nu=nu_tree)
    if hasattr(live, "_fields"):
        vals = {
            f: (count if f == "count"
                else _fill_counts_and_moments(getattr(live, f), count, mu_tree, nu_tree))
            for f in live._fields
        }
        return type(live)(**vals)
    if isinstance(live, tuple):
        return tuple(_fill_counts_and_moments(t, count, mu_tree, nu_tree) for t in live)
    if isinstance(live, list):
        return [_fill_counts_and_moments(t, count, mu_tree, nu_tree) for t in live]
    if isinstance(live, dict):
        return {k: _fill_counts_and_moments(v, count, mu_tree, nu_tree)
                for k, v in live.items()}
    return live


def _migrate_opt_state(live, saved, params):
    """Convert a saved Adam state between the fused (FlatAdamState, raveled
    moments) and per-leaf (optax.adam) flavors. Returns None if the saved
    payload is not a recognizable single-Adam state (e.g. grid-mode
    multi_transform) — the caller then falls back to a fresh opt state."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from .optim import FlatAdamState

    node = _find_adam_node(saved)
    if node is None:
        return None
    count = jnp.asarray(np.asarray(node.count), jnp.int32)
    if isinstance(live, FlatAdamState):
        # per-leaf -> fused: ravel the moment pytrees (same structure/order
        # as params, so ravel_pytree ordering matches flat_adam's)
        mu, _ = ravel_pytree(jax.tree_util.tree_map(jnp.asarray, node.mu))
        nu, _ = ravel_pytree(jax.tree_util.tree_map(jnp.asarray, node.nu))
        if mu.shape != live.mu.shape:
            return None
        return FlatAdamState(count, mu, nu)
    # fused -> per-leaf: unravel the flat moments into the params structure
    mu_flat = np.asarray(node.mu)
    if mu_flat.ndim != 1:
        return None
    _, unravel = ravel_pytree(params)
    try:
        mu_tree = unravel(jnp.asarray(mu_flat))
        nu_tree = unravel(jnp.asarray(np.asarray(node.nu)))
    except (TypeError, ValueError):
        return None
    return _fill_counts_and_moments(live, count, mu_tree, nu_tree)


def restore_state(state, payload, strict: bool = False):
    """Rebuild a TrainState from a checkpoint payload, preserving the live
    state's pytree structure (so optax states restore correctly).

    If the saved opt_state's structure differs from the live one (e.g. a
    checkpoint written with the other `OptimConfig.fused` flavor), the Adam
    moments are migrated between the flat and per-leaf layouts; if that is
    impossible, the live (freshly initialized) opt state is kept with a
    warning (or an error under strict=True)."""
    import warnings

    import jax.numpy as jnp

    from .step import TrainState

    params = jax.tree_util.tree_map(
        lambda live, saved: jnp.asarray(saved), state.params, payload["params"]
    )
    saved_opt = payload["opt_state"]
    live_def = jax.tree_util.tree_structure(state.opt_state)
    saved_def = jax.tree_util.tree_structure(saved_opt)
    if live_def == saved_def:
        opt_state = jax.tree_util.tree_map(
            lambda live, saved: jnp.asarray(saved), state.opt_state, saved_opt
        )
    else:
        opt_state = _migrate_opt_state(state.opt_state, saved_opt, params)
        if opt_state is None:
            msg = (
                "checkpoint opt_state structure does not match the live "
                "optimizer and cannot be migrated; optimizer moments reset "
                f"(saved flavor: {payload.get('opt_flavor', 'unknown')})"
            )
            if strict:
                raise ValueError(msg)
            warnings.warn(msg)
            opt_state = state.opt_state
    return TrainState(params, opt_state, jnp.asarray(payload["step"], jnp.int32))
