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


def _is_partition_node(t):
    return hasattr(t, "_fields") and "inner_states" in getattr(t, "_fields", ())


def _lookup_path(tree, path):
    """Descend ``tree`` along a jax.tree_util key path. Handles DictKey /
    GetAttrKey (dicts, namedtuples) AND SequenceKey / FlattenedIndexKey
    (lists, tuples), so partition-state migration doesn't silently degrade
    to a fresh optimizer state for sequence-bearing params (ADVICE r3)."""
    node = tree
    for p in path:
        if isinstance(node, dict):
            k = getattr(p, "key", getattr(p, "name", None))
            if k in node:
                node = node[k]
            else:
                return None
        elif isinstance(node, (list, tuple)):
            i = getattr(p, "idx", None)
            if i is None:
                i = getattr(p, "key", None)
            if isinstance(i, int) and -len(node) <= i < len(node):
                node = node[i]
            else:
                name = getattr(p, "name", None)
                if name is not None and hasattr(node, name):
                    node = getattr(node, name)
                else:
                    return None
        else:
            name = getattr(p, "name", None)
            if name is not None and hasattr(node, name):
                node = getattr(node, name)
            else:
                return None
    return node


def _migrate_from_partition(live, saved, params):
    """Grid-mode multi_transform -> fused/per-leaf: stitch each param leaf's
    Adam moments from whichever group's masked tree owns it, then hand the
    single combined Adam state to the flat/per-leaf fillers."""
    import jax.numpy as jnp

    groups = {
        g: _find_adam_node(ms) for g, ms in saved.inner_states.items()
    }
    groups = {g: n for g, n in groups.items() if n is not None}
    if not groups:
        return None

    def stitch(which, path, leaf):
        for node in groups.values():
            v = _lookup_path(getattr(node, which), path)
            if v is not None and hasattr(v, "shape"):
                return jnp.asarray(v)
        return None

    mu_tree = jax.tree_util.tree_map_with_path(
        lambda p, leaf: stitch("mu", p, leaf), params
    )
    nu_tree = jax.tree_util.tree_map_with_path(
        lambda p, leaf: stitch("nu", p, leaf), params
    )
    if any(
        v is None
        for v in jax.tree_util.tree_leaves(mu_tree, is_leaf=lambda x: x is None)
    ):
        return None
    count = max(
        (int(np.asarray(n.count)) for n in groups.values()), default=0
    )

    class _Combined:  # duck-typed single-Adam payload for the fillers
        pass

    node = _Combined()
    node.count = count
    node.mu = mu_tree
    node.nu = nu_tree
    return node


def _migrate_to_partition(live, node, params):
    """Single-Adam (fused or per-leaf) -> grid-mode multi_transform: mask
    the combined moment trees per group and rebuild each group's state."""
    import jax.numpy as jnp
    import optax

    from .optim import _grid_label

    count = jnp.asarray(np.asarray(node.count), jnp.int32)
    mu_tree, nu_tree = node.mu, node.nu

    def mask(tree, label):
        return jax.tree_util.tree_map_with_path(
            lambda p, v: v if _grid_label(p) == label else optax.MaskedNode(),
            tree,
        )

    inner = {
        g: _fill_counts_and_moments(
            ms, count, mask(mu_tree, g), mask(nu_tree, g)
        )
        for g, ms in live.inner_states.items()
    }
    return type(live)(inner_states=inner)


def _as_param_trees(node, params):
    """Normalize a single-Adam node to (count, mu_tree, nu_tree) with the
    trees shaped like ``params`` (unraveling FlatAdamState's vectors).
    Returns None if shapes don't line up."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    mu = node.mu
    if hasattr(mu, "shape"):  # raveled flat vector (FlatAdamState)
        mu_arr, nu_arr = np.asarray(mu), np.asarray(node.nu)
        if mu_arr.ndim != 1:
            return None
        flat_params, unravel = ravel_pytree(params)
        n = flat_params.shape[0]
        if mu_arr.shape[0] > n:
            # round-5 fused layout zero-pads the moments to a 1024 multiple
            # (flat_adam PAD); the tail carries no information
            mu_arr, nu_arr = mu_arr[:n], nu_arr[:n]
        try:
            return (
                node.count,
                unravel(jnp.asarray(mu_arr)),
                unravel(jnp.asarray(nu_arr)),
            )
        except (TypeError, ValueError):
            return None
    if jax.tree_util.tree_structure(mu) != jax.tree_util.tree_structure(
        params
    ):
        return None
    return (
        node.count,
        jax.tree_util.tree_map(jnp.asarray, mu),
        jax.tree_util.tree_map(jnp.asarray, node.nu),
    )


def _migrate_opt_state(live, saved, params):
    """Convert a saved Adam state between ANY of the three flavors: fused
    (FlatAdamState, raveled moments), per-leaf (optax.adam), and grid-mode
    multi_transform (PartitionState with per-group masked Adams) — the
    reference restores optimizer state exactly on resume
    (monosdf_train.py:236-261), so a flavor switch must not silently drop
    moments. Returns None only if the saved payload carries no
    recognizable Adam moments; the caller then falls back to a fresh opt
    state (warning, or error under strict=True)."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from .optim import FlatAdamState

    if _is_partition_node(saved):
        node = _migrate_from_partition(live, saved, params)
    else:
        node = _find_adam_node(saved)
    if node is None:
        return None
    norm = _as_param_trees(node, params)
    if norm is None:
        return None
    count_raw, mu_tree, nu_tree = norm
    count = jnp.asarray(np.asarray(count_raw), jnp.int32)
    if _is_partition_node(live):
        try:
            node.count, node.mu, node.nu = count, mu_tree, nu_tree
        except AttributeError:  # namedtuple node: rebuild a mutable carrier
            node = type("_N", (), {})()
            node.count, node.mu, node.nu = count, mu_tree, nu_tree
        try:
            return _migrate_to_partition(live, node, params)
        except (TypeError, ValueError, KeyError):
            return None
    if isinstance(live, FlatAdamState):
        mu, _ = ravel_pytree(mu_tree)
        nu, _ = ravel_pytree(nu_tree)
        if mu.shape != live.mu.shape:
            if live.mu.shape[0] > mu.shape[0]:
                # live fused layout zero-pads to a 1024 multiple (flat_adam
                # PAD); a pre-round-5 flat checkpoint restores by padding
                pad = live.mu.shape[0] - mu.shape[0]
                mu = jnp.pad(mu, (0, pad))
                nu = jnp.pad(nu, (0, pad))
            else:
                return None
        return FlatAdamState(count, mu, nu)
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

    def _leaf(live, saved):
        a = jnp.asarray(saved)
        if a.shape != live.shape and a.size == live.size:
            # layout migration (e.g. (T, C) table checkpoints restored
            # into a param_flat run, or vice versa — same row-major data)
            a = a.reshape(live.shape)
        return a

    params = jax.tree_util.tree_map(_leaf, state.params, payload["params"])
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
