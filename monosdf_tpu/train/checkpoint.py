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


def restore_state(state, payload):
    """Rebuild a TrainState from a checkpoint payload, preserving the live
    state's pytree structure (so optax states restore correctly)."""
    import jax.numpy as jnp

    from .step import TrainState

    params = jax.tree_util.tree_map(
        lambda live, saved: jnp.asarray(saved), state.params, payload["params"]
    )
    opt_state = jax.tree_util.tree_map(
        lambda live, saved: jnp.asarray(saved), state.opt_state, payload["opt_state"]
    )
    return TrainState(params, opt_state, jnp.asarray(payload["step"], jnp.int32))
