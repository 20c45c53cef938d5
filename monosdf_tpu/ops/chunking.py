"""Chunked inference over large pixel sets.

TPU-native replacement for the reference's split_input/merge_output
(code/utils/general.py:28-58): instead of a python list of dict chunks, we pad
the pixel axis to a multiple of the chunk size and `lax.map` a jitted render
over fixed-shape chunks, so only ONE program is compiled regardless of image
size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunked_apply(fn, n_total: int, chunk: int, *arrays):
    """Apply ``fn(*chunk_arrays) -> pytree`` over the leading axis of
    ``arrays`` in fixed-size chunks and concatenate results.

    Arrays are padded (edge-replicated) to a multiple of ``chunk``; outputs
    are truncated back to ``n_total`` rows.
    """
    n_chunks = -(-n_total // chunk)
    n_pad = n_chunks * chunk - n_total

    def pad(a):
        if n_pad == 0:
            return a
        pad_widths = [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_widths, mode="edge")

    stacked = [pad(a).reshape(n_chunks, chunk, *a.shape[1:]) for a in arrays]
    out = jax.lax.map(lambda xs: fn(*xs), tuple(stacked))
    return jax.tree_util.tree_map(
        lambda o: o.reshape(n_chunks * chunk, *o.shape[2:])[:n_total], out
    )
