"""NeRF-style sin/cos positional encoding.

Semantics match the reference embedder (reference: code/model/embedder.py:10-50):
output layout is ``[x, sin(x*2^0), cos(x*2^0), sin(x*2^1), cos(x*2^1), ...]``
with log-spaced frequencies ``2^0 .. 2^(multires-1)`` and the raw input
included first. Each sin/cos block spans all input dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def pe_dim(multires: int, input_dims: int = 3) -> int:
    """Output dimension of the encoding (include_input + sin/cos pairs)."""
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Encode ``x`` (..., D) -> (..., D*(1+2*multires)).

    multires == 0 returns x unchanged.
    """
    if multires <= 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)  # (F,)
    # (..., F, D): x scaled by each frequency
    xb = x[..., None, :] * freqs[:, None]
    # Reference ordering: per frequency, a sin block then a cos block.
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # (..., F, 2D)
    enc = enc.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, enc], axis=-1)
