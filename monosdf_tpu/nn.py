"""Minimal functional NN layer library.

Parameters are plain dict pytrees. Linear layers use an explicit
weight-normalization (g, v) parameterization reproducing
``torch.nn.utils.weight_norm`` semantics (norm over input dim, per output
unit) so that the reference's geometric initialization + weight-norm
combination (reference code/model/network.py:51-77) is matched exactly.

Weights are stored as (in, out) — transposed from torch — so application is a
plain ``x @ w`` that XLA maps straight onto the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def softplus_beta(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """softplus with sharpness beta: (1/beta) * log(1 + exp(beta*x)).

    Matches torch.nn.Softplus(beta=100) (reference network.py:77) to within
    ~1e-11 (torch switches to identity for beta*x > 20; jax.nn.softplus is
    numerically stable for all x)."""
    return jax.nn.softplus(beta * x) / beta


def init_linear(key, d_in: int, d_out: int, weight_norm: bool = True):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    weight and bias."""
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(k_w, (d_in, d_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(k_b, (d_out,), minval=-bound, maxval=bound)
    return _wrap_weight_norm(w, b, weight_norm)


def _wrap_weight_norm(w: jnp.ndarray, b: jnp.ndarray, weight_norm: bool):
    if not weight_norm:
        return {"w": w, "b": b}
    g = jnp.linalg.norm(w, axis=0)  # per-output-unit norm (torch dim!=0 norm)
    return {"v": w, "g": g, "b": b}


def apply_linear(
    params: dict, x: jnp.ndarray, dtype=None, keep_dtype: bool = False
) -> jnp.ndarray:
    """Weight-norm linear. With ``dtype`` (e.g. bf16) the matmul inputs are
    cast down but accumulation stays float32 (MXU-native mixed precision);
    weight-norm math and bias add stay f32. ``keep_dtype`` additionally
    casts the OUTPUT to ``dtype`` so inter-layer activations (and the HLO
    temps the double-JVP graph keeps for backward) live in bf16 — on a
    bandwidth-bound chip this halves the activation traffic."""
    if "v" in params:
        v = params["v"]
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        w = v * (params["g"][None, :] / (norm + 1e-16))
    else:
        w = params["w"]
    if dtype is not None:
        # keep_dtype: the dot EMITS ``dtype`` (bf16) directly. The MXU still
        # accumulates in f32 internally; only the stored result is rounded.
        # Crucially this keeps the COTANGENT path in bf16 too: the transpose
        # of a bf16-out dot is a bf16xbf16 dot, whereas an f32-out dot + cast
        # re-promotes the cotangent to f32 at exactly the transposed matmul
        # (measured: ~46% of backward dot-FLOPs were running at f32 MXU rate).
        out_dtype = dtype if keep_dtype else jnp.float32
        y = jax.lax.dot_general(
            x.astype(dtype), w.astype(dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )
        return y + params["b"].astype(out_dtype)
    return x @ w + params["b"]


def geometric_linear_init(
    key,
    d_in: int,
    d_out: int,
    layer_idx: int,
    num_layers: int,
    dims0: int,
    multires: int,
    skip_in: tuple,
    bias: float,
    inside_outside: bool,
    weight_norm: bool,
):
    """SAL/IGR geometric initialization for one SDF-MLP layer
    (reference network.py:51-70 / 218-237).

    d_in/d_out are this layer's effective in/out dims; dims0 is the network
    input dim (PE+grid width); layer indices follow the reference convention.
    Note the reference passes torch's (out, in)-shaped weight, so its
    ``weight[:, 3:]`` slices input columns — here rows of the (in, out) w.
    """
    k_w, _ = jax.random.split(key)
    if layer_idx == num_layers - 2:  # last layer -> SDF head
        mean = math.sqrt(math.pi) / math.sqrt(d_in)
        if inside_outside:
            mean, b_val = -mean, bias
        else:
            b_val = -bias
        w = mean + 0.0001 * jax.random.normal(k_w, (d_in, d_out))
        b = jnp.full((d_out,), b_val)
    elif multires > 0 and layer_idx == 0:
        # zero the PE/grid channels; N(0, sqrt(2)/sqrt(out)) on raw xyz
        w = jnp.zeros((d_in, d_out))
        std = math.sqrt(2.0) / math.sqrt(d_out)
        w = w.at[:3, :].set(std * jax.random.normal(k_w, (3, d_out)))
        b = jnp.zeros((d_out,))
    elif multires > 0 and layer_idx in skip_in:
        std = math.sqrt(2.0) / math.sqrt(d_out)
        w = std * jax.random.normal(k_w, (d_in, d_out))
        w = w.at[-(dims0 - 3):, :].set(0.0)  # zero the concatenated PE tail
        b = jnp.zeros((d_out,))
    else:
        std = math.sqrt(2.0) / math.sqrt(d_out)
        w = std * jax.random.normal(k_w, (d_in, d_out))
        b = jnp.zeros((d_out,))
    return _wrap_weight_norm(w, b, weight_norm)
