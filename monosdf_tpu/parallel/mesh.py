"""Data-parallel scale-out over a TPU device mesh.

TPU-native replacement for the reference's DDP-over-NCCL
(code/training/exp_runner.py:74-77, monosdf_train.py:228-229):

* one ``jax.sharding.Mesh`` with a ``('data',)`` axis over the pod slice;
* the ray batch is sharded on 'data', parameters are replicated;
* each shard computes its own loss on its own rays (exactly the reference's
  per-rank semantics — each DDP rank draws an independent pixel batch and
  computes an independent scale/shift depth solve) and gradients are averaged
  with ``pmean`` over ICI, which XLA overlaps with the backward pass;
* per-shard RNG is ``fold_in(key, axis_index)`` — the keyed analog of the
  reference's per-rank unseeded ``torch.randperm`` sampling
  (scene_dataset.py:468-478).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
each host feeds its local shard of the global batch (host-local data loading).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import LossConfig, monosdf_loss
from ..models.monosdf import MonoSDFConfig, render_rays
from ..train.step import TrainState


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a global batch with its leading axis sharded over the mesh."""
    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def make_parallel_train_step(
    cfg: MonoSDFConfig,
    loss_cfg: LossConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis_name: str = "data",
):
    """shard_map'd train step: rays sharded, params replicated, grads pmean'd.

    Returned fn has signature (state, batch, key) -> (state, metrics); batch
    leading axes must be divisible by mesh size. key is a single global key —
    per-shard keys are folded in internally.
    """

    def loss_fn(params, batch, key, step):
        image_code = None
        if cfg.rendering.per_image_code:
            image_code = params["rendering"]["embeddings"][batch["indices"]]
        outputs = render_rays(
            params, cfg, batch["rays"], key, training=True, image_code=image_code
        )
        losses = monosdf_loss(loss_cfg, outputs, batch["gt"], step=step)
        return losses["loss"], losses

    def shard_step(state: TrainState, batch, key):
        # Independent RNG per shard, like independent DDP ranks.
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key, state.step
        )
        grads = jax.lax.pmean(grads, axis_name)          # DDP all-reduce
        metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["beta"] = jnp.abs(params["density"]["beta"]) + cfg.beta_min
        return TrainState(params, opt_state, state.step + 1), metrics

    batch_spec = P(axis_name)
    mapped = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))
