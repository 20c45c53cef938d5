"""Trainer-loop unit tests: drive Trainer.train() end-to-end on a tiny
synthetic scene under a tmpdir exps root — metrics.jsonl rows, checkpoint
writing + GC, resume, and the divergence guard.

Reference behavior being mirrored: monosdf_train.py run() (:301-485),
save_checkpoints (:277-299), resume-by-prefix (:69-102).
"""

import glob
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosdf_tpu.config.schema import ExperimentConfig
from monosdf_tpu.data import make_synthetic_sphere_scene
from monosdf_tpu.losses import LossConfig
from monosdf_tpu.models import MonoSDFConfig
from monosdf_tpu.models.fields import ImplicitNetConfig, RenderingNetConfig
from monosdf_tpu.ops.sampler import SamplerConfig
from monosdf_tpu.train import OptimConfig
from monosdf_tpu.train.trainer import Trainer


def tiny_exp(max_total_iters=40, checkpoint_freq=1, plot_freq=0):
    model = MonoSDFConfig(
        implicit=ImplicitNetConfig(
            feature_vector_size=16, dims=(32, 32), multires=4,
            inside_outside=False, bias=0.5, sdf_bounding_sphere=1.1,
        ),
        rendering=RenderingNetConfig(
            feature_vector_size=16, dims=(32, 32), multires_view=2
        ),
        sampler=SamplerConfig(
            N_samples=8, N_samples_eval=16, N_samples_extra=4,
            max_total_iters=2, intersection="cube",
        ),
        scene_bounding_sphere=1.1,
    )
    return ExperimentConfig(
        expname="unit", model=model, loss=LossConfig(),
        optim=OptimConfig(learning_rate=1e-3, decay_steps=10**6),
        num_pixels=32, split_n_pixels=64,
        max_total_iters=max_total_iters,
        checkpoint_freq=checkpoint_freq, plot_freq=plot_freq,
        plot_resolution=32,
    )


@pytest.fixture(scope="module")
def scene():
    return make_synthetic_sphere_scene(n_images=2, img_res=8)


class TestTrainerLoop:
    def test_train_writes_metrics_checkpoints_and_gc(self, tmp_path, scene):
        exp = tiny_exp(max_total_iters=40)
        tr = Trainer(exp, scene, exps_root=str(tmp_path), seed=0,
                     timestamp="20260101-000000")
        tr.train(log_every=10)

        # metrics.jsonl has rows with the expected keys
        rows = [json.loads(l) for l in open(os.path.join(tr.run_dir, "metrics.jsonl"))]
        assert len(rows) >= 4
        assert {"iter", "loss", "psnr", "rays_per_sec"} <= set(rows[-1])
        assert np.isfinite(rows[-1]["loss"])

        # checkpoints: latest + numbered, GC'd to the last 3
        # (iters_per_epoch = 128 rays / 32 = 4 -> epochs 1..10 checkpointed)
        ckpts = sorted(glob.glob(os.path.join(tr.ckpt_dir, "*.ckpt")))
        numbered = [c for c in ckpts if os.path.basename(c) != "latest.ckpt"]
        assert os.path.exists(os.path.join(tr.ckpt_dir, "latest.ckpt"))
        assert len(numbered) == 3, f"GC should keep 3 numbered ckpts, got {numbered}"

    def test_resume_continues_from_saved_step(self, tmp_path, scene):
        exp = tiny_exp(max_total_iters=20)
        tr = Trainer(exp, scene, exps_root=str(tmp_path), seed=0,
                     timestamp="20260101-000000")
        tr.train(log_every=10)
        step_after = int(jax.device_get(tr.state.step))
        assert step_after == 20

        # fresh Trainer with resume=True finds the run by expname suffix and
        # restores params + step; train() is then a no-op at max_iters=20
        tr2 = Trainer(exp, scene, exps_root=str(tmp_path), seed=0, resume=True)
        assert tr2.run_dir == tr.run_dir
        assert int(jax.device_get(tr2.state.step)) == 20
        p1 = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))
        p2 = jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))
        for a, b in zip(p1, p2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        tr2.train(log_every=10)  # resumes at iter 20 == max -> immediate save
        assert int(jax.device_get(tr2.state.step)) == 20

    def test_load_from_warm_starts_new_experiment(self, tmp_path, scene):
        """--load_from PREFIX: a NEW run (own dir/prefix) starts from another
        experiment's latest checkpoint (reference exp_runner.py:29 +
        monosdf_train.py:70-84)."""
        exp = tiny_exp(max_total_iters=10)
        tr = Trainer(exp, scene, exps_root=str(tmp_path), seed=0,
                     timestamp="20260101-000000")
        tr.train(log_every=10)

        tr2 = Trainer(exp, scene, exps_root=str(tmp_path), seed=1,
                      expname_prefix="warm_", load_from="unit",
                      timestamp="20260101-000002")
        assert tr2.run_dir != tr.run_dir
        assert os.path.basename(tr2.run_dir) == "20260101-000002-warm_unit"
        assert int(jax.device_get(tr2.state.step)) == 10
        p1 = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))
        p2 = jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))
        for a, b in zip(p1, p2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        with pytest.raises(FileNotFoundError):
            Trainer(exp, scene, exps_root=str(tmp_path), seed=1,
                    load_from="nosuch", timestamp="20260101-000003")

    def test_divergence_guard_saves_crash_checkpoint(self, tmp_path, scene):
        exp = tiny_exp(max_total_iters=30)
        tr = Trainer(exp, scene, exps_root=str(tmp_path), seed=0,
                     timestamp="20260101-000001")
        real_step = tr.step_fn

        def nan_step(state, batch, key):
            state, metrics = real_step(state, batch, key)
            metrics = dict(metrics)
            metrics["loss"] = jnp.float32(np.nan)
            return state, metrics

        tr.step_fn = nan_step
        with pytest.raises(FloatingPointError):
            tr.train(log_every=10)
        assert os.path.exists(os.path.join(tr.ckpt_dir, "-1.ckpt")), (
            "divergence guard must write a crash checkpoint"
        )


class TestCheckpointMigration:
    """restore_state must survive checkpoints written with the other
    OptimConfig.fused flavor (ADVICE r1: FlatAdamState vs per-leaf adam)."""

    def _mk(self, fused):
        from monosdf_tpu.models import init_monosdf
        from monosdf_tpu.train import init_train_state, make_optimizer

        cfg = tiny_exp().model
        params = init_monosdf(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(OptimConfig(decay_steps=1000, fused=fused))
        return params, opt, init_train_state(params, opt)

    def _advance(self, opt, state, params):
        import optax
        from monosdf_tpu.train.step import TrainState

        grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 0.01), params
        )
        opt_state = state.opt_state
        for _ in range(3):
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return TrainState(params, opt_state, jnp.asarray(3, jnp.int32))

    @pytest.mark.parametrize("save_fused,load_fused", [(True, False), (False, True)])
    def test_cross_flavor_moment_migration(self, tmp_path, save_fused, load_fused):
        from jax.flatten_util import ravel_pytree
        from monosdf_tpu.train.checkpoint import (
            load_checkpoint, restore_state, save_checkpoint,
        )
        from monosdf_tpu.train.checkpoint import _find_adam_node

        params, opt_s, state_s = self._mk(save_fused)
        state_s = self._advance(opt_s, state_s, params)
        save_checkpoint(str(tmp_path), jax.device_get(state_s), epoch=1)

        _, opt_l, state_l = self._mk(load_fused)
        restored = restore_state(state_l, load_checkpoint(str(tmp_path)))
        assert int(restored.step) == 3
        # moments carry over exactly (ravel both sides to compare)
        src = _find_adam_node(jax.device_get(state_s.opt_state))
        dst = _find_adam_node(jax.device_get(restored.opt_state))
        src_mu, _ = ravel_pytree(src.mu)
        dst_mu, _ = ravel_pytree(dst.mu)
        src_mu, dst_mu = np.asarray(src_mu), np.asarray(dst_mu)
        # the fused flavor zero-pads its moment vector to a 1024 multiple
        # (flat_adam PAD); compare on the common (true-parameter) prefix
        # and require any pad tail to be exactly zero
        m = min(len(src_mu), len(dst_mu))
        np.testing.assert_allclose(src_mu[:m], dst_mu[:m], atol=0)
        assert not np.any(src_mu[m:]) and not np.any(dst_mu[m:])
        assert int(np.asarray(src.count)) == int(np.asarray(dst.count)) == 3

    def test_unmigratable_falls_back_with_warning(self, tmp_path):
        """A payload with no recognizable Adam moments (e.g. a different
        optimizer family): restore keeps the fresh opt state and warns
        instead of crashing."""
        import pickle

        from monosdf_tpu.models import init_monosdf
        from monosdf_tpu.train import init_train_state, make_optimizer
        from monosdf_tpu.train.checkpoint import (
            load_checkpoint, restore_state,
        )

        cfg = tiny_exp().model
        params = init_monosdf(jax.random.PRNGKey(0), cfg)
        payload = {
            "params": jax.device_get(params),
            "opt_state": {"momentum": np.zeros(3, np.float32)},
            "step": 7,
            "epoch": 0,
            "opt_flavor": "SGDState",
        }
        with open(tmp_path / "latest.ckpt", "wb") as f:
            pickle.dump(payload, f)

        opt_f = make_optimizer(OptimConfig(decay_steps=1000, fused=True))
        state_f = init_train_state(params, opt_f)
        with pytest.warns(UserWarning, match="cannot be migrated"):
            restored = restore_state(state_f, load_checkpoint(str(tmp_path)))
        assert jax.tree_util.tree_structure(
            restored.opt_state
        ) == jax.tree_util.tree_structure(state_f.opt_state)
        with pytest.raises(ValueError):
            restore_state(state_f, load_checkpoint(str(tmp_path)), strict=True)


class TestGridFlavorMigration:
    """Grid-mode multi_transform <-> fused grid Adam round trips (VERDICT r2
    #7): the flagship's own optimizer flavors must exchange moments exactly
    — the reference restores optimizer state exactly on resume
    (monosdf_train.py:236-261)."""

    def _params(self):
        k = jax.random.PRNGKey(0)
        return {
            "encoding": {"embeddings": jax.random.normal(k, (64, 2))},
            "net": {"w0": jax.random.normal(k, (8, 8)),
                    "b0": jnp.zeros((8,))},
            "density": {"beta": jnp.asarray([0.1])},
        }

    def _mk(self, fused):
        from monosdf_tpu.train import init_train_state, make_optimizer

        params = self._params()
        opt = make_optimizer(
            OptimConfig(decay_steps=1000, grid_mode=True, fused=fused)
        )
        return params, opt, init_train_state(params, opt)

    def _advance(self, opt, state, params, n=3):
        import optax
        from monosdf_tpu.train.step import TrainState

        grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 0.01), params
        )
        opt_state = state.opt_state
        for _ in range(n):
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, TrainState(params, opt_state, jnp.asarray(n, jnp.int32))

    @pytest.mark.parametrize(
        "save_fused,load_fused", [(True, False), (False, True)]
    )
    def test_grid_cross_flavor_round_trip(self, tmp_path, save_fused, load_fused):
        import optax
        from monosdf_tpu.train.checkpoint import (
            load_checkpoint, restore_state, save_checkpoint,
        )

        params0, opt_s, state_s = self._mk(save_fused)
        params_s, state_s = self._advance(opt_s, state_s, params0)
        save_checkpoint(str(tmp_path), jax.device_get(state_s), epoch=1)

        _, opt_l, state_l_init = self._mk(load_fused)
        restored = restore_state(
            state_l_init, load_checkpoint(str(tmp_path)), strict=True
        )
        assert int(restored.step) == 3

        # one more step under each flavor must produce IDENTICAL params
        # (the x20 encoding lr is a schedule/scale in both flavors; the
        # migrated moments must therefore match exactly)
        grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 0.02), params_s
        )
        upd_s, _ = opt_s.update(grads, state_s.opt_state, params_s)
        upd_l, _ = opt_l.update(grads, restored.opt_state, restored.params)
        a = optax.apply_updates(params_s, upd_s)
        b = optax.apply_updates(restored.params, upd_l)
        for pa, pb in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        ):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), rtol=1e-6, atol=1e-7
            )


class TestScanChunkedTrainer:
    def test_steps_per_call_runs_and_checkpoints(self, tmp_path, scene):
        """steps_per_call > 1: the scan fast path must advance the step
        counter exactly, write metrics rows, and still hit checkpoint
        boundaries (period-crossing logic)."""
        exp = tiny_exp(max_total_iters=24, checkpoint_freq=2)
        tr = Trainer(exp, scene, exps_root=str(tmp_path), seed=0,
                     timestamp="20260101-000001", steps_per_call=4)
        state = tr.train(log_every=8)
        assert int(jax.device_get(state.step)) == 24
        rows = [json.loads(l) for l in
                open(os.path.join(tr.run_dir, "metrics.jsonl"))]
        assert rows and np.isfinite(rows[-1]["loss"])
        assert os.path.exists(os.path.join(tr.ckpt_dir, "latest.ckpt"))
