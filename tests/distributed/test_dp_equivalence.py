"""Distributed-without-a-cluster (SURVEY.md §4 item 4).

8 virtual CPU devices stand in for an ICI slice: the GSPMD-sharded train step
must produce the SAME parameters as the single-device step (the psum'd
gradient average ≡ full-batch gradient), and eval partials must concatenate
identically.
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learnablepoolingmethods_tpu import losses
from learnablepoolingmethods_tpu.config import ModelConfig, TrainingConfig
from learnablepoolingmethods_tpu.core import optimizers, step as step_lib
from learnablepoolingmethods_tpu.core.train_state import TrainState
from learnablepoolingmethods_tpu.ops import metrics_ops
from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib
from learnablepoolingmethods_tpu.models import create_model

MCFG = ModelConfig(vocab_size=24)
TCFG = TrainingConfig(batch_size=16, base_learning_rate=0.01)


def _make_state_and_batch(rng, frame_features=False):
    model = create_model("MoeModel", MCFG)
    batch = {
        "features": rng.normal(size=(16, 20)).astype(np.float32),
        "labels": (rng.uniform(size=(16, 24)) < 0.2).astype(np.float32),
        "weights": np.ones(16, np.float32),
    }
    params, bs = step_lib.init_model_variables(model, batch, frame_features)
    tx = optimizers.create_optimizer(TCFG)
    state = TrainState.create(params, bs, tx)
    return model, state, batch


def test_eight_devices_visible():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


def test_sharded_train_step_equals_single_device(rng):
    model, state, batch = _make_state_and_batch(rng)
    loss_obj = losses.CrossEntropyLoss()
    step_fn = step_lib.make_train_step(model, loss_obj, TCFG, MCFG, False)

    # single device
    state1, m1 = jax.jit(step_fn)(state, batch, jax.random.key(0))

    # 8-device data mesh
    mesh = mesh_lib.create_mesh()
    state_r = jax.device_put(state, mesh_lib.replicated_sharding(mesh))
    batch_s = {
        k: jax.device_put(v, mesh_lib.batch_sharding(mesh)) for k, v in batch.items()
    }
    rng_r = jax.device_put(jax.random.key(0), mesh_lib.replicated_sharding(mesh))
    state8, m8 = jax.jit(step_fn)(state_r, batch_s, rng_r)

    chex.assert_trees_all_close(
        jax.device_get(state1.params), jax.device_get(state8.params),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)


def test_sharded_eval_partials_equal_host_metrics(rng):
    model, state, batch = _make_state_and_batch(rng)
    loss_obj = losses.CrossEntropyLoss()
    eval_fn = step_lib.make_eval_step(model, loss_obj, MCFG, False, top_k=5)

    mesh = mesh_lib.create_mesh()
    params_r = jax.device_put(state.params, mesh_lib.replicated_sharding(mesh))
    bs_r = jax.device_put(state.batch_stats, mesh_lib.replicated_sharding(mesh))
    batch_s = {
        k: jax.device_put(v, mesh_lib.batch_sharding(mesh)) for k, v in batch.items()
    }
    out = jax.jit(eval_fn)(params_r, bs_r, batch_s)

    from learnablepoolingmethods_tpu.metrics import eval_util

    preds = np.asarray(out["predictions"])
    labels = batch["labels"]
    p = out["partials"]
    np.testing.assert_allclose(
        float(p.hit_at_one_sum) / 16, eval_util.calculate_hit_at_one(preds, labels),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(p.perr_sum) / 16,
        eval_util.calculate_precision_at_equal_recall_rate(preds, labels),
        rtol=1e-6,
    )
    # pooled top-k AP == reference GAP on the same batch
    from learnablepoolingmethods_tpu.metrics.average_precision_calculator import (
        ap_vectorized,
    )

    gap_fast = ap_vectorized(
        np.asarray(p.topk_scores).ravel(),
        np.asarray(p.topk_labels).ravel(),
        float(p.num_positives),
    )
    gap_ref = eval_util.calculate_gap(preds, labels, top_k=5)
    np.testing.assert_allclose(gap_fast, gap_ref, rtol=1e-6)


def test_padded_rows_do_not_change_metrics(rng):
    """weights mask: padded rows must not affect loss or metric partials."""
    model, state, batch = _make_state_and_batch(rng)
    loss_obj = losses.CrossEntropyLoss()
    eval_fn = jax.jit(step_lib.make_eval_step(model, loss_obj, MCFG, False, top_k=5))
    out_full = eval_fn(state.params, state.batch_stats, batch)

    padded = {
        "features": np.concatenate([batch["features"], np.zeros((4, 20), np.float32)]),
        "labels": np.concatenate([batch["labels"], np.zeros((4, 24), np.float32)]),
        "weights": np.concatenate([batch["weights"], np.zeros(4, np.float32)]),
    }
    out_pad = eval_fn(state.params, state.batch_stats, padded)
    np.testing.assert_allclose(
        float(out_full["loss"]), float(out_pad["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(out_full["partials"].num_positives),
        float(out_pad["partials"].num_positives),
    )
    np.testing.assert_allclose(
        float(out_full["partials"].hit_at_one_sum),
        float(out_pad["partials"].hit_at_one_sum),
    )


def test_frame_model_shards_over_mesh(rng):
    """A frame-level model (DBoF) compiles and runs batch-sharded."""
    cfg = ModelConfig(
        vocab_size=24, iterations=4, dbof_cluster_size=32, dbof_hidden_size=16
    )
    model = create_model("DbofModel", cfg)
    batch = {
        "features": rng.integers(0, 256, size=(16, 12, 20), dtype=np.uint8),
        "labels": (rng.uniform(size=(16, 24)) < 0.2).astype(np.float32),
        "num_frames": rng.integers(1, 13, size=(16,)).astype(np.int32),
        "weights": np.ones(16, np.float32),
    }
    params, bs = step_lib.init_model_variables(model, batch, frame_features=True)
    tx = optimizers.create_optimizer(TCFG)
    state = TrainState.create(params, bs, tx)
    step_fn = jax.jit(
        step_lib.make_train_step(
            model, losses.CrossEntropyLoss(), TCFG, cfg, True
        ),
        donate_argnums=0,
    )
    mesh = mesh_lib.create_mesh()
    state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))
    batch_s = {
        k: jax.device_put(v, mesh_lib.batch_sharding(mesh)) for k, v in batch.items()
    }
    rng_r = jax.device_put(jax.random.key(0), mesh_lib.replicated_sharding(mesh))
    state, m = step_fn(state, batch_s, rng_r)
    assert np.isfinite(float(m["loss"]))
    state, m2 = step_fn(state, batch_s, rng_r)
    assert float(m2["loss"]) != float(m["loss"])  # parameters moved


def test_grad_accum_sharded_equals_single_device(rng):
    """Gradient accumulation under a data mesh: microbatch slices cut across
    the batch-sharded axis (GSPMD reshards as needed), and the accumulated
    step must still equal the unsharded accum=1 step on a no-BN model."""
    import dataclasses

    model, state, batch = _make_state_and_batch(rng)
    loss_obj = losses.CrossEntropyLoss()

    plain = jax.jit(step_lib.make_train_step(model, loss_obj, TCFG, MCFG, False))
    state1, m1 = plain(state, batch, jax.random.key(0))

    accum_cfg = dataclasses.replace(TCFG, grad_accum_steps=4)
    accum_fn = jax.jit(
        step_lib.make_train_step(model, loss_obj, accum_cfg, MCFG, False)
    )
    mesh = mesh_lib.create_mesh()
    state_r = jax.device_put(state, mesh_lib.replicated_sharding(mesh))
    batch_s = {
        k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
        for k, v in batch.items()
    }
    rng_r = jax.device_put(jax.random.key(0), mesh_lib.replicated_sharding(mesh))
    state8, m8 = accum_fn(state_r, batch_s, rng_r)

    chex.assert_trees_all_close(
        jax.device_get(state1.params), jax.device_get(state8.params),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)


def test_remat_step_equals_plain_step(rng):
    """jax.checkpoint'd train step must produce identical parameters."""
    import dataclasses

    model, state, batch = _make_state_and_batch(rng)
    loss_obj = losses.CrossEntropyLoss()
    plain = jax.jit(step_lib.make_train_step(model, loss_obj, TCFG, MCFG, False))
    remat_cfg = dataclasses.replace(TCFG, use_remat=True)
    remat = jax.jit(step_lib.make_train_step(model, loss_obj, remat_cfg, MCFG, False))

    s1, m1 = plain(state, batch, jax.random.key(0))
    s2, m2 = remat(state, batch, jax.random.key(0))
    chex.assert_trees_all_close(
        jax.device_get(s1.params), jax.device_get(s2.params), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
