"""Unit tests for core/optimizers.py (per-leaf clip, fp32-master wrapper)."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

from learnablepoolingmethods_tpu.config import TrainingConfig
from learnablepoolingmethods_tpu.core import optimizers


def _tree(rng, dtype):
    return {
        "w": jnp.asarray(rng.normal(size=(64, 32)), dtype),
        "b": jnp.asarray(rng.normal(size=(32,)), dtype),
    }


def test_fp32_master_tracks_fp32_adam_exactly(rng):
    """With identical gradient streams, the master trajectory must be
    bit-identical to plain fp32 Adam — the wrapper adds no drift; only the
    stored bf16 params are rounded."""
    lr = 0.05
    inner = optax.adam(lr)
    wrapped = optimizers.with_fp32_master(inner)

    p32 = _tree(rng, jnp.float32)
    p16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), p32)

    s32 = inner.init(p32)
    s16 = wrapped.init(p16)
    # master starts as fp32(bf16(p32)) — align the fp32 run to the same start
    p32 = jax.tree.map(lambda p: p.astype(jnp.bfloat16).astype(jnp.float32), p32)

    for i in range(5):
        g = _tree(np.random.default_rng(100 + i), jnp.float32)
        u32, s32 = inner.update(g, s32, p32)
        p32 = optax.apply_updates(p32, u32)

        u16, s16 = wrapped.update(g, s16, p16)
        p16 = optax.apply_updates(p16, u16)

    chex.assert_trees_all_equal(s16.master, p32)
    # stored params are the bf16 rounding of the master (≤1 ulp from the
    # fp32 subtract trick)
    for a, b in zip(jax.tree.leaves(p16), jax.tree.leaves(s16.master)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b.astype(jnp.bfloat16), np.float32),
            rtol=0.008,
        )


def test_fp32_master_end_to_end_step(rng):
    """A bf16-param train step with fp32_master stays close to the fp32 run
    (differences bounded by bf16 weight rounding in the forward)."""
    import dataclasses

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.config import ModelConfig
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.models import create_model

    batch = {
        "features": rng.normal(size=(8, 20)).astype(np.float32),
        "labels": (rng.uniform(size=(8, 12)) < 0.2).astype(np.float32),
        "weights": np.ones(8, np.float32),
    }
    losses_obj = losses.CrossEntropyLoss()

    def run(param_dtype, fp32_master, steps=3):
        # init in fp32 for both runs (random draws differ per dtype), then
        # cast — the same conversion a user applies to existing checkpoints
        mcfg = ModelConfig(vocab_size=12)
        tcfg = TrainingConfig(batch_size=8, fp32_master=fp32_master)
        model = create_model("MoeModel", mcfg)
        params, bs = step_lib.init_model_variables(model, batch, False)
        if param_dtype == "bfloat16":
            params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        tx = optimizers.create_optimizer(tcfg)
        state = TrainState.create(params, bs, tx)
        step_fn = jax.jit(
            step_lib.make_train_step(model, losses_obj, tcfg, mcfg, False)
        )
        loss = None
        for _ in range(steps):
            state, m = step_fn(state, batch, jax.random.key(0))
            loss = float(m["loss"])
        return state, loss

    state32, loss32 = run("float32", False)
    state16, loss16 = run("bfloat16", True)
    np.testing.assert_allclose(loss16, loss32, rtol=0.05)
    master = state16.opt_state.master
    chex.assert_trees_all_close(
        jax.device_get(master), jax.device_get(state32.params),
        rtol=0.08, atol=1e-3,
    )
    # stored params really are bf16
    for p in jax.tree.leaves(state16.params):
        assert p.dtype == jnp.bfloat16


def test_per_leaf_clip(rng):
    clip = optimizers.clip_gradient_norms(1.0)
    g = {"a": jnp.full((10,), 10.0), "b": jnp.full((4,), 0.01)}
    u, _ = clip.update(g, clip.init(g))
    np.testing.assert_allclose(
        float(jnp.linalg.norm(u["a"])), 1.0, rtol=1e-6
    )  # clipped to unit norm
    np.testing.assert_allclose(np.asarray(u["b"]), np.asarray(g["b"]))  # untouched


def test_adafactor_option_trains(rng):
    """Rebuild-only AdafactorOptimizer: factored second moment, step runs,
    loss decreases on a learnable problem."""
    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.config import ModelConfig
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.models import create_model

    mcfg = ModelConfig(vocab_size=8)
    tcfg = TrainingConfig(
        batch_size=16, optimizer="AdafactorOptimizer", base_learning_rate=0.05
    )
    model = create_model("LogisticModel", mcfg)
    w = rng.normal(size=(12, 8)).astype(np.float32)
    x = rng.normal(size=(16, 12)).astype(np.float32)
    batch = {
        "features": x,
        "labels": (x @ w > 0.5).astype(np.float32),
        "weights": np.ones(16, np.float32),
    }
    params, bs = step_lib.init_model_variables(model, batch, False)
    state = TrainState.create(params, bs, optimizers.create_optimizer(tcfg))
    step_fn = jax.jit(
        step_lib.make_train_step(model, losses.CrossEntropyLoss(), tcfg, mcfg, False)
    )
    losses_seen = []
    for _ in range(12):
        state, m = step_fn(state, batch, jax.random.key(0))
        losses_seen.append(float(m["loss"]))
    assert all(np.isfinite(losses_seen))
    assert losses_seen[-1] < losses_seen[0]


def test_fp32_master_checkpoint_roundtrip(rng, tmp_path):
    """The Fp32MasterState (bf16 params + fp32 master + inner Adam state)
    must survive an orbax save/restore — training resume with --bf16_params."""
    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.config import ModelConfig
    from learnablepoolingmethods_tpu.core import checkpoints as ckpt_lib
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.models import create_model

    mcfg = ModelConfig(vocab_size=8)
    tcfg = TrainingConfig(batch_size=8, fp32_master=True)
    model = create_model("LogisticModel", mcfg)
    batch = {
        "features": rng.normal(size=(8, 12)).astype(np.float32),
        "labels": (rng.uniform(size=(8, 8)) < 0.3).astype(np.float32),
        "weights": np.ones(8, np.float32),
    }
    params, bs = step_lib.init_model_variables(model, batch, False)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    tx = optimizers.create_optimizer(tcfg)
    state = TrainState.create(params, bs, tx)
    step_fn = jax.jit(
        step_lib.make_train_step(model, losses.CrossEntropyLoss(), tcfg, mcfg, False)
    )
    state, _ = step_fn(state, batch, jax.random.key(0))
    state, _ = step_fn(state, batch, jax.random.key(0))

    mngr = ckpt_lib.CheckpointManager(str(tmp_path))
    mngr.save(2, ckpt_lib.state_to_tree(state))
    restored_tree = mngr.restore_latest(
        ckpt_lib.abstract_like(jax.device_get(ckpt_lib.state_to_tree(state)))
    )
    mngr.close()
    restored = ckpt_lib.tree_to_state(restored_tree, tx)
    chex.assert_trees_all_equal(
        jax.device_get(state.params), jax.device_get(restored.params)
    )
    chex.assert_trees_all_equal(
        jax.device_get(state.opt_state), jax.device_get(restored.opt_state)
    )
    for p in jax.tree.leaves(restored.params):
        assert p.dtype == jnp.bfloat16
    # resumed training continues bit-identically
    s_a, m_a = step_fn(state, batch, jax.random.key(1))
    s_b, m_b = step_fn(restored, batch, jax.random.key(1))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=0)
