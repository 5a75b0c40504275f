"""Unit tests for core/step.py helpers (regularization scope, masking)."""

import jax
import jax.numpy as jnp
import numpy as np

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model


def test_regularization_head_kernels_only(rng):
    """Reference parity: slim.l2_regularizer is attached to the classifier
    head FCs only (video_level_models.py#LogisticModel/#MoeModel); cluster,
    hidden, and gating weights carry no regularizer."""
    cfg = ModelConfig(
        vocab_size=8,
        iterations=4,
        netvlad_cluster_size=4,
        netvlad_hidden_size=8,
        moe_num_mixtures=2,
    )
    model = create_model("NetVLADModelLF", cfg)
    feats = rng.normal(size=(2, 6, 24)).astype(np.float32)
    nf = np.array([6, 3], np.int32)
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        jnp.asarray(feats),
        num_frames=jnp.asarray(nf),
        training=True,
    )
    params = variables["params"]

    penalty = 1e-2
    got = float(step_lib.regularization_loss(params, penalty))

    # expected: only the MoE head kernels in this model
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    want = 0.0
    n_head = 0
    for path, p in flat:
        keys = [getattr(k, "key", "") for k in path]
        if keys[-1] in ("gates_kernel", "experts_kernel"):
            want += 0.5 * penalty * float(np.sum(np.square(np.asarray(p))))
            n_head += 1
    assert n_head == 2, f"expected MoE head kernels in tree, found {n_head}"
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # broad mode covers every matrix param and is strictly larger
    broad = float(step_lib.regularization_loss(params, penalty, all_kernels=True))
    assert broad > got


def test_regularization_logistic_fc(rng):
    cfg = ModelConfig(vocab_size=8)
    model = create_model("LogisticModel", cfg)
    x = rng.normal(size=(2, 12)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    got = float(step_lib.regularization_loss(params, 1.0))
    want = 0.5 * float(np.sum(np.square(np.asarray(params["fc"]["kernel"]))))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_predict_step_rng_varies_sampling(rng):
    """Distinct per-batch keys must change the sampled frames (advisor:
    fixed fallback key correlated sampling across the run)."""
    cfg = ModelConfig(
        vocab_size=8,
        iterations=4,
        netvlad_cluster_size=4,
        netvlad_hidden_size=8,
        moe_num_mixtures=2,
    )
    model = create_model("NetVLADModelLF", cfg)
    feats = rng.integers(0, 256, size=(2, 12, 24), dtype=np.uint8)
    nf = np.array([12, 9], np.int32)
    params, batch_stats = step_lib.init_model_variables(
        model, {"features": feats, "num_frames": nf}, frame_features=True
    )
    predict = step_lib.make_predict_step(model, cfg, True, top_k=3)
    v0, _ = predict(params, batch_stats, feats, nf, jax.random.key(1))
    v0b, _ = predict(params, batch_stats, feats, nf, jax.random.key(1))
    v1, _ = predict(params, batch_stats, feats, nf, jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v0b))
    assert not np.allclose(np.asarray(v0), np.asarray(v1)), (
        "different sampling keys produced identical predictions"
    )


def test_grad_accum_equivalence_no_bn(rng):
    """grad_accum_steps=N must reproduce the single-pass step exactly on a
    model with no BatchNorm and no frame sampling (MoeModel): the microbatch
    losses are scaled so their summed gradients ARE the full-batch weighted
    gradient — verified through an SGD update (linear in grads, no Adam
    amplification) on a padded batch with ragged weights, and on an
    all-zero-weight batch where only the (hoisted, applied-exactly-once)
    L2 gradient moves the params."""
    import chex

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.config import TrainingConfig
    from learnablepoolingmethods_tpu.core import optimizers
    from learnablepoolingmethods_tpu.core.train_state import TrainState

    batch = {
        "features": rng.normal(size=(8, 20)).astype(np.float32),
        "labels": (rng.uniform(size=(8, 12)) < 0.2).astype(np.float32),
        # ragged weights (incl. a padded-out row) exercise the per-microbatch
        # W_mb/W_total scaling
        "weights": np.array([1, 1, 0, 1, 1, 1, 1, 1], np.float32),
    }
    mcfg = ModelConfig(vocab_size=12, l2_penalty=1e-3)
    loss_obj = losses.CrossEntropyLoss()

    def run(accum, b=batch):
        tcfg = TrainingConfig(
            batch_size=8,
            optimizer="GradientDescentOptimizer",
            grad_accum_steps=accum,
        )
        model = create_model("MoeModel", mcfg)
        params, bs = step_lib.init_model_variables(model, b, False)
        state = TrainState.create(params, bs, optimizers.create_optimizer(tcfg))
        step_fn = jax.jit(
            step_lib.make_train_step(model, loss_obj, tcfg, mcfg, False)
        )
        state, metrics = step_fn(state, b, jax.random.key(0))
        return state, metrics

    state1, m1 = run(1)
    state4, m4 = run(4)
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(m4["label_loss"]), float(m1["label_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m4["predictions"]), np.asarray(m1["predictions"]),
        rtol=1e-6, atol=1e-7,
    )
    chex.assert_trees_all_close(
        jax.device_get(state4.params), jax.device_get(state1.params),
        rtol=1e-5, atol=1e-7,
    )

    # sum(weights)=0 < 1: the params-only L2 gradient must still be applied
    # exactly once (it is hoisted out of the microbatch loop; an in-loop
    # W_mb/W_total scaling would silently zero it here)
    zero = dict(batch, weights=np.zeros(8, np.float32))
    z1, mz1 = run(1, zero)
    z4, mz4 = run(4, zero)
    assert float(mz1["reg_loss"]) > 0
    np.testing.assert_allclose(
        float(mz4["reg_loss"]), float(mz1["reg_loss"]), rtol=1e-6
    )
    chex.assert_trees_all_close(
        jax.device_get(z4.params), jax.device_get(z1.params),
        rtol=1e-6, atol=1e-8,
    )


def test_grad_accum_frame_model_runs(rng):
    """Accumulation on a BN + frame-sampling model (DbofModel): semantics are
    per-microbatch (documented), so assert the step runs, chains batch_stats
    through the microbatches, and emits full-batch-shaped predictions; a
    non-divisible batch raises."""
    import pytest

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.config import TrainingConfig
    from learnablepoolingmethods_tpu.core import optimizers
    from learnablepoolingmethods_tpu.core.train_state import TrainState

    mcfg = ModelConfig(
        vocab_size=8, iterations=4, dbof_cluster_size=16, dbof_hidden_size=8
    )
    batch = {
        "features": rng.integers(0, 256, size=(6, 10, 12), dtype=np.uint8),
        "labels": (rng.uniform(size=(6, 8)) < 0.3).astype(np.float32),
        "num_frames": np.array([10, 3, 7, 10, 1, 5], np.int32),
        "weights": np.ones(6, np.float32),
    }
    tcfg = TrainingConfig(batch_size=6, grad_accum_steps=2)
    model = create_model("DbofModel", mcfg)
    params, bs = step_lib.init_model_variables(model, batch, True)
    state = TrainState.create(params, bs, optimizers.create_optimizer(tcfg))
    loss_obj = losses.CrossEntropyLoss()
    step_fn = jax.jit(
        step_lib.make_train_step(model, loss_obj, tcfg, mcfg, True)
    )
    new_state, metrics = step_fn(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["predictions"].shape == (6, 8)
    # batch_stats must have advanced (chained through both microbatches)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(after, before)
    )

    bad = TrainingConfig(batch_size=6, grad_accum_steps=4)
    bad_fn = step_lib.make_train_step(model, loss_obj, bad, mcfg, True)
    with pytest.raises(ValueError, match="not divisible"):
        jax.jit(bad_fn)(state, batch, jax.random.key(0))

    # presample + accumulation: the uint8 gather runs per-microbatch (the
    # full-batch gather was the largest OOM buffer on-chip); must still run
    import dataclasses

    mcfg_p = dataclasses.replace(mcfg, presampled=True)
    tcfg_p = TrainingConfig(
        batch_size=6, grad_accum_steps=2, presample_frames=True
    )
    model_p = create_model("DbofModel", mcfg_p)
    params_p, bs_p = step_lib.init_model_variables(model_p, batch, True)
    state_p = TrainState.create(
        params_p, bs_p, optimizers.create_optimizer(tcfg_p)
    )
    step_p = jax.jit(
        step_lib.make_train_step(model_p, loss_obj, tcfg_p, mcfg_p, True)
    )
    _, metrics_p = step_p(state_p, batch, jax.random.key(0))
    assert np.isfinite(float(metrics_p["loss"]))
    assert metrics_p["predictions"].shape == (6, 8)


def test_presample_frames_step_equivalence(rng):
    """--presample_frames gathers uint8 frames BEFORE dequantize+ℓ2-norm —
    an exact reorder (row-wise normalize).  With num_frames=1 the sampled
    index is always 0, so loss and gradients must agree to float noise.
    (Post-Adam params are NOT compared: on near-zero gradients Adam's
    m̂/√v̂ ≈ sign(g) amplifies 1-ulp backward noise into ±lr sign flips.)"""
    import dataclasses

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.config import TrainingConfig
    import chex

    mcfg = ModelConfig(
        vocab_size=8, iterations=4, dbof_cluster_size=16, dbof_hidden_size=8
    )
    batch = {
        "features": rng.integers(0, 256, size=(4, 6, 12), dtype=np.uint8),
        "labels": (rng.uniform(size=(4, 8)) < 0.3).astype(np.float32),
        "num_frames": np.ones(4, np.int32),  # index 0 regardless of key
        "weights": np.ones(4, np.float32),
    }
    loss_obj = losses.CrossEntropyLoss()
    key = jax.random.key(0)

    def loss_and_grads(presample):
        m = dataclasses.replace(mcfg, presampled=presample)
        model = create_model("DbofModel", m)
        params, bs = step_lib.init_model_variables(model, batch, True)

        def loss_fn(params):
            feats = jnp.asarray(batch["features"])
            nf = jnp.asarray(batch["num_frames"])
            if presample:
                u = jax.random.uniform(key, (4, m.iterations))
                idx = jnp.minimum(
                    (u * nf[:, None].astype(jnp.float32)).astype(jnp.int32),
                    feats.shape[1] - 1,
                )
                feats = jnp.take_along_axis(feats, idx[:, :, None], axis=1)
            x = step_lib.preprocess_input(feats)
            out = model.apply(
                {"params": params, "batch_stats": bs}, x, num_frames=nf,
                training=True, rngs={"sampling": key},
                mutable=["batch_stats"],
            )[0]
            per = loss_obj.calculate_per_example_loss(
                out["predictions"], jnp.asarray(batch["labels"])
            )
            return jnp.mean(per)

        return jax.value_and_grad(loss_fn)(params)

    l_ref, g_ref = loss_and_grads(False)
    l_pre, g_pre = loss_and_grads(True)
    np.testing.assert_allclose(float(l_pre), float(l_ref), rtol=1e-7)
    chex.assert_trees_all_close(
        jax.device_get(g_ref), jax.device_get(g_pre), rtol=1e-5, atol=1e-7
    )
