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
