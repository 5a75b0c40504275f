"""Golden tests for video-level heads and frame utilities vs TF2 transcriptions."""

import jax
import jax.numpy as jnp
import numpy as np
import tensorflow as tf

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.models import create_model, model_utils

V = 12  # vocab


def test_moe_golden(rng):
    """MoE head (ref: video_level_models.py#MoeModel) with identical weights.

    Our kernels are vocab-major ([D, m·V+v]); the reference is mixture-major
    ([D, v·(M+1)+m]).  Map ours into the reference layout and run the exact
    TF transcription — predictions must agree.
    """
    num_mixtures = 2
    cfg = ModelConfig(vocab_size=V, moe_num_mixtures=num_mixtures)
    m = create_model("MoeModel", cfg)
    x = rng.normal(size=(5, 8)).astype(np.float32)
    variables = m.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(m.apply(variables, jnp.asarray(x))["predictions"])

    p = variables["params"]
    d = 8
    # ours [D, (M+1)*V] vocab-major → reference [D, V*(M+1)] mixture-major
    gate_ours = np.asarray(p["gates_kernel"]).reshape(d, num_mixtures + 1, V)
    gate_ref = gate_ours.transpose(0, 2, 1).reshape(d, V * (num_mixtures + 1))
    exp_ours = np.asarray(p["experts_kernel"]).reshape(d, num_mixtures, V)
    exp_ref = exp_ours.transpose(0, 2, 1).reshape(d, V * num_mixtures)
    bias_ours = np.asarray(p["experts_bias"]).reshape(num_mixtures, V)
    bias_ref = bias_ours.transpose(1, 0).reshape(V * num_mixtures)

    gate_activations = tf.matmul(tf.constant(x), tf.constant(gate_ref))  # no bias
    expert_activations = tf.matmul(tf.constant(x), tf.constant(exp_ref)) + bias_ref
    gating = tf.nn.softmax(tf.reshape(gate_activations, [-1, num_mixtures + 1]))
    expert = tf.nn.sigmoid(tf.reshape(expert_activations, [-1, num_mixtures]))
    probs = tf.reduce_sum(gating[:, :num_mixtures] * expert, 1)
    want = tf.reshape(probs, [-1, V]).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_logistic_golden(rng):
    cfg = ModelConfig(vocab_size=V)
    m = create_model("LogisticModel", cfg)
    x = rng.normal(size=(5, 8)).astype(np.float32)
    variables = m.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(m.apply(variables, jnp.asarray(x))["predictions"])

    p = variables["params"]["fc"]
    want = tf.sigmoid(
        tf.matmul(tf.constant(x), tf.constant(np.asarray(p["kernel"])))
        + tf.constant(np.asarray(p["bias"]))
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_frame_level_logistic_golden(rng):
    """Sum-over-padded-frames / num_frames semantics (ref: FrameLevelLogisticModel)."""
    cfg = ModelConfig(vocab_size=V)
    m = create_model("FrameLevelLogisticModel", cfg)
    x = rng.normal(size=(4, 10, 8)).astype(np.float32)
    nf = np.array([10, 3, 7, 1], np.int32)
    # zero-pad beyond num_frames like the reader does
    for i, n in enumerate(nf):
        x[i, n:] = 0.0
    variables = m.init(jax.random.key(0), jnp.asarray(x), num_frames=jnp.asarray(nf))
    got = np.asarray(
        m.apply(variables, jnp.asarray(x), num_frames=jnp.asarray(nf))["predictions"]
    )

    p = variables["params"]["fc"]
    denom = tf.cast(tf.reshape(nf, [-1, 1]), tf.float32)
    avg = tf.reduce_sum(tf.constant(x), axis=[1]) / denom
    want = tf.sigmoid(
        tf.matmul(avg, tf.constant(np.asarray(p["kernel"])))
        + tf.constant(np.asarray(p["bias"]))
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frame_level_logistic_uint8_padding(rng):
    """Padding in uint8 space must not leak into the pooled mean.

    The pipeline zero-pads BEFORE dequantize; dequantize(0) = -1.992 and
    ℓ2-normalize makes the pad rows nonzero constants.  The model must mask
    them so its output equals the reference's zero-pad-after-dequantize
    semantics (advisor round-1 medium finding)."""
    from learnablepoolingmethods_tpu.core.step import preprocess_input

    cfg = ModelConfig(vocab_size=V)
    m = create_model("FrameLevelLogisticModel", cfg)
    feats = rng.integers(0, 256, size=(4, 10, 8), dtype=np.uint8)
    nf = np.array([10, 3, 7, 1], np.int32)
    for i, n in enumerate(nf):
        feats[i, n:] = 0  # uint8-space padding, as readers.py produces
    x = preprocess_input(jnp.asarray(feats))  # dequantize → ℓ2-normalize
    variables = m.init(jax.random.key(0), x, num_frames=jnp.asarray(nf))
    got = np.asarray(
        m.apply(variables, x, num_frames=jnp.asarray(nf))["predictions"]
    )

    # reference semantics: zero the pad rows AFTER dequantize+normalize
    x_ref = np.array(x)  # writable copy
    for i, n in enumerate(nf):
        x_ref[i, n:] = 0.0
    p = variables["params"]["fc"]
    denom = tf.cast(tf.reshape(nf, [-1, 1]), tf.float32)
    avg = tf.reduce_sum(tf.constant(x_ref), axis=[1]) / denom
    want = tf.sigmoid(
        tf.matmul(avg, tf.constant(np.asarray(p["kernel"])))
        + tf.constant(np.asarray(p["bias"]))
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_random_frames_distribution_and_determinism(rng):
    """Index distribution matches floor(U·num_frames); same key → same sample."""
    x = jnp.asarray(rng.normal(size=(2, 20, 3)).astype(np.float32))
    nf = jnp.asarray([20, 5])
    key = jax.random.key(7)
    s1 = model_utils.sample_random_frames(x, nf, 50, key)
    s2 = model_utils.sample_random_frames(x, nf, 50, key)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert s1.shape == (2, 50, 3)
    # row 1 only ever samples from its first 5 valid frames
    valid = np.asarray(x)[1, :5]
    sampled = np.asarray(s1)[1]
    for row in sampled:
        assert any(np.allclose(row, v) for v in valid)


def test_sample_random_sequence_window(rng):
    x = jnp.asarray(rng.normal(size=(1, 20, 2)).astype(np.float32))
    nf = jnp.asarray([12])
    out = model_utils.sample_random_sequence(x, nf, 5, jax.random.key(3))
    # contiguous window entirely within the valid prefix
    xs = np.asarray(x)[0]
    got = np.asarray(out)[0]
    starts = [
        s for s in range(12) if np.allclose(xs[s : s + 5], got) and s + 5 <= 12
    ]
    assert starts, "sampled window not found as contiguous valid slice"


def test_frame_pooling_golden(rng):
    x = rng.normal(size=(3, 7, 5)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(model_utils.frame_pooling(jnp.asarray(x), "max")),
        tf.reduce_max(tf.constant(x), 1).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model_utils.frame_pooling(jnp.asarray(x), "average")),
        tf.reduce_mean(tf.constant(x), 1).numpy(),
        atol=1e-6,
    )
    try:
        model_utils.frame_pooling(jnp.asarray(x), "bogus")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_l2_normalize_golden(rng):
    from learnablepoolingmethods_tpu.ops.normalize import l2_normalize

    x = rng.normal(size=(4, 9)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(l2_normalize(jnp.asarray(x), axis=-1)),
        tf.nn.l2_normalize(tf.constant(x), axis=-1).numpy(),
        atol=1e-6,
    )
    # zero-vector row: both return zeros, no NaN
    z = np.zeros((1, 5), np.float32)
    got = np.asarray(l2_normalize(jnp.asarray(z), axis=-1))
    np.testing.assert_array_equal(got, np.zeros_like(z))
