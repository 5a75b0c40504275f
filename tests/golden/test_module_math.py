"""Golden-value tests: pooling-module math vs TF2 transcriptions.

The reference mount is unreadable (SURVEY.md provenance), so each reference
op's documented math (SURVEY.md §3.5) is transcribed into ~20 lines of TF2
and both implementations run with IDENTICAL weights (taken from flax init).
Agreement ≤1e-5 fp32 substitutes for the reference as parity oracle
(SURVEY.md §4 item 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import tensorflow as tf

from learnablepoolingmethods_tpu.models.modules import (
    ContextGating,
    NetFV,
    NetRVLAD,
    NetVLAD,
    SoftDBoW,
)

B, F, D, K = 3, 10, 16, 4


def _frames(rng):
    return rng.normal(size=(B, F, D)).astype(np.float32)


def _tf_netvlad(x, cw, cb, cw2):
    """TF2 transcription of video_pooling_modules.py#NetVLAD.forward (no BN)."""
    reshaped_input = tf.reshape(x, [-1, D])
    activation = tf.matmul(reshaped_input, cw) + cb
    activation = tf.nn.softmax(activation)
    activation = tf.reshape(activation, [-1, F, K])
    a_sum = tf.reduce_sum(activation, -2, keepdims=True)
    a = tf.multiply(a_sum, cw2)
    activation = tf.transpose(activation, perm=[0, 2, 1])
    reshaped_input = tf.reshape(reshaped_input, [-1, F, D])
    vlad = tf.matmul(activation, reshaped_input)
    vlad = tf.transpose(vlad, perm=[0, 2, 1])
    vlad = tf.subtract(vlad, a)
    vlad = tf.nn.l2_normalize(vlad, 1)
    vlad = tf.reshape(vlad, [-1, K * D])
    vlad = tf.nn.l2_normalize(vlad, 1)
    return vlad.numpy()


def test_netvlad_golden(rng):
    x = _frames(rng)
    mod = NetVLAD(feature_size=D, max_frames=F, cluster_size=K, add_batch_norm=False)
    variables = mod.init(jax.random.key(0), jnp.asarray(x))
    p = variables["params"]
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))
    want = _tf_netvlad(
        tf.constant(x),
        tf.constant(np.asarray(p["cluster_weights"])),
        tf.constant(np.asarray(p["cluster_biases"])),
        tf.constant(np.asarray(p["cluster_weights2"])),
    )
    assert got.shape == (B, D * K)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_netrvlad_golden(rng):
    x = _frames(rng)
    mod = NetRVLAD(feature_size=D, max_frames=F, cluster_size=K, add_batch_norm=False)
    variables = mod.init(jax.random.key(0), jnp.asarray(x))
    p = variables["params"]
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    reshaped_input = tf.reshape(tf.constant(x), [-1, D])
    activation = tf.matmul(reshaped_input, tf.constant(np.asarray(p["cluster_weights"])))
    activation = activation + tf.constant(np.asarray(p["cluster_biases"]))
    activation = tf.nn.softmax(activation)
    activation = tf.reshape(activation, [-1, F, K])
    activation = tf.transpose(activation, perm=[0, 2, 1])
    vlad = tf.matmul(activation, tf.reshape(reshaped_input, [-1, F, D]))
    vlad = tf.transpose(vlad, perm=[0, 2, 1])
    vlad = tf.nn.l2_normalize(vlad, 1)
    vlad = tf.reshape(vlad, [-1, K * D])
    vlad = tf.nn.l2_normalize(vlad, 1)
    np.testing.assert_allclose(got, vlad.numpy(), atol=1e-5)


def test_softdbow_golden(rng):
    x = _frames(rng)
    mod = SoftDBoW(feature_size=D, max_frames=F, cluster_size=K, add_batch_norm=False)
    variables = mod.init(jax.random.key(0), jnp.asarray(x))
    p = variables["params"]
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    reshaped_input = tf.reshape(tf.constant(x), [-1, D])
    activation = tf.matmul(reshaped_input, tf.constant(np.asarray(p["cluster_weights"])))
    activation = activation + tf.constant(np.asarray(p["cluster_biases"]))
    activation = tf.nn.softmax(activation)
    activation = tf.reshape(activation, [-1, F, K])
    bow = tf.reduce_sum(activation, 1)
    bow = tf.nn.l2_normalize(bow, 1)
    np.testing.assert_allclose(got, bow.numpy(), atol=1e-5)


def test_netfv_golden(rng):
    x = _frames(rng)
    mod = NetFV(feature_size=D, max_frames=F, cluster_size=K, add_batch_norm=False)
    variables = mod.init(jax.random.key(0), jnp.asarray(x))
    p = variables["params"]
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    cw = tf.constant(np.asarray(p["cluster_weights"]))
    cb = tf.constant(np.asarray(p["cluster_biases"]))
    cw2 = tf.constant(np.asarray(p["cluster_weights2"]))
    covar = tf.square(tf.constant(np.asarray(p["covar_weights"]))) + 1e-6

    reshaped_input = tf.reshape(tf.constant(x), [-1, D])
    activation = tf.nn.softmax(tf.matmul(reshaped_input, cw) + cb)
    activation = tf.reshape(activation, [-1, F, K])
    a_sum = tf.reduce_sum(activation, -2, keepdims=True)
    a = tf.multiply(a_sum, cw2)
    activation_t = tf.transpose(activation, perm=[0, 2, 1])
    xb = tf.reshape(reshaped_input, [-1, F, D])
    fv1 = tf.transpose(tf.matmul(activation_t, xb), perm=[0, 2, 1])

    a2 = tf.multiply(a_sum, tf.square(cw2))
    b2 = tf.multiply(fv1, cw2)
    fv2 = tf.transpose(tf.matmul(activation_t, tf.square(xb)), perm=[0, 2, 1])
    fv2 = a2 + fv2 - 2 * b2
    fv2 = tf.divide(fv2, tf.square(covar))
    fv2 = tf.subtract(fv2, a_sum)
    fv2 = tf.nn.l2_normalize(fv2, 1)
    fv2 = tf.reshape(fv2, [-1, K * D])
    fv2 = tf.nn.l2_normalize(fv2, 1)

    fv1 = tf.subtract(fv1, a)
    fv1 = tf.divide(fv1, covar)
    fv1 = tf.nn.l2_normalize(fv1, 1)
    fv1 = tf.reshape(fv1, [-1, K * D])
    fv1 = tf.nn.l2_normalize(fv1, 1)

    want = tf.concat([fv1, fv2], 1).numpy()
    assert got.shape == (B, 2 * D * K)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_context_gating_golden(rng):
    h = rng.normal(size=(B, D)).astype(np.float32)
    mod = ContextGating(add_batch_norm=False)
    variables = mod.init(jax.random.key(0), jnp.asarray(h))
    p = variables["params"]
    got = np.asarray(mod.apply(variables, jnp.asarray(h)))

    gates = tf.matmul(tf.constant(h), tf.constant(np.asarray(p["gating_weights"])))
    gates = gates + tf.constant(np.asarray(p["gating_biases"]))
    gates = tf.sigmoid(gates)
    want = tf.multiply(tf.constant(h), gates).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_batch_norm_matches_tf_train_mode(rng):
    """flax BatchNorm (train) ≡ batch-stats BN transcription (slim eps=1e-3)."""
    import flax.linen as nn

    x = rng.normal(size=(32, K)).astype(np.float32)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.999, epsilon=1e-3)
    variables = bn.init(jax.random.key(0), jnp.asarray(x))
    got, _ = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

    mean, var = tf.nn.moments(tf.constant(x), axes=[0])
    want = tf.nn.batch_normalization(tf.constant(x), mean, var, 0.0, 1.0, 1e-3).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_nextvlad_matches_explicit_loop(rng):
    """NeXtVLAD (bonus module, arXiv:1811.05014): the einsum aggregation must
    equal an explicit per-(frame, group) loop on tiny tensors."""
    import flax.linen as nn

    from learnablepoolingmethods_tpu.models.modules import NeXtVLAD

    b, f, d, g, k, lam = 2, 3, 4, 2, 3, 2
    mod = NeXtVLAD(
        feature_size=d, max_frames=f, cluster_size=k, groups=g, expansion=lam,
        add_batch_norm=False,
    )
    x = rng.normal(size=(b, f, d)).astype(np.float32)
    variables = mod.init(jax.random.key(0), jnp.asarray(x))
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    w_e = np.asarray(p["expansion_weights"])      # [d, lam*d]
    w_g = np.asarray(p["group_attention_weights"])  # [lam*d, g]
    w_a = np.asarray(p["cluster_weights"])        # [lam*d, g*k]
    c2 = np.asarray(p["cluster_weights2"])        # [k, dp]
    dp = lam * d // g

    def sigmoid(z):
        return 1 / (1 + np.exp(-z))

    def softmax(z):
        e = np.exp(z - z.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    want = np.zeros((b, k * dp), np.float32)
    for bi in range(b):
        vlad = np.zeros((k, dp))
        for fi in range(f):
            xt = x[bi, fi] @ w_e                          # [lam*d]
            alpha = sigmoid(xt @ w_g)                     # [g]
            logits = (xt @ w_a).reshape(g, k)
            a = softmax(logits)                           # [g, k]
            xg = xt.reshape(g, dp)
            for gi in range(g):
                for ki in range(k):
                    vlad[ki] += alpha[gi] * a[gi, ki] * (xg[gi] - c2[ki])
        # intra-normalize over dp
        vlad = vlad / np.maximum(
            np.linalg.norm(vlad, axis=-1, keepdims=True), 1e-30
        )
        want[bi] = vlad.reshape(-1)
    np.testing.assert_allclose(got, want, atol=2e-5)
