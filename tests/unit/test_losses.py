"""Loss golden tests vs TF2 transcriptions of the reference formulas (losses.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from learnablepoolingmethods_tpu import losses


@pytest.fixture
def batch(rng):
    preds = rng.uniform(0.01, 0.99, size=(8, 25)).astype(np.float32)
    labels = (rng.uniform(size=(8, 25)) < 0.2).astype(np.float32)
    return preds, labels


def test_cross_entropy_golden(batch):
    import tensorflow as tf

    preds, labels = batch
    epsilon = 10e-6
    fl = tf.cast(labels, tf.float32)
    ce = fl * tf.math.log(preds + epsilon) + (1 - fl) * tf.math.log(1 - preds + epsilon)
    golden = tf.reduce_mean(tf.reduce_sum(-ce, 1)).numpy()

    got = losses.CrossEntropyLoss().calculate_loss(jnp.asarray(preds), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), golden, rtol=1e-6)


def test_hinge_golden(batch):
    import tensorflow as tf

    preds, labels = batch
    fl = tf.cast(labels, tf.float32)
    sign = 2 * fl - tf.ones_like(fl)
    hinge = tf.maximum(tf.zeros_like(preds), tf.ones_like(preds) * 1.0 - sign * preds)
    golden = tf.reduce_mean(tf.reduce_sum(hinge, 1)).numpy()

    got = losses.HingeLoss().calculate_loss(jnp.asarray(preds), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), golden, rtol=1e-6)


def test_softmax_golden(batch):
    import tensorflow as tf

    preds, labels = batch
    epsilon = 10e-8
    fl = tf.cast(labels, tf.float32)
    rowsum = tf.maximum(tf.reduce_sum(fl, 1, keepdims=True), epsilon)
    norm = fl / rowsum
    sm = tf.nn.softmax(preds)
    golden = tf.reduce_mean(-tf.reduce_sum(norm * tf.math.log(sm), 1)).numpy()

    got = losses.SoftmaxLoss().calculate_loss(jnp.asarray(preds), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), golden, rtol=1e-5)


def test_cross_entropy_zero_at_perfect():
    preds = jnp.array([[1.0, 0.0]])
    labels = jnp.array([[1.0, 0.0]])
    loss = losses.CrossEntropyLoss().calculate_loss(preds, labels)
    assert float(loss) < 1e-4


def test_losses_are_differentiable():
    import jax

    preds = jnp.array([[0.3, 0.7], [0.6, 0.2]])
    labels = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    for loss_cls in (losses.CrossEntropyLoss, losses.HingeLoss, losses.SoftmaxLoss):
        g = jax.grad(lambda p: loss_cls().calculate_loss(p, labels))(preds)
        assert np.all(np.isfinite(np.asarray(g)))
