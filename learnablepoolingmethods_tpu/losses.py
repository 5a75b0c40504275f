"""Multi-label classification losses (ref: losses.py).

Each loss consumes **post-activation predictions** in [0, 1] (the model zoo
emits probabilities, not logits — ref: models return sigmoid/MoE outputs) and
a dense multi-hot label matrix, returning a scalar: the per-example
class-summed loss averaged over the batch.

Selected by name via ``--label_loss`` exactly like the reference
(train.py#build_graph → find_class_by_name(FLAGS.label_loss, [losses])).

All math is jnp and shape-static, so every loss is jit/grad/vmap-safe and
fuses into the backward pass on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


class BaseLoss:
    """Loss contract (ref: losses.py#BaseLoss.calculate_loss).

    ``calculate_per_example_loss`` returns the per-video loss [B] (class-sum);
    ``calculate_loss`` is its batch mean — exactly the reference scalar.  The
    per-example form lets the train/eval steps weight out end-of-data padding
    rows without changing reference semantics on full batches.
    """

    def calculate_per_example_loss(self, predictions, labels, **params):
        raise NotImplementedError()

    def calculate_loss(self, predictions, labels, **params):
        return jnp.mean(self.calculate_per_example_loss(predictions, labels, **params))


class CrossEntropyLoss(BaseLoss):
    """Epsilon-clipped multi-label sigmoid cross entropy.

    (ref: losses.py#CrossEntropyLoss — epsilon 10e-6, sum over classes,
    mean over batch.)
    """

    def calculate_per_example_loss(self, predictions, labels, **unused_params):
        epsilon = 10e-6
        float_labels = labels.astype(predictions.dtype)
        cross_entropy_loss = float_labels * jnp.log(predictions + epsilon) + (
            1.0 - float_labels
        ) * jnp.log(1.0 - predictions + epsilon)
        return jnp.sum(-cross_entropy_loss, axis=1)


class HingeLoss(BaseLoss):
    """Per-class hinge loss on ±1 labels with margin ``b``.

    (ref: losses.py#HingeLoss — hinge = max(0, b·1 − sign(labels)·preds),
    sum over classes, mean over batch.)
    """

    def calculate_per_example_loss(self, predictions, labels, b=1.0, **unused_params):
        float_labels = labels.astype(predictions.dtype)
        sign_labels = 2.0 * float_labels - 1.0
        hinge_loss = jnp.maximum(0.0, b - sign_labels * predictions)
        return jnp.sum(hinge_loss, axis=1)


class SoftmaxLoss(BaseLoss):
    """Softmax cross entropy against the row-normalized label distribution.

    (ref: losses.py#SoftmaxLoss — epsilon 10e-8 on the label row-sum,
    softmax over predictions, mean over batch.)
    """

    def calculate_per_example_loss(self, predictions, labels, **unused_params):
        epsilon = 10e-8
        float_labels = labels.astype(predictions.dtype)
        label_rowsum = jnp.maximum(
            jnp.sum(float_labels, axis=1, keepdims=True), epsilon
        )
        norm_float_labels = float_labels / label_rowsum
        # Numerically-stable log-softmax (the reference computes
        # log(softmax(x)) directly; identical value, better conditioning).
        log_softmax = predictions - jnp.max(predictions, axis=1, keepdims=True)
        log_softmax = log_softmax - jnp.log(
            jnp.sum(jnp.exp(log_softmax), axis=1, keepdims=True)
        )
        return -jnp.sum(norm_float_labels * log_softmax, axis=1)
