"""Optimizer + LR schedule factory (ref: train.py#build_graph).

Reference semantics preserved:
- ``tf.train.exponential_decay(base_lr, global_step * batch_size,
  learning_rate_decay_examples, learning_rate_decay)`` — continuous decay in
  *examples seen*, expressed here as an optax schedule in steps.
- ``--optimizer`` name dispatch (AdamOptimizer default).
- ``utils.py#clip_gradient_norms`` clips each gradient tensor's norm
  **individually** (not the global norm) — reproduced as a custom optax
  transform.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from learnablepoolingmethods_tpu.config import TrainingConfig

_OPTIMIZERS = {
    "AdamOptimizer": optax.adam,
    "AdagradOptimizer": optax.adagrad,
    "RMSPropOptimizer": optax.rmsprop,
    "GradientDescentOptimizer": optax.sgd,
    "SgdOptimizer": optax.sgd,
    "MomentumOptimizer": lambda lr: optax.sgd(lr, momentum=0.9),
}

_ADAM_BF16 = lambda lr: optax.adam(lr, mu_dtype=jnp.bfloat16)


def clip_gradient_norms(max_norm: float) -> optax.GradientTransformation:
    """Per-leaf norm clipping (ref: utils.py#clip_gradient_norms /
    tf.clip_by_norm applied to each gradient independently)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-20))
            return (g * scale).astype(g.dtype)

        import jax

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def learning_rate_schedule(cfg: TrainingConfig) -> optax.Schedule:
    """lr(step) = base · decay^(step · batch_size / decay_examples)."""
    transition_steps = max(
        int(cfg.learning_rate_decay_examples / max(cfg.batch_size, 1)), 1
    )
    return optax.exponential_decay(
        init_value=cfg.base_learning_rate,
        transition_steps=transition_steps,
        decay_rate=cfg.learning_rate_decay,
        staircase=False,
    )


def create_optimizer(cfg: TrainingConfig) -> optax.GradientTransformation:
    try:
        opt_fn = _OPTIMIZERS[cfg.optimizer]
    except KeyError:
        raise ValueError(
            f"Unknown optimizer {cfg.optimizer!r}. Known: {sorted(_OPTIMIZERS)}"
        ) from None
    if cfg.optimizer == "AdamOptimizer" and getattr(cfg, "adam_bf16_momentum", False):
        opt_fn = _ADAM_BF16
    schedule = learning_rate_schedule(cfg)
    chain = []
    if cfg.clip_gradient_norm > 0:
        chain.append(clip_gradient_norms(cfg.clip_gradient_norm))
    chain.append(opt_fn(schedule))
    return optax.chain(*chain)
