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

from typing import Any, NamedTuple

import jax
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
    # rebuild-only: the Adam update is HBM-bound (~24 bytes/param/step at
    # the measured bandwidth floor); Adafactor's factored second moment
    # shrinks optimizer state ~3x for the 278528x1024 hidden FC that is 96%
    # of the Willow model's params.
    "AdafactorOptimizer": lambda lr: optax.adafactor(
        lr, min_dim_size_to_factor=128
    ),
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


class Fp32MasterState(NamedTuple):
    master: Any  # fp32 master copy of the (bf16-stored) params
    inner: Any   # the wrapped transformation's state


def with_fp32_master(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Mixed-precision optimizer wrapper: bf16 params, fp32 master.

    Storing params in bfloat16 halves the weight-read traffic of the forward
    AND backward passes (the Willow hidden FC alone is ~1.1 GB fp32) and
    halves the gradient write (cotangents take the param dtype).  To keep
    Adam's accumulation exact, the optimizer state carries an fp32 master
    copy: the inner transformation runs entirely in fp32 on the master, and
    the emitted update is ``new_master − float32(param)`` — since optax
    applies updates as ``(p + u).astype(p.dtype)`` with fp32 promotion, the
    stored param lands on ``bfloat16(new_master)`` (at most 1 ulp of bf16
    rounding noise from the fp32 subtract).

    Step-equivalence vs an all-fp32 run is bounded by bf16 weight rounding
    only — verified in tests/unit/test_optimizers.py.
    """

    def init_fn(params):
        master = jax.tree.map(lambda p: jnp.asarray(p, jnp.float32), params)
        return Fp32MasterState(master=master, inner=inner.init(master))

    def update_fn(updates, state, params=None):
        g32 = jax.tree.map(lambda g: jnp.asarray(g, jnp.float32), updates)
        inner_updates, inner_state = inner.update(g32, state.inner, state.master)
        new_master = optax.apply_updates(state.master, inner_updates)
        if params is None:
            return inner_updates, Fp32MasterState(new_master, inner_state)
        deltas = jax.tree.map(
            lambda m, p: m - p.astype(jnp.float32), new_master, params
        )
        return deltas, Fp32MasterState(new_master, inner_state)

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


def create_optimizer(cfg: TrainingConfig):
    """Returns an optax.GradientTransformation — or a FusedAdam (which
    TrainState drives through its ``fused_apply`` method instead)."""
    try:
        opt_fn = _OPTIMIZERS[cfg.optimizer]
    except KeyError:
        raise ValueError(
            f"Unknown optimizer {cfg.optimizer!r}. Known: {sorted(_OPTIMIZERS)}"
        ) from None
    if getattr(cfg, "fused_adam", False):
        if cfg.optimizer != "AdamOptimizer":
            raise ValueError("--fused_adam requires --optimizer=AdamOptimizer")
        from learnablepoolingmethods_tpu.ops.fused_adam import FusedAdam

        return FusedAdam(
            learning_rate_schedule(cfg),
            clip_norm=cfg.clip_gradient_norm if cfg.clip_gradient_norm > 0 else None,
        )
    if cfg.optimizer == "AdamOptimizer" and getattr(cfg, "adam_bf16_momentum", False):
        opt_fn = _ADAM_BF16
    schedule = learning_rate_schedule(cfg)
    chain = []
    if cfg.clip_gradient_norm > 0:
        chain.append(clip_gradient_norms(cfg.clip_gradient_norm))
    chain.append(opt_fn(schedule))
    tx = optax.chain(*chain)
    if getattr(cfg, "fp32_master", False):
        tx = with_fp32_master(tx)
    return tx
