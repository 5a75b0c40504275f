"""Video-level classifier heads (ref: video_level_models.py).

These consume one fixed-size vector per video — either raw video-level
features ([B, 1152]) or the output of a frame-level aggregator — and emit
``{"predictions": [B, vocab_size]}`` probabilities.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from learnablepoolingmethods_tpu.models.base import BaseModel, register_model


@register_model
class LogisticModel(BaseModel):
    """One sigmoid FC over the input (ref: video_level_models.py#LogisticModel).

    BASELINE config 1 (CPU-runnable).  slim default init (xavier uniform) and
    bias; L2 penalty applied globally by the train step.
    """

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        logits = nn.Dense(
            self.cfg.vocab_size,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=dtype,
            param_dtype=jnp.dtype(self.cfg.param_dtype),
            name="fc",
        )(model_input.astype(dtype))
        output = nn.sigmoid(logits.astype(jnp.float32))
        return {"predictions": output}


@register_model
class MoeModel(BaseModel):
    """Per-class mixture of experts (ref: video_level_models.py#MoeModel).

    gates:   FC (no bias) → [B, V, M+1] softmax   (extra "dummy" expert)
    experts: FC (bias)    → [B, V, M]   sigmoid
    p(c)   = Σ_m gate_m · expert_m

    BASELINE config 2, and the default head of every frame-level model via
    ``--video_level_classifier_model``.  Both FCs are single dense matmuls
    [B, D] × [D, V·(2M+1)]-equivalent — MXU-friendly, fused by XLA; the
    dedicated fused-head op lives in ops/moe_head.py.
    """

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        cfg = self.cfg
        num_mixtures = cfg.moe_num_mixtures
        vocab_size = cfg.vocab_size
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        x = model_input.astype(dtype)

        gate_activations = nn.Dense(
            vocab_size * (num_mixtures + 1),
            use_bias=False,  # ref: biases_initializer=None on gates
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=dtype,
            param_dtype=pdtype,
            name="gates",
        )(x)
        expert_activations = nn.Dense(
            vocab_size * num_mixtures,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=dtype,
            param_dtype=pdtype,
            name="experts",
        )(x)

        gating_distribution = nn.softmax(
            gate_activations.reshape(-1, num_mixtures + 1).astype(jnp.float32), axis=-1
        )
        expert_distribution = nn.sigmoid(
            expert_activations.reshape(-1, num_mixtures).astype(jnp.float32)
        )
        final_probabilities = jnp.sum(
            gating_distribution[:, :num_mixtures] * expert_distribution, axis=1
        ).reshape(-1, vocab_size)
        return {"predictions": final_probabilities}
