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
    BN-folded fused head used at inference lives in ops/fast_infer.py.
    """

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        cfg = self.cfg
        num_mixtures = cfg.moe_num_mixtures
        vocab_size = cfg.vocab_size
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        x = model_input.astype(dtype)
        in_dim = x.shape[-1]

        # TPU layout note: kernels are stored vocab-major ([D, (M+1)·V] with
        # column m·V + v) so the gate softmax / expert sigmoid run on
        # [B, M+1, V] — mixtures on sublanes, vocab on lanes.  The reference
        # layout ([D, V·(M+1)] → reshape(-1, M+1)) puts a 3-wide axis on the
        # 128-lane dimension, wasting 97% of the VPU (measured 4× slower).
        # Mathematically this is the same model with columns relabeled; the
        # golden test maps layouts explicitly.
        gates_kernel = self.param(
            "gates_kernel",
            nn.initializers.xavier_uniform(),
            (in_dim, (num_mixtures + 1) * vocab_size),
            pdtype,
        )
        experts_kernel = self.param(
            "experts_kernel",
            nn.initializers.xavier_uniform(),
            (in_dim, num_mixtures * vocab_size),
            pdtype,
        )
        experts_bias = self.param(
            "experts_bias",
            nn.initializers.zeros_init(),
            (num_mixtures * vocab_size,),
            pdtype,
        )

        gate_activations = jnp.matmul(
            x, gates_kernel.astype(dtype), preferred_element_type=jnp.float32
        ).reshape(-1, num_mixtures + 1, vocab_size)
        expert_activations = (
            jnp.matmul(
                x, experts_kernel.astype(dtype), preferred_element_type=jnp.float32
            )
            + experts_bias.astype(jnp.float32)
        ).reshape(-1, num_mixtures, vocab_size)

        gating_distribution = nn.softmax(gate_activations, axis=1)
        expert_distribution = nn.sigmoid(expert_activations)
        final_probabilities = jnp.sum(
            gating_distribution[:, :num_mixtures] * expert_distribution, axis=1
        )
        return {"predictions": final_probabilities}
