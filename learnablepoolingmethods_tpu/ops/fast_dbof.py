"""BN-folded fast inference path for DbofModel (BASELINE config 3).

DBoF's ops are already dense MXU matmuls (cluster projection [1152→8192],
hidden [8192→1024]) that XLA schedules well — no custom kernel needed.  The
wins here are algebraic, mirroring ops/fast_infer.py:

- uint8 frame sampling BEFORE dequantize (1 byte gathers; ℓ2-norm is
  row-wise so the reorder is exact);
- all three BatchNorms folded to affines (inference mode); the input-BN and
  cluster-BN affines fold INTO the cluster matmul:
      relu6((x·γᵢ + βᵢ)·W·γc/σc + …) = relu6(x·W′ + b′)
  with W′ = diag(in_scale)·W·diag(c_scale), b′ = in_bias·W·diag(c_scale)+c_bias
  — one matmul, zero elementwise prologue;
- the MoE head in the vocab-on-lanes layout (shared with the NetVLAD path).

Parity: tests/unit/test_fast_dbof.py vs model.apply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.ops.fast_infer import _fold_bn, _require_moe_head
from learnablepoolingmethods_tpu.ops.normalize import l2_normalize
from learnablepoolingmethods_tpu.ops.topk import top_k_exact
from learnablepoolingmethods_tpu.utils.quantization import dequantize


def prepare_fast_dbof_params(variables, mcfg: ModelConfig, compute_dtype=jnp.bfloat16):
    """Fold BNs (fusing input-BN + cluster-BN into the cluster matmul)."""
    if not mcfg.dbof_add_batch_norm:
        raise ValueError("fast DBoF path requires dbof_add_batch_norm=True")
    if not mcfg.sample_random_frames:
        raise ValueError(
            "fast path samples iid frames; --nosample_random_frames "
            "(contiguous windows) needs the flax forward"
        )
    p = variables["params"]
    s = variables["batch_stats"]
    ct = compute_dtype

    in_scale, in_bias = _fold_bn(p["input_bn"], s["input_bn"])
    c_scale, c_bias = _fold_bn(p["cluster_bn"], s["cluster_bn"])
    h_scale, h_bias = _fold_bn(p["hidden1_bn"], s["hidden1_bn"])

    w = p["cluster_weights"].astype(jnp.float32)          # [D, C]
    w_folded = (in_scale[:, None] * w) * c_scale[None, :]  # diag·W·diag
    b_folded = in_bias @ w * c_scale + c_bias              # [C]

    hw = p["hidden1_weights"].astype(jnp.float32) * h_scale[None, :]
    _require_moe_head(p, mcfg)
    moe = p["MoeModel_0"]
    return {
        "cluster_w": w_folded.astype(ct),
        "cluster_b": b_folded.astype(jnp.float32),
        "hidden_w": hw.astype(ct),
        "hidden_b": h_bias.astype(jnp.float32),
        "gates_kernel": moe["gates_kernel"].astype(ct),
        "experts_kernel": moe["experts_kernel"].astype(ct),
        "experts_bias": moe["experts_bias"].astype(jnp.float32),
    }


def build_fast_dbof_inference(
    mcfg: ModelConfig,
    top_k: int = 20,
    compute_dtype=jnp.bfloat16,
    return_probs: bool = False,
):
    """fn(fp, features_u8 [B,F,D], num_frames [B], rng) → top-k (or probs)."""
    m = mcfg.moe_num_mixtures
    v = mcfg.vocab_size
    iterations = mcfg.iterations
    ct = compute_dtype

    def forward(fp, features, num_frames, rng, presampled: bool = False):
        b = features.shape[0]
        if not presampled:
            from learnablepoolingmethods_tpu.models.model_utils import (
                sample_frame_features,
            )

            features = sample_frame_features(features, num_frames, iterations, rng)

        x = (
            dequantize(features, dtype=ct)
            if features.dtype == jnp.uint8
            else features.astype(ct)
        )
        x = l2_normalize(x, axis=-1)

        act = (
            jnp.einsum(
                "bfd,dc->bfc", x, fp["cluster_w"], preferred_element_type=jnp.float32
            )
            + fp["cluster_b"]
        )
        act = jnp.clip(act, 0.0, 6.0)                     # relu6
        if mcfg.dbof_pooling_method == "max":
            pooled = jnp.max(act, axis=1)                  # FramePooling "max"
        else:
            pooled = jnp.mean(act, axis=1)                 # "average"

        h = (
            jnp.matmul(
                pooled.astype(ct), fp["hidden_w"], preferred_element_type=jnp.float32
            )
            + fp["hidden_b"]
        )
        h = jnp.clip(h, 0.0, 6.0).astype(ct)

        ga = jnp.matmul(
            h, fp["gates_kernel"], preferred_element_type=jnp.float32
        ).reshape(b, m + 1, v)
        ea = (
            jnp.matmul(h, fp["experts_kernel"], preferred_element_type=jnp.float32)
            + fp["experts_bias"]
        ).reshape(b, m, v)
        probs = jnp.sum(
            jax.nn.softmax(ga, axis=1)[:, :m] * jax.nn.sigmoid(ea), axis=1
        )
        if return_probs:
            return probs
        return top_k_exact(probs, min(top_k, v))

    return forward
