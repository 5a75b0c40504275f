"""Speed-of-light inference path for the flagship GatedNetVLAD model.

Builds, from a trained ``NetVLADModelLF`` variables pytree, a single fused
jittable forward with every inference-time algebraic simplification applied:

- frame sampling moved BEFORE dequantize (uint8 gather — 1 byte/row instead
  of 2, and only sampled rows get dequantized/normalized; ℓ2-normalize is
  row-wise so this commutes with the reference's order);
- every BatchNorm folded to a per-channel affine (inference mode);
- NetVLAD aggregation via the fused Pallas kernel (ops/netvlad_pallas.py) —
  assignment softmax + residual aggregation + both normalizations in VMEM;
- the 278528×1024 hidden FC split into per-modality matmuls (no concat
  materialization), weights bf16;
- context gating + MoE head in the vocab-on-lanes layout (mixture axis on
  sublanes — the reference layout wastes 97% of the VPU, measured 4×);
- exact on-device top-k.

Usage (weights are ARGUMENTS, never closure constants — closed-over arrays
become inlined HLO constants, which bloats the compile payload by the full
weight size):

    fp = prepare_fast_params(variables, mcfg)          # fold + cast, on host
    fn = build_fast_netvlad_inference(mcfg, top_k=20)  # static config only
    values, indices = jax.jit(fn)(fp, features_u8, num_frames, rng)

Semantics match ``model.apply`` (training=False) with ``presampled`` inputs —
see tests/unit/test_fast_infer.py for the parity check.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.ops.netvlad_pallas import netvlad_fused, netvlad_reference
from learnablepoolingmethods_tpu.ops.normalize import l2_normalize
from learnablepoolingmethods_tpu.ops.topk import top_k_exact
from learnablepoolingmethods_tpu.utils.quantization import dequantize

BN_EPSILON = 1e-3


def _fold_bn(params_bn: Dict[str, Any], stats_bn: Dict[str, Any]):
    scale = params_bn["scale"] / jnp.sqrt(stats_bn["var"] + BN_EPSILON)
    bias = params_bn["bias"] - stats_bn["mean"] * scale
    return scale.astype(jnp.float32), bias.astype(jnp.float32)


def _require_moe_head(params: Dict[str, Any], mcfg: ModelConfig):
    """Every gated fast path hard-codes the MoE tail; fail with a clean
    'unsupported config' error instead of a KeyError when the model was
    built with a different --video_level_classifier_model."""
    if mcfg.video_level_classifier_model != "MoeModel" or "MoeModel_0" not in params:
        raise ValueError(
            "fast path supports only the MoeModel classifier head "
            f"(got --video_level_classifier_model="
            f"{mcfg.video_level_classifier_model!r}); use the flax forward"
        )


def gated_moe_tail(fp, h, m: int, v: int, ct, top_k: int, return_probs: bool):
    """Folded context gating + vocab-on-lanes MoE + exact top-k — the tail
    shared by every gated LF fast path (fp keys: gate_w/g_scale/g_bias/
    gates_kernel/experts_kernel/experts_bias)."""
    b = h.shape[0]
    gates = (
        jnp.matmul(h.astype(ct), fp["gate_w"], preferred_element_type=jnp.float32)
        * fp["g_scale"]
        + fp["g_bias"]
    )
    h = (h * jax.nn.sigmoid(gates)).astype(ct)

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


def prepare_fast_params(
    variables: Dict[str, Any],
    mcfg: ModelConfig,
    compute_dtype=jnp.bfloat16,
    int8_hidden: bool = False,
) -> Dict[str, Any]:
    """Fold BNs and cast weights once, on host → a flat param pytree.

    ``int8_hidden``: store the giant hidden FC weight int8 (per-column
    scales; XLA fuses the s8→bf16 convert into the dot's operand stream,
    ops/int8_matmul.py) — the FC is HBM-bound at B≤256, so halving its
    weight bytes buys ~1.8× on that stage (+14% end-to-end); the measured
    GAP impact is within the 1e-3 north-star budget (BASELINE.md)."""
    if not mcfg.netvlad_add_batch_norm or mcfg.netvlad_relu or not mcfg.gating:
        raise ValueError(
            "fast path supports the Willow config (BN on, relu off, gating on)"
        )
    if mcfg.netvlad_dimred > 0:
        raise ValueError("fast path does not support --netvlad_dimred")
    if not mcfg.sample_random_frames:
        raise ValueError(
            "fast path samples iid frames; --nosample_random_frames "
            "(contiguous windows) needs the flax forward"
        )
    p = variables["params"]
    s = variables["batch_stats"]
    if "NetVLAD_1" not in p:
        raise ValueError(
            "fast NetVLAD path supports the two-modality (rgb+audio) "
            "layout; this checkpoint has a single pooling module "
            "(feature_size <= 128) — use the flax forward"
        )
    ct = compute_dtype
    k_rgb = mcfg.netvlad_cluster_size

    def vlad_consts(name):
        scale, bias = _fold_bn(p[name]["cluster_bn"], s[name]["cluster_bn"])
        return {
            "cluster": p[name]["cluster_weights"].astype(ct),
            "scale": scale,
            "bias": bias,
            "c2": p[name]["cluster_weights2"].astype(jnp.float32).reshape(
                p[name]["cluster_weights"].shape
            ),
        }

    rgb = vlad_consts("NetVLAD_0")
    aud = vlad_consts("NetVLAD_1")
    d_rgb = rgb["cluster"].shape[0]

    in_scale, in_bias = _fold_bn(p["input_bn"], s["input_bn"])
    g_scale, g_bias = _fold_bn(p["gating"]["gating_bn"], s["gating"]["gating_bn"])
    hidden_w = p["hidden1_weights"]
    _require_moe_head(p, mcfg)
    moe = p["MoeModel_0"]
    if int8_hidden:
        from learnablepoolingmethods_tpu.ops.int8_matmul import (
            quantize_weight_int8,
        )

        rgb_q, rgb_s = quantize_weight_int8(hidden_w[: d_rgb * k_rgb])
        aud_q, aud_s = quantize_weight_int8(hidden_w[d_rgb * k_rgb :])
        hidden = {
            "w_rgb_q": jnp.asarray(rgb_q),
            "w_rgb_s": jnp.asarray(rgb_s),
            "w_aud_q": jnp.asarray(aud_q),
            "w_aud_s": jnp.asarray(aud_s),
        }
    else:
        hidden = {
            "w_rgb": hidden_w[: d_rgb * k_rgb].astype(ct),
            "w_aud": hidden_w[d_rgb * k_rgb :].astype(ct),
        }
    return {
        "in_scale": in_scale,
        "in_bias": in_bias,
        "rgb": rgb,
        "aud": aud,
        **hidden,
        "hidden_b": p["hidden1_biases"].astype(jnp.float32),
        "gate_w": p["gating"]["gating_weights"].astype(ct),
        "g_scale": g_scale,
        "g_bias": g_bias,
        "gates_kernel": moe["gates_kernel"].astype(ct),       # [H, (M+1)·V]
        "experts_kernel": moe["experts_kernel"].astype(ct),   # [H, M·V]
        "experts_bias": moe["experts_bias"].astype(jnp.float32),
    }


def build_fast_netvlad_inference(
    mcfg: ModelConfig,
    top_k: int = 20,
    use_pallas: bool = True,
    pallas_interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    fuse_frontend: bool = True,
    return_probs: bool = False,
):
    """Return fn(fast_params, features, num_frames, rng, presampled=False)
    → (values [B,k], indices [B,k]) — or the full probability matrix
    [B, V] when ``return_probs`` (the eval path feeds it to metric partials).
    Closure holds ONLY static config.

    ``fuse_frontend`` (TPU, uint8, unsampled input): run dequantize + ℓ2-norm
    + input BN + one-hot-matmul sampling + both NetVLADs as ONE Pallas kernel
    (ops/fused_frontend.py — measured 2.9× vs the staged path).
    """
    m = mcfg.moe_num_mixtures
    v = mcfg.vocab_size
    iterations = mcfg.iterations
    ct = compute_dtype

    def _netvlad(x, consts, d, k):
        if use_pallas:
            out = netvlad_fused(
                x, consts["cluster"], consts["scale"], consts["bias"],
                consts["c2"], interpret=pallas_interpret,
            )
        else:
            out = netvlad_reference(
                x, consts["cluster"], consts["scale"], consts["bias"], consts["c2"]
            )
        return out.reshape(-1, d * k)

    def forward(fp, features, num_frames, rng, presampled: bool = False):
        b = features.shape[0]
        d_rgb, k_rgb = fp["rgb"]["cluster"].shape
        d_aud, k_aud = fp["aud"]["cluster"].shape

        if (
            fuse_frontend
            and use_pallas
            and not presampled
            and features.dtype == jnp.uint8
            and ct == jnp.bfloat16  # the fused kernel is bf16-internal
        ):
            from learnablepoolingmethods_tpu.ops.fused_frontend import (
                netvlad_frontend_fused,
                sample_indices,
            )

            idx = sample_indices(rng, num_frames, features.shape[1], iterations)
            out_rgb, out_aud = netvlad_frontend_fused(
                features, idx,
                fp["in_scale"], fp["in_bias"],
                fp["rgb"]["cluster"], fp["rgb"]["scale"], fp["rgb"]["bias"], fp["rgb"]["c2"],
                fp["aud"]["cluster"], fp["aud"]["scale"], fp["aud"]["bias"], fp["aud"]["c2"],
                interpret=pallas_interpret,
            )
            vlad_rgb = out_rgb.reshape(b, d_rgb * k_rgb)
            vlad_aud = out_aud.reshape(b, d_aud * k_aud)
            return _tail(fp, vlad_rgb, vlad_aud, b)

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
        x = (x.astype(jnp.float32) * fp["in_scale"] + fp["in_bias"]).astype(ct)

        vlad_rgb = _netvlad(x[:, :, :d_rgb], fp["rgb"], d_rgb, k_rgb)
        vlad_aud = _netvlad(x[:, :, d_rgb:], fp["aud"], d_aud, k_aud)
        return _tail(fp, vlad_rgb, vlad_aud, b)

    def _tail(fp, vlad_rgb, vlad_aud, b):
        if "w_rgb_q" in fp:
            from learnablepoolingmethods_tpu.ops.int8_matmul import matmul_wi8

            h = (
                matmul_wi8(vlad_rgb, fp["w_rgb_q"], fp["w_rgb_s"])
                + matmul_wi8(vlad_aud, fp["w_aud_q"], fp["w_aud_s"])
                + fp["hidden_b"]
            )
        else:
            h = (
                jnp.matmul(vlad_rgb, fp["w_rgb"], preferred_element_type=jnp.float32)
                + jnp.matmul(vlad_aud, fp["w_aud"], preferred_element_type=jnp.float32)
                + fp["hidden_b"]
            )
        return gated_moe_tail(fp, h, m, v, ct, top_k, return_probs)

    return forward
