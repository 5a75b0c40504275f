"""Fast inference path for TransformerEncoderModel (BASELINE config 5).

The round-2 profile (tools/profile_transformer.py, real v5e, B=256) put the
flax/XLA path at 25.8 ms — the QKV/out projections and FFN sit near their
MXU floors (~3.4 ms each per layer at 190 TFLOPs bf16), but XLA's attention
materializes the [B, H, F, F] logits tensor in HBM (737 MB f32 at B=256,
F=300) and streams it through mask → softmax → weights-matmul.  This module
applies the same treatment the LF models got (ops/fast_infer.py):

- **flash-style attention kernel** (``masked_attention_fused``): per (batch)
  grid step, Q/K/V tiles live in VMEM and each head's [F, F] logits never
  leave the chip — softmax (f32) and the weights·V contraction happen in
  one pass.  ~2.8 MB VMEM per step at F=300, D=1024.
- fused QKV: the three [D, D] projections become one [D, 3D] matmul;
- bf16 everywhere except LayerNorm statistics, softmax, and residual sums
  (f32 — matches the flax model's LN dtype);
- the shared gated-MoE tail + exact top-k from ops/fast_infer.py.

Speed-of-light note (BASELINE.md): the config-5 model is ~11.5 GFLOP/video
(proj 0.7 + 2×(QKV/out 2.5 + attention 0.37 + FFN 2.5) + tail), so the bf16
MXU ceiling on this chip is ~16.5k videos/s — the 20k north star is not
reachable for this config without int8 or architecture changes; the fast
path targets the matmul-bound floor instead.

(ref: attention_modules.py#TransformerEncoder / frame_level_models.py
wrappers — SURVEY.md §2.2 config 5.)
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.ops.fast_infer import (
    _fold_bn,
    _require_moe_head,
    gated_moe_tail,
)
from learnablepoolingmethods_tpu.ops.normalize import l2_normalize
from learnablepoolingmethods_tpu.utils.quantization import dequantize

LN_EPS = 1e-6


def _attention_kernel(qkv_ref, mask_ref, out_ref, *, num_heads):
    """One batch element (block [1, F, 3·H·hd]): masked softmax(QKᵀ/√hd)·V
    for every head, entirely in VMEM.  Takes the FUSED QKV tensor — slicing
    q/k/v out at the XLA level would materialize three extra [B, F, D]
    copies in HBM.  Heads are static lane slices (hd = 128); MXU operands
    stay in the input dtype (bf16 on the fast path), accumulation f32."""
    _, f, dm3 = qkv_ref.shape
    dm = dm3 // 3
    hd = dm // num_heads
    scale = 1.0 / (hd ** 0.5)
    # key mask block [1, 1, F]: 0 → −1e9 added to every query's logit row
    neg = (1.0 - mask_ref[0]) * -1e9  # [1, F] f32, broadcasts over queries
    for h in range(num_heads):
        q = qkv_ref[0, :, h * hd : (h + 1) * hd]
        k = qkv_ref[0, :, dm + h * hd : dm + (h + 1) * hd]
        v = qkv_ref[0, :, 2 * dm + h * hd : 2 * dm + (h + 1) * hd]
        logits = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + neg
        )  # [F, F] f32
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            w.astype(v.dtype), v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, h * hd : (h + 1) * hd] = out.astype(out_ref.dtype)


def masked_attention_fused(qkv, mask, num_heads: int, interpret: bool = False):
    """qkv [B, F, 3·H·hd] (q‖k‖v on the last axis, bf16/f32), mask [B, F]
    (1 = valid key) → [B, F, H·hd].  Pad queries attend over valid keys
    only, matching the flax attn_mask construction
    (attention.py#TransformerEncoder).

    (A num_frames-guided query/key block-skip variant measured SLOWER than
    this dense kernel on-chip — 5.8 vs 4.5 ms/layer @ B=256 under
    nf~U[10,300]: each Mosaic lax.cond region costs more than the ≤128-row
    blocks it can skip at F=300, and the kernel needs ~9 regions per
    (head, q-block).  Removed; BASELINE.md round-3 row has the numbers and
    the two lowering landmines found en route.)"""
    b, f, dm3 = qkv.shape
    dm = dm3 // 3
    spec_in = pl.BlockSpec((1, f, dm3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, f, dm), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # mask as [B, 1, F] so the block equals the trailing array dims (the
    # Mosaic block-shape rule: last two dims divisible by (8, 128) OR equal
    # to the array's)
    spec_m = pl.BlockSpec((1, 1, f), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    kern = functools.partial(_attention_kernel, num_heads=num_heads)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec_in, spec_m],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((b, f, dm), qkv.dtype),
        interpret=interpret,
    )(qkv, mask.astype(jnp.float32)[:, None, :])


def attention_reference(q, k, v, mask, num_heads: int):
    """jnp twin of the kernel (and of flax's dot-product attention up to
    softmax precision) — the CPU/parity path."""
    b, f, dm = q.shape
    hd = dm // num_heads
    qh = q.reshape(b, f, num_heads, hd).astype(jnp.float32) / (hd ** 0.5)
    kh = k.reshape(b, f, num_heads, hd).astype(jnp.float32)
    vh = v.reshape(b, f, num_heads, hd)
    logits = jnp.einsum("bqhk,bshk->bhqs", qh, kh)
    logits = logits + (1.0 - mask.astype(jnp.float32))[:, None, None, :] * -1e9
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqs,bshk->bqhk", w.astype(v.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, f, dm).astype(q.dtype)


def _prepare_encoder_layers(enc, n_layers: int, ct):
    """Encoder-layer weights → flat per-layer dicts (fused QKV kernel,
    LN affines f32, FFN kernels in compute dtype)."""
    layers = []
    for i in range(n_layers):
        lp = enc[f"layer_{i}"]
        mha = lp["mha"]
        d_model = mha["query"]["kernel"].shape[0]
        wqkv = jnp.concatenate(
            [
                mha[n]["kernel"].reshape(d_model, -1)
                for n in ("query", "key", "value")
            ],
            axis=1,
        ).astype(ct)
        bqkv = jnp.concatenate(
            [mha[n]["bias"].reshape(-1) for n in ("query", "key", "value")]
        ).astype(jnp.float32)
        layers.append(
            {
                "wqkv": wqkv,                                         # [D, 3D]
                "bqkv": bqkv,                                         # [3D]
                "wo": mha["out"]["kernel"].reshape(-1, d_model).astype(ct),
                "bo": mha["out"]["bias"].astype(jnp.float32),
                "ln1_s": lp["ln1"]["scale"].astype(jnp.float32),
                "ln1_b": lp["ln1"]["bias"].astype(jnp.float32),
                "ln2_s": lp["ln2"]["scale"].astype(jnp.float32),
                "ln2_b": lp["ln2"]["bias"].astype(jnp.float32),
                "w1": lp["ff1"]["kernel"].astype(ct),
                "b1": lp["ff1"]["bias"].astype(jnp.float32),
                "w2": lp["ff2"]["kernel"].astype(ct),
                "b2": lp["ff2"]["bias"].astype(jnp.float32),
            }
        )
    return layers


def _encoder_apply(layers, h, mask, heads, use_pallas, pallas_interpret, ct):
    """The shared fast encoder stack (fused QKV → attention kernel →
    out-proj → residual+LN → FFN → residual+LN), bf16-materialized."""
    for lp in layers:
        qkv = (
            jnp.matmul(h, lp["wqkv"], preferred_element_type=jnp.float32)
            + lp["bqkv"]
        ).astype(ct)
        d_model = h.shape[-1]
        if use_pallas:
            attn = masked_attention_fused(
                qkv, mask, heads, interpret=pallas_interpret
            )
        else:
            attn = attention_reference(
                qkv[..., :d_model],
                qkv[..., d_model : 2 * d_model],
                qkv[..., 2 * d_model :],
                mask,
                heads,
            )
        # cast matmul outputs in their epilogues so every materialized
        # [B, F, D] tensor stays bf16 — the residual+LN fusions read bf16
        # and compute their statistics in f32
        attn = (
            jnp.matmul(attn, lp["wo"], preferred_element_type=jnp.float32)
            + lp["bo"]
        ).astype(ct)
        h = _layernorm(
            h.astype(jnp.float32) + attn.astype(jnp.float32),
            lp["ln1_s"], lp["ln1_b"],
        ).astype(ct)
        ff = jax.nn.relu(
            jnp.matmul(h, lp["w1"], preferred_element_type=jnp.float32)
            + lp["b1"]
        ).astype(ct)
        ff = (
            jnp.matmul(ff, lp["w2"], preferred_element_type=jnp.float32)
            + lp["b2"]
        ).astype(ct)
        h = _layernorm(
            h.astype(jnp.float32) + ff.astype(jnp.float32),
            lp["ln2_s"], lp["ln2_b"],
        ).astype(ct)
    return h


def prepare_fast_transformer_params(
    variables: Dict[str, Any],
    mcfg: ModelConfig,
    compute_dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Fold/cast once on host → flat param tree (weights stay ARGUMENTS)."""
    if not mcfg.gating:
        raise ValueError("fast transformer path supports the gated tail only")
    if not mcfg.netvlad_add_batch_norm:
        raise ValueError(
            "fast transformer path supports the default tail (BN on)"
        )
    p = variables["params"]
    s = variables["batch_stats"]
    _require_moe_head(p, mcfg)
    ct = compute_dtype

    layers = _prepare_encoder_layers(p["encoder"], mcfg.transformer_layers, ct)

    g_scale, g_bias = _fold_bn(p["gating"]["gating_bn"], s["gating"]["gating_bn"])
    moe = p["MoeModel_0"]
    return {
        "w_proj": p["input_proj"]["kernel"].astype(ct),
        "b_proj": p["input_proj"]["bias"].astype(jnp.float32),
        "layers": layers,
        "hidden_w": p["hidden1_weights"].astype(ct),
        "hidden_b": p["hidden1_biases"].astype(jnp.float32),
        "gate_w": p["gating"]["gating_weights"].astype(ct),
        "g_scale": g_scale,
        "g_bias": g_bias,
        "gates_kernel": moe["gates_kernel"].astype(ct),
        "experts_kernel": moe["experts_kernel"].astype(ct),
        "experts_bias": moe["experts_bias"].astype(jnp.float32),
    }


def _layernorm(x32, scale, bias):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean
    return (x32 - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def build_fast_transformer_inference(
    mcfg: ModelConfig,
    top_k: int = 20,
    use_pallas: bool = True,
    pallas_interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    return_probs: bool = False,
):
    """fn(fp, features, num_frames, rng, presampled=False) →
    (values [B,k], indices [B,k]) or probs [B,V].  ``rng``/``presampled``
    are accepted for dispatch-signature parity with the other fast paths
    (the transformer consumes all frames; nothing is sampled)."""
    m = mcfg.moe_num_mixtures
    v = mcfg.vocab_size
    heads = mcfg.attention_heads
    ct = compute_dtype

    def forward(fp, features, num_frames, rng=None, presampled: bool = False):
        b, f = features.shape[0], features.shape[1]
        x = (
            dequantize(features, dtype=ct)
            if features.dtype == jnp.uint8
            else features.astype(ct)
        )
        x = l2_normalize(x, axis=-1)
        mask = (
            jnp.arange(f)[None, :] < jnp.asarray(num_frames).reshape(-1, 1)
        ).astype(jnp.float32)

        h = (
            jnp.matmul(x.astype(ct), fp["w_proj"], preferred_element_type=jnp.float32)
            + fp["b_proj"]
        ).astype(ct)

        h = _encoder_apply(
            fp["layers"], h, mask, heads, use_pallas, pallas_interpret, ct
        )

        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        pooled = jnp.sum(h.astype(jnp.float32) * mask[:, :, None], axis=1) / denom

        h2 = (
            jnp.matmul(
                pooled.astype(ct), fp["hidden_w"],
                preferred_element_type=jnp.float32,
            )
            + fp["hidden_b"]
        )
        return gated_moe_tail(fp, h2, m, v, ct, top_k, return_probs)

    return forward


def prepare_fast_attn_netvlad_params(
    variables: Dict[str, Any],
    mcfg: ModelConfig,
    compute_dtype=jnp.bfloat16,
    int8_hidden: bool = False,
) -> Dict[str, Any]:
    """AttentionNetVLADModel (encoder → NetVLAD → gated tail): encoder
    layers like the transformer path + the vlad module's folded
    assignment-BN constants (attention.py#AttentionNetVLADModel).

    ``int8_hidden``: weight-only int8 for the D·K → hidden FC — the SAME
    [262144, 1024] HBM-bound weight the NetVLADModelLF path quantizes
    (ops/fast_infer.py, measured +14% e2e at B=256 on that shape)."""
    if not mcfg.gating:
        raise ValueError("fast path supports the gated tail only")
    if not mcfg.netvlad_add_batch_norm or mcfg.netvlad_relu:
        raise ValueError(
            "fast attn-NetVLAD path supports the default config "
            "(BN on, relu off)"
        )
    p = variables["params"]
    s = variables["batch_stats"]
    _require_moe_head(p, mcfg)
    ct = compute_dtype

    vp, vs = p["vlad"], s["vlad"]
    scale, bias = _fold_bn(vp["cluster_bn"], vs["cluster_bn"])
    g_scale, g_bias = _fold_bn(p["gating"]["gating_bn"], s["gating"]["gating_bn"])
    moe = p["MoeModel_0"]
    if int8_hidden:
        from learnablepoolingmethods_tpu.ops.int8_matmul import (
            quantize_weight_int8,
        )

        w_q, w_s = quantize_weight_int8(p["hidden1_weights"])
        hidden = {"hidden_w_q": jnp.asarray(w_q), "hidden_w_s": jnp.asarray(w_s)}
    else:
        hidden = {"hidden_w": p["hidden1_weights"].astype(ct)}
    return {
        "w_proj": p["input_proj"]["kernel"].astype(ct),
        "b_proj": p["input_proj"]["bias"].astype(jnp.float32),
        "layers": _prepare_encoder_layers(
            p["encoder"], mcfg.transformer_layers, ct
        ),
        "cluster": vp["cluster_weights"].astype(ct),
        "c_scale": scale,
        "c_bias": bias,
        "c2": vp["cluster_weights2"].astype(jnp.float32).reshape(
            vp["cluster_weights"].shape
        ),
        **hidden,
        "hidden_b": p["hidden1_biases"].astype(jnp.float32),
        "gate_w": p["gating"]["gating_weights"].astype(ct),
        "g_scale": g_scale,
        "g_bias": g_bias,
        "gates_kernel": moe["gates_kernel"].astype(ct),
        "experts_kernel": moe["experts_kernel"].astype(ct),
        "experts_bias": moe["experts_bias"].astype(jnp.float32),
    }


def build_fast_attn_netvlad_inference(
    mcfg: ModelConfig,
    top_k: int = 20,
    use_pallas: bool = True,
    pallas_interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    return_probs: bool = False,
):
    """AttentionNetVLADModel fast forward: the shared fast encoder stack,
    pad rows zeroed, then the fused NetVLAD kernel
    (ops/netvlad_pallas.py) and the gated-MoE tail."""
    from learnablepoolingmethods_tpu.ops.netvlad_pallas import (
        netvlad_fused,
        netvlad_reference,
    )

    m = mcfg.moe_num_mixtures
    v = mcfg.vocab_size
    heads = mcfg.attention_heads
    ct = compute_dtype

    def forward(fp, features, num_frames, rng=None, presampled: bool = False):
        b, f = features.shape[0], features.shape[1]
        x = (
            dequantize(features, dtype=ct)
            if features.dtype == jnp.uint8
            else features.astype(ct)
        )
        x = l2_normalize(x, axis=-1)
        mask = (
            jnp.arange(f)[None, :] < jnp.asarray(num_frames).reshape(-1, 1)
        ).astype(jnp.float32)

        h = (
            jnp.matmul(x.astype(ct), fp["w_proj"], preferred_element_type=jnp.float32)
            + fp["b_proj"]
        ).astype(ct)
        h = _encoder_apply(
            fp["layers"], h, mask, heads, use_pallas, pallas_interpret, ct
        )
        # zero pads before clustering so they don't pollute assignments
        # (attention.py#AttentionNetVLADModel)
        h = h * mask[:, :, None].astype(h.dtype)

        vlad_fn = netvlad_fused if use_pallas else netvlad_reference
        kw = {"interpret": pallas_interpret} if use_pallas else {}
        vlad = vlad_fn(
            h, fp["cluster"], fp["c_scale"], fp["c_bias"], fp["c2"], **kw
        ).reshape(b, -1)

        if "hidden_w_q" in fp:
            from learnablepoolingmethods_tpu.ops.int8_matmul import matmul_wi8

            h2 = (
                matmul_wi8(vlad, fp["hidden_w_q"], fp["hidden_w_s"])
                + fp["hidden_b"]
            )
        else:
            h2 = (
                jnp.matmul(
                    vlad.astype(ct), fp["hidden_w"],
                    preferred_element_type=jnp.float32,
                )
                + fp["hidden_b"]
            )
        return gated_moe_tail(fp, h2, m, v, ct, top_k, return_probs)

    return forward
