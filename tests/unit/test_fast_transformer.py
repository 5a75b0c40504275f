"""Parity: fast transformer path ≡ flax TransformerEncoderModel (config 5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.ops.fast_transformer import (
    attention_reference,
    build_fast_transformer_inference,
    masked_attention_fused,
    prepare_fast_transformer_params,
)

CFG = ModelConfig(
    vocab_size=20,
    attention_hidden_size=16,
    attention_heads=2,
    transformer_layers=2,
    transformer_ff_size=24,
    moe_num_mixtures=2,
)
B, F, DIN = 3, 7, 1152


def _setup(rng):
    feats_u8 = rng.integers(0, 256, size=(B, F, DIN), dtype=np.uint8)
    nf = np.array([F, 4, 1], np.int32)
    model = create_model("TransformerEncoderModel", CFG)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, num_frames=jnp.asarray(nf), training=True,
    )
    # non-trivial gating-BN stats so the folding is exercised
    bs = jax.tree.map(
        lambda a: a + 0.07 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    return model, variables, feats_u8, nf


def test_fast_transformer_matches_model_fp32(rng):
    model, variables, feats_u8, nf = _setup(rng)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    want = model.apply(
        variables, x, num_frames=jnp.asarray(nf), training=False
    )["predictions"]

    fp = prepare_fast_transformer_params(variables, CFG, compute_dtype=jnp.float32)
    fast = build_fast_transformer_inference(
        CFG, use_pallas=False, compute_dtype=jnp.float32, return_probs=True
    )
    got = fast(fp, jnp.asarray(feats_u8), jnp.asarray(nf))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4
    )


def test_fast_transformer_topk_consistent(rng):
    model, variables, feats_u8, nf = _setup(rng)
    fp = prepare_fast_transformer_params(variables, CFG, compute_dtype=jnp.float32)
    f_probs = build_fast_transformer_inference(
        CFG, use_pallas=False, compute_dtype=jnp.float32, return_probs=True
    )
    f_topk = build_fast_transformer_inference(
        CFG, top_k=20, use_pallas=False, compute_dtype=jnp.float32
    )
    probs = f_probs(fp, jnp.asarray(feats_u8), jnp.asarray(nf))
    vals, idxs = f_topk(fp, jnp.asarray(feats_u8), jnp.asarray(nf))
    got = np.take_along_axis(np.asarray(probs), np.asarray(idxs), axis=1)
    np.testing.assert_allclose(got, np.asarray(vals), atol=1e-6)


def test_attention_kernel_matches_reference_interpret(rng):
    b, f, heads, hd = 2, 6, 2, 8
    dm = heads * hd
    q = jnp.asarray(rng.normal(size=(b, f, dm)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, f, dm)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, f, dm)).astype(np.float32))
    mask = jnp.asarray((np.arange(f)[None] < np.array([[6], [3]])).astype(np.float32))
    ref = attention_reference(q, k, v, mask, heads)
    qkv = jnp.concatenate([q, k, v], axis=-1)
    got = masked_attention_fused(qkv, mask, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_attention_reference_matches_flax_mha(rng):
    """attention_reference ≡ flax MultiHeadDotProductAttention given the
    same (identity-projected) inputs — pins the math the kernel implements
    to the module the model uses."""
    import flax.linen as nn

    b, f, heads, hd = 2, 5, 2, 4
    dm = heads * hd
    x = jnp.asarray(rng.normal(size=(b, f, dm)).astype(np.float32))
    mask = np.zeros((b, f), np.float32)
    mask[0, :5] = 1
    mask[1, :2] = 1
    attn_mask = jnp.asarray(mask)[:, None, None, :] * np.ones((1, 1, f, 1))
    mha = nn.MultiHeadDotProductAttention(
        num_heads=heads, dtype=jnp.float32, deterministic=True
    )
    variables = mha.init(jax.random.key(0), x, x, mask=attn_mask > 0)
    want = mha.apply(variables, x, x, mask=attn_mask > 0)

    p = variables["params"]

    def proj(name):
        return (
            jnp.einsum("bfd,dhk->bfhk", x, p[name]["kernel"]) + p[name]["bias"]
        ).reshape(b, f, dm)

    got = attention_reference(
        proj("query"), proj("key"), proj("value"), jnp.asarray(mask), heads
    )
    got = (
        jnp.einsum(
            "bfhk,hkd->bfd", got.reshape(b, f, heads, hd), p["out"]["kernel"]
        )
        + p["out"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fast_attn_netvlad_matches_model_fp32(rng):
    """AttentionNetVLADModel fast path (shared fast encoder + fused NetVLAD
    kernel, interpret mode) ≡ model.apply at fp32."""
    from learnablepoolingmethods_tpu.ops.fast_transformer import (
        build_fast_attn_netvlad_inference,
        prepare_fast_attn_netvlad_params,
    )

    cfg = dataclasses.replace(CFG, netvlad_cluster_size=4, netvlad_hidden_size=16)
    model = create_model("AttentionNetVLADModel", cfg)
    feats_u8 = rng.integers(0, 256, size=(B, F, DIN), dtype=np.uint8)
    nf = np.array([F, 4, 1], np.int32)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, num_frames=jnp.asarray(nf), training=True,
    )
    bs = jax.tree.map(
        lambda a: a + 0.07 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    want = model.apply(
        variables, x, num_frames=jnp.asarray(nf), training=False
    )["predictions"]

    fp = prepare_fast_attn_netvlad_params(variables, cfg, compute_dtype=jnp.float32)
    for use_pallas in (False, True):
        fast = build_fast_attn_netvlad_inference(
            cfg, use_pallas=use_pallas, pallas_interpret=True,
            compute_dtype=jnp.float32, return_probs=True,
        )
        got = fast(fp, jnp.asarray(feats_u8), jnp.asarray(nf))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4,
            err_msg=f"use_pallas={use_pallas}",
        )


def test_fast_transformer_rejects_non_moe_head(rng):
    cfg = dataclasses.replace(CFG, video_level_classifier_model="LogisticModel")
    model = create_model("TransformerEncoderModel", cfg)
    feats_u8 = rng.integers(0, 256, size=(2, 4, DIN), dtype=np.uint8)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, num_frames=jnp.asarray([4, 2]), training=True,
    )
    with pytest.raises(ValueError, match="MoeModel classifier"):
        prepare_fast_transformer_params(variables, cfg)


def test_fast_attn_netvlad_int8_hidden(rng):
    """int8 weight-only hidden FC on the attn-NetVLAD fast path: same
    mechanism/shape as the NetVLAD path's measured +14%; outputs must stay
    within the int8 rounding envelope of the bf16 path."""
    from learnablepoolingmethods_tpu.ops.fast_transformer import (
        build_fast_attn_netvlad_inference,
        prepare_fast_attn_netvlad_params,
    )

    cfg = dataclasses.replace(CFG, netvlad_cluster_size=4)
    model = create_model("AttentionNetVLADModel", cfg)
    feats_u8 = rng.integers(0, 256, size=(B, F, DIN), dtype=np.uint8)
    nf = np.array([F, 4, 2], np.int32)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, num_frames=jnp.asarray(nf), training=True,
    )
    fp16 = prepare_fast_attn_netvlad_params(
        variables, cfg, compute_dtype=jnp.float32
    )
    fp8 = prepare_fast_attn_netvlad_params(
        variables, cfg, compute_dtype=jnp.float32, int8_hidden=True
    )
    assert "hidden_w_q" in fp8 and fp8["hidden_w_q"].dtype == jnp.int8
    fwd = build_fast_attn_netvlad_inference(
        cfg, use_pallas=False, compute_dtype=jnp.float32, return_probs=True
    )
    p16 = fwd(fp16, jnp.asarray(feats_u8), jnp.asarray(nf))
    p8 = fwd(fp8, jnp.asarray(feats_u8), jnp.asarray(nf))
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p16), atol=5e-2)
    # probabilities stay rank-plausible: top-1 agreement on this tiny net
    assert (
        np.argmax(np.asarray(p8), axis=1)
        == np.argmax(np.asarray(p16), axis=1)
    ).mean() >= 0.67
