"""Parity: fast inference path ≡ flax model path (NetVLADModelLF, Willow shape)."""

import jax
import jax.numpy as jnp
import numpy as np

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.ops.fast_infer import (
    build_fast_netvlad_inference,
    prepare_fast_params,
)
from learnablepoolingmethods_tpu.ops.netvlad_pallas import netvlad_fused, netvlad_reference

CFG = ModelConfig(
    vocab_size=20,
    iterations=6,
    netvlad_cluster_size=8,
    netvlad_hidden_size=16,
    presampled=True,  # both paths skip sampling → comparable
)


def _setup(rng):
    b, f, dtot = 2, 6, 1152
    feats_u8 = rng.integers(0, 256, size=(b, f, dtot), dtype=np.uint8)
    nf = np.array([f, f], np.int32)
    model = create_model("NetVLADModelLF", CFG)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x,
        num_frames=jnp.asarray(nf),
        training=True,
    )
    # make BN stats non-trivial so folding is actually exercised
    variables = jax.tree.map(lambda a: a, variables)
    bs = jax.tree.map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size
        if a.ndim >= 1
        else a,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    return model, variables, feats_u8, nf


def test_fast_path_matches_model_fp32(rng):
    model, variables, feats_u8, nf = _setup(rng)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    want = model.apply(
        variables, x, num_frames=jnp.asarray(nf), training=False
    )["predictions"]

    fp = prepare_fast_params(variables, CFG, compute_dtype=jnp.float32)
    fast = build_fast_netvlad_inference(
        CFG,
        top_k=20,
        use_pallas=True,
        pallas_interpret=True,  # CPU test: interpret the kernel
        compute_dtype=jnp.float32,
    )
    values, indices = fast(
        fp, jnp.asarray(feats_u8), jnp.asarray(nf), jax.random.key(0), presampled=True
    )
    # top-20 of 20 classes = full ordering; scatter back and compare
    got = np.zeros((2, 20), np.float32)
    got[np.arange(2)[:, None], np.asarray(indices)] = np.asarray(values)
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-4)


def test_fast_path_jnp_fallback_matches(rng):
    model, variables, feats_u8, nf = _setup(rng)
    fp = prepare_fast_params(variables, CFG, compute_dtype=jnp.float32)
    fast_k = build_fast_netvlad_inference(
        CFG, use_pallas=True, pallas_interpret=True, compute_dtype=jnp.float32,
    )
    fast_j = build_fast_netvlad_inference(
        CFG, use_pallas=False, compute_dtype=jnp.float32
    )
    v1, i1 = fast_k(fp, jnp.asarray(feats_u8), jnp.asarray(nf), jax.random.key(0), presampled=True)
    v2, i2 = fast_j(fp, jnp.asarray(feats_u8), jnp.asarray(nf), jax.random.key(0), presampled=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_pallas_kernel_matches_reference_interpret(rng):
    b, f, d, k = 3, 12, 256, 16
    x = jnp.asarray(rng.normal(scale=0.2, size=(b, f, d)).astype(np.float32))
    c = jnp.asarray(rng.normal(scale=0.05, size=(d, k)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(k,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(scale=0.1, size=(k,)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(scale=0.05, size=(d, k)).astype(np.float32))
    ref = netvlad_reference(x, c, scale, bias, c2)
    got = netvlad_fused(x, c, scale, bias, c2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_netvlad_module_vs_kernel_reference(rng):
    """modules.py#NetVLAD (inference BN) ≡ netvlad_reference with folded BN."""
    from learnablepoolingmethods_tpu.models.modules import NetVLAD
    from learnablepoolingmethods_tpu.ops.netvlad_pallas import fold_assignment_bn

    b, f, d, k = 2, 7, 24, 4
    x = jnp.asarray(rng.normal(size=(b, f, d)).astype(np.float32))
    mod = NetVLAD(feature_size=d, max_frames=f, cluster_size=k, add_batch_norm=True)
    variables = mod.init(jax.random.key(0), x, training=False)
    p, s = variables["params"], variables["batch_stats"]
    want = mod.apply(variables, x, training=False)  # [b, d*k]

    scale, bias = fold_assignment_bn(
        p["cluster_bn"]["scale"],
        p["cluster_bn"]["bias"],
        s["cluster_bn"]["mean"],
        s["cluster_bn"]["var"],
    )
    got = netvlad_reference(
        x, p["cluster_weights"], scale, bias, p["cluster_weights2"]
    ).reshape(b, d * k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fast_path_fused_frontend_branch(rng):
    """The fuse_frontend branch (bf16 + uint8 + unsampled) in interpret mode."""
    model, variables, feats_u8, nf = _setup(rng)
    fp = prepare_fast_params(variables, CFG, compute_dtype=jnp.bfloat16)
    fused = build_fast_netvlad_inference(
        CFG, top_k=5, use_pallas=True, pallas_interpret=True,
        compute_dtype=jnp.bfloat16, fuse_frontend=True,
    )
    staged = build_fast_netvlad_inference(
        CFG, top_k=5, use_pallas=True, pallas_interpret=True,
        compute_dtype=jnp.bfloat16, fuse_frontend=False,
    )
    key = jax.random.key(3)
    v1, i1 = fused(fp, jnp.asarray(feats_u8), jnp.asarray(nf), key)
    v2, i2 = staged(fp, jnp.asarray(feats_u8), jnp.asarray(nf), key)
    # identical sampling indices (same key, same derivation) → same outputs
    # up to bf16 rounding between the two computation orders
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=3e-2)


def test_fast_path_rejects_non_moe_classifier(rng):
    """A non-MoE --video_level_classifier_model must raise a clean
    'unsupported config' ValueError, not a KeyError (advisor finding)."""
    import dataclasses
    import pytest

    cfg = dataclasses.replace(CFG, video_level_classifier_model="LogisticModel")
    model = create_model("NetVLADModelLF", cfg)
    feats_u8 = rng.integers(0, 256, size=(2, 6, 1152), dtype=np.uint8)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, num_frames=jnp.asarray([6, 6]), training=True,
    )
    with pytest.raises(ValueError, match="MoeModel classifier"):
        prepare_fast_params(variables, cfg, compute_dtype=jnp.float32)


def test_fast_path_rejects_single_modality_layout(rng):
    """feature_size <= 128 builds a SINGLE NetVLAD module (no rgb/audio
    split, frame_level.py) — the fast path's two-modality layout cannot
    apply and must raise a clean ValueError, not KeyError('NetVLAD_1')."""
    import pytest

    model = create_model("NetVLADModelLF", CFG)
    feats_u8 = rng.integers(0, 256, size=(2, 6, 40), dtype=np.uint8)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, num_frames=jnp.asarray([6, 6]), training=True,
    )
    with pytest.raises(ValueError, match="two-modality"):
        prepare_fast_params(variables, CFG, compute_dtype=jnp.float32)


def test_fast_path_return_probs(rng):
    model, variables, feats_u8, nf = _setup(rng)
    fp = prepare_fast_params(variables, CFG, compute_dtype=jnp.float32)
    f_probs = build_fast_netvlad_inference(
        CFG, use_pallas=False, compute_dtype=jnp.float32, return_probs=True
    )
    f_topk = build_fast_netvlad_inference(
        CFG, top_k=20, use_pallas=False, compute_dtype=jnp.float32
    )
    key = jax.random.key(0)
    probs = f_probs(fp, jnp.asarray(feats_u8), jnp.asarray(nf), key, presampled=True)
    vals, idxs = f_topk(fp, jnp.asarray(feats_u8), jnp.asarray(nf), key, presampled=True)
    got = np.take_along_axis(np.asarray(probs), np.asarray(idxs), axis=1)
    np.testing.assert_allclose(got, np.asarray(vals), atol=1e-6)


def test_fast_path_int8_hidden(rng):
    """int8_hidden fast path: pallas-kernel route ≡ jnp-twin route exactly,
    and both stay near the flax probs (quantization-error envelope only;
    the ranking-metric accuracy gate lives in test_int8_matmul.py)."""
    model, variables, feats_u8, nf = _setup(rng)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    want = model.apply(
        variables, x, num_frames=jnp.asarray(nf), training=False
    )["predictions"]

    fp = prepare_fast_params(
        variables, CFG, compute_dtype=jnp.float32, int8_hidden=True
    )
    assert "w_rgb_q" in fp and "w_rgb" not in fp
    assert fp["w_rgb_q"].dtype == jnp.int8
    fast_k = build_fast_netvlad_inference(
        CFG, use_pallas=True, pallas_interpret=True, compute_dtype=jnp.float32
    )
    fast_j = build_fast_netvlad_inference(
        CFG, use_pallas=False, compute_dtype=jnp.float32
    )
    key = jax.random.key(0)
    v1, i1 = fast_k(fp, jnp.asarray(feats_u8), jnp.asarray(nf), key, presampled=True)
    v2, i2 = fast_j(fp, jnp.asarray(feats_u8), jnp.asarray(nf), key, presampled=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)

    got = np.zeros((2, 20), np.float32)
    got[np.arange(2)[:, None], np.asarray(i1)] = np.asarray(v1)
    np.testing.assert_allclose(got, np.asarray(want), atol=5e-2)
