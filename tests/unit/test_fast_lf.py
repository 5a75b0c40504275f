"""fast_lf parity: the BN-folded LF fast paths must reproduce
model.apply(training=False) with presampled inputs (interpret-mode kernels;
mirrors tests/unit/test_fast_infer.py for NetVLADModelLF)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.ops.fast_lf import (
    build_fast_lf_inference,
    prepare_fast_lf_params,
)

B, F, DT = 3, 12, 1152


def _setup(model_name, **cfg_kw):
    cfg = ModelConfig(
        iterations=F,
        vocab_size=29,
        fv_cluster_size=8,
        rvlad_cluster_size=8,
        dbow_cluster_size=16,
        nextvlad_cluster_size=8,
        compute_dtype="float32",
        presampled=True,  # both paths consume presampled frames → comparable
        **cfg_kw,
    )
    model = create_model(model_name, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "features": rng.integers(0, 256, size=(B, F, DT), dtype=np.uint8),
        "num_frames": rng.integers(4, F + 1, size=(B,)).astype(np.int32),
    }
    params, batch_stats = step_lib.init_model_variables(
        model, batch, frame_features=True
    )
    # perturb BN stats so folding is non-trivial
    batch_stats = jax.tree.map(
        lambda s: s + 0.05 * np.abs(rng.normal(size=s.shape)).astype(np.float32),
        batch_stats,
    )
    return cfg, model, params, batch_stats, batch, rng


@pytest.mark.parametrize(
    "model_name",
    ["NetFVModelLF", "NetRVLADModelLF", "SoftDbofModelLF", "NeXtVLADModel"],
)
def test_fast_lf_matches_model_apply(model_name):
    cfg, model, params, batch_stats, batch, rng = _setup(model_name)
    variables = {"params": params, "batch_stats": batch_stats}

    # presample identically on both sides so randomness is out of the picture
    feats = jnp.asarray(batch["features"])
    nf = jnp.asarray(batch["num_frames"])
    u = np.random.default_rng(7).uniform(size=(B, F)).astype(np.float32)
    idx = np.minimum((u * np.asarray(nf)[:, None]).astype(np.int32), F - 1)
    sampled = jnp.take_along_axis(feats, jnp.asarray(idx)[:, :, None], axis=1)

    x = step_lib.preprocess_input(sampled, jnp.float32)
    ref = model.apply(
        variables, x, training=False,
        rngs={"sampling": jax.random.key(0)},
    )["predictions"]

    fp = prepare_fast_lf_params(variables, cfg, model_name,
                               compute_dtype=jnp.float32)
    fast = build_fast_lf_inference(
        cfg, model_name, use_pallas=True, pallas_interpret=True,
        compute_dtype=jnp.float32, return_probs=True,
    )
    got = fast(fp, sampled, nf, jax.random.key(0), presampled=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref, np.float32), atol=2e-4,
    )
    # jnp (non-pallas) path agrees too
    fast_jnp = build_fast_lf_inference(
        cfg, model_name, use_pallas=False,
        compute_dtype=jnp.float32, return_probs=True,
    )
    got2 = fast_jnp(fp, sampled, nf, jax.random.key(0), presampled=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref, np.float32),
                               atol=2e-4)


def test_fast_lf_topk_output_shapes():
    cfg, model, params, batch_stats, batch, rng = _setup("SoftDbofModelLF")
    variables = {"params": params, "batch_stats": batch_stats}
    fp = prepare_fast_lf_params(variables, cfg, "SoftDbofModelLF",
                                compute_dtype=jnp.float32)
    fast = build_fast_lf_inference(
        cfg, "SoftDbofModelLF", top_k=5, use_pallas=False,
        compute_dtype=jnp.float32,
    )
    values, indices = fast(
        fp, jnp.asarray(batch["features"]), jnp.asarray(batch["num_frames"]),
        jax.random.key(1),
    )
    assert values.shape == (B, 5) and indices.shape == (B, 5)
    assert np.all(np.diff(np.asarray(values), axis=1) <= 0)


def test_fast_lf_rejects_unsupported_configs():
    cfg, model, params, batch_stats, batch, rng = _setup("NetFVModelLF")
    variables = {"params": params, "batch_stats": batch_stats}
    import dataclasses

    with pytest.raises(ValueError):
        prepare_fast_lf_params(
            variables, dataclasses.replace(cfg, gating=False), "NetFVModelLF"
        )
    with pytest.raises(ValueError):
        prepare_fast_lf_params(variables, cfg, "LstmModel")


@pytest.mark.parametrize("model_name", ["NetFVModelLF", "NetRVLADModelLF"])
def test_fast_lf_int8_hidden(model_name):
    """int8 weight-only hidden FC on the giant-FC LF models: outputs stay
    within the int8 rounding envelope of the f32 path (the same mechanism
    the NetVLAD path measured +14%/ΔGAP 3.1e-4 with)."""
    cfg, model, params, batch_stats, batch, rng = _setup(model_name)
    variables = {"params": params, "batch_stats": batch_stats}
    feats = jnp.asarray(batch["features"])
    nf = jnp.asarray(batch["num_frames"])
    u = np.random.default_rng(7).uniform(size=(B, F)).astype(np.float32)
    idx = np.minimum((u * np.asarray(nf)[:, None]).astype(np.int32), F - 1)
    sampled = jnp.take_along_axis(feats, jnp.asarray(idx)[:, :, None], axis=1)

    fp = prepare_fast_lf_params(variables, cfg, model_name,
                                compute_dtype=jnp.float32)
    fp8 = prepare_fast_lf_params(variables, cfg, model_name,
                                 compute_dtype=jnp.float32, int8_hidden=True)
    assert any(k.endswith("_q") for k in fp8["mods"][0])
    fwd = build_fast_lf_inference(
        cfg, model_name, use_pallas=False,
        compute_dtype=jnp.float32, return_probs=True,
    )
    p32 = fwd(fp, sampled, nf, jax.random.key(0), presampled=True)
    p8 = fwd(fp8, sampled, nf, jax.random.key(0), presampled=True)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p32), atol=5e-2)
    assert (
        np.argmax(np.asarray(p8), axis=1) == np.argmax(np.asarray(p32), axis=1)
    ).mean() >= 0.67


def test_fast_lf_int8_rejected_on_small_fc():
    cfg, model, params, batch_stats, batch, rng = _setup("SoftDbofModelLF")
    variables = {"params": params, "batch_stats": batch_stats}
    with pytest.raises(ValueError, match="int8_hidden is not supported"):
        prepare_fast_lf_params(variables, cfg, "SoftDbofModelLF",
                               compute_dtype=jnp.float32, int8_hidden=True)
