"""Round-trip tests for the TF-checkpoint importer (VERDICT round-1 item 3).

We cannot read real reference checkpoints (empty mount), so the oracle is a
TF1-format checkpoint WRITTEN with reference variable names/layouts from our
own golden-transcription-verified weights: export → Saver.save → import must
reproduce the exact trees and predictions (≤1e-5).
"""

import os

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import checkpoint_import as ci
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model

CFG = ModelConfig(
    vocab_size=12,
    iterations=4,
    moe_num_mixtures=2,
    netvlad_cluster_size=4,
    netvlad_hidden_size=16,
    dbof_cluster_size=16,
    dbof_hidden_size=8,
    fv_cluster_size=4,
    fv_hidden_size=16,
    rvlad_cluster_size=4,
    dbow_cluster_size=8,
)


def _init(model_name, rng, frame, d=24):
    model = create_model(model_name, CFG)
    if frame:
        batch = {
            "features": rng.integers(0, 256, size=(2, 6, d), dtype=np.uint8),
            "num_frames": np.array([6, 3], np.int32),
        }
    else:
        batch = {"features": rng.normal(size=(2, d)).astype(np.float32)}
    params, bs = step_lib.init_model_variables(model, batch, frame)
    return model, params, bs, batch


def _write_tf1_checkpoint(ref_vars, path, scope_prefix=""):
    import tensorflow as tf

    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        for name, val in ref_vars.items():
            tf1.Variable(initial_value=val, name=scope_prefix + name)
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, path, write_meta_graph=False)


def _roundtrip(model_name, rng, tmp_path, frame, d=24, scope_prefix=""):
    model, params, bs, batch = _init(model_name, rng, frame, d)
    ref_vars = ci.export_reference_layout(params, bs, CFG.vocab_size)
    ckpt = os.path.join(str(tmp_path), "model.ckpt")
    _write_tf1_checkpoint(ref_vars, ckpt, scope_prefix)

    got_params, got_bs = ci.import_reference_checkpoint(
        ckpt, model_name, CFG, batch, frame_features=frame
    )
    chex.assert_trees_all_close(
        jax.device_get(params), got_params, rtol=0, atol=1e-6
    )
    chex.assert_trees_all_close(jax.device_get(bs), got_bs, rtol=0, atol=1e-6)

    # prediction agreement ≤ 1e-5
    def predict(p, b):
        variables = {"params": p, "batch_stats": b}
        kwargs = {"num_frames": jnp.asarray(batch["num_frames"])} if frame else {}
        x = step_lib.preprocess_input(jnp.asarray(batch["features"]))
        return model.apply(variables, x, training=False, **kwargs)["predictions"]

    np.testing.assert_allclose(
        np.asarray(predict(params, bs)),
        np.asarray(predict(got_params, got_bs)),
        atol=1e-5,
    )


def test_import_logistic(rng, tmp_path):
    _roundtrip("LogisticModel", rng, tmp_path, frame=False)


def test_import_moe_relabeling(rng, tmp_path):
    """The vocab-major ↔ mixture-major relabeling must invert exactly."""
    _roundtrip("MoeModel", rng, tmp_path, frame=False)


def test_import_dbof_with_tower_prefix(rng, tmp_path):
    """DBoF: BN param+stats mapping, plus tower/ scope stripping
    (ref: train.py#build_graph variable_scope("tower"))."""
    _roundtrip("DbofModel", rng, tmp_path, frame=True, scope_prefix="tower/")


def test_import_netvlad_split_modality(rng, tmp_path):
    """Two NetVLAD modules (video/audio scopes) + gating + hidden FC."""
    _roundtrip("NetVLADModelLF", rng, tmp_path, frame=True, d=1026)


def test_import_netfv(rng, tmp_path):
    _roundtrip("NetFVModelLF", rng, tmp_path, frame=True)


def test_import_missing_gamma_defaults_to_ones(rng, tmp_path):
    """slim batch_norm defaults to scale=False — a checkpoint without gamma
    must import with scale=1, not fail."""
    model, params, bs, batch = _init("DbofModel", rng, frame=True)
    ref_vars = ci.export_reference_layout(params, bs, CFG.vocab_size)
    ref_vars = {k: v for k, v in ref_vars.items() if not k.endswith("/gamma")}
    got_params, _ = ci.import_reference_checkpoint(
        ref_vars, "DbofModel", CFG, batch, frame_features=True
    )
    for bn in ("input_bn", "cluster_bn", "hidden1_bn"):
        np.testing.assert_array_equal(
            np.asarray(got_params[bn]["scale"]),
            np.ones_like(np.asarray(got_params[bn]["scale"])),
        )


def test_import_strict_missing_raises(rng, tmp_path):
    model, params, bs, batch = _init("LogisticModel", rng, frame=False)
    with pytest.raises(KeyError, match="fully_connected"):
        ci.import_reference_checkpoint(
            {}, "LogisticModel", CFG, batch, frame_features=False
        )
    # non-strict keeps the fresh init
    got, _ = ci.import_reference_checkpoint(
        {}, "LogisticModel", CFG, batch, frame_features=False, strict=False
    )
    chex.assert_trees_all_close(jax.device_get(params), got, atol=1e-6)


def test_import_lstm_roundtrip(rng, tmp_path):
    """Per-gate flax leaves ↔ TF fused [D+H,4H] kernel (gate order i,j,f,o;
    forget_bias folded into hf/bias)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, lstm_cells=6, lstm_layers=2)
    model = create_model("LstmModel", cfg)
    batch = {
        "features": rng.integers(0, 256, size=(2, 5, 24), dtype=np.uint8),
        "num_frames": np.array([5, 3], np.int32),
    }
    params, bs = step_lib.init_model_variables(model, batch, True)
    ref_vars = ci.export_reference_layout(params, bs, cfg.vocab_size)
    assert "RNN/rnn/multi_rnn_cell/cell_0/basic_lstm_cell/kernel" in ref_vars
    ckpt = os.path.join(str(tmp_path), "lstm.ckpt")
    _write_tf1_checkpoint(ref_vars, ckpt, "tower/")
    got_params, got_bs = ci.import_reference_checkpoint(
        ckpt, "LstmModel", cfg, batch, frame_features=True
    )
    chex.assert_trees_all_close(jax.device_get(params), got_params, atol=1e-6)


def test_lstm_gate_mapping_matches_tf_cell(rng):
    """Golden: random fused BasicLSTMCell weights run through a NumPy
    transcription of the TF cell (concat[x,h]@K+b; i,j,f,o split;
    c' = c·σ(f+forget_bias) + σ(i)·tanh(j); h' = tanh(c')·σ(o)), then the
    importer's gate transform maps them into flax's OptimizedLSTMCell —
    hidden states must agree (proves gate order and forget_bias handling,
    not just invertibility).  TF 2.21 dropped compat.v1.nn.rnn_cell, so the
    transcription is the oracle, per the repo golden-test convention."""
    import flax.linen as nn

    d, h, t, b = 5, 4, 6, 3
    kernel = rng.normal(size=(d + h, 4 * h)).astype(np.float32) * 0.5
    bias = rng.normal(size=(4 * h,)).astype(np.float32) * 0.1
    x = rng.normal(size=(b, t, d)).astype(np.float32)

    def sigmoid(z):
        return 1.0 / (1.0 + np.exp(-z))

    c = np.zeros((b, h), np.float32)
    hh = np.zeros((b, h), np.float32)
    ref_outs = []
    for step in range(t):
        concat = np.concatenate([x[:, step], hh], axis=1) @ kernel + bias
        i, j, f, o = np.split(concat, 4, axis=1)
        c = c * sigmoid(f + 1.0) + sigmoid(i) * np.tanh(j)
        hh = np.tanh(c) * sigmoid(o)
        ref_outs.append(hh.copy())

    fused = {"kernel": kernel, "bias": bias}
    flax_cell = nn.OptimizedLSTMCell(features=h)
    new_params = {}
    for gate in ("ii", "if", "ig", "io"):
        new_params[gate] = {
            "kernel": ci._lstm_transform(gate, "kernel")(fused["kernel"])
        }
    for gate in ("hi", "hf", "hg", "ho"):
        new_params[gate] = {
            "kernel": ci._lstm_transform(gate, "kernel")(fused["kernel"]),
            "bias": ci._lstm_transform(gate, "bias")(fused["bias"]),
        }

    carry = (jnp.zeros((b, h)), jnp.zeros((b, h)))
    flax_outs = []
    for step in range(t):
        carry, y = flax_cell.apply(
            {"params": new_params}, carry, jnp.asarray(x[:, step])
        )
        flax_outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.stack(flax_outs, axis=1),
        np.stack(ref_outs, axis=1),
        atol=1e-5,
    )


def test_export_uses_reference_variable_names(rng, tmp_path):
    """Pin the exact reference variable names (review finding: fc/bias was
    misrouted to 'fc/beta', and the round-trip was self-consistently wrong)."""
    _, params, bs, _ = _init("LogisticModel", rng, frame=False)
    names = set(ci.export_reference_layout(params, bs, CFG.vocab_size))
    assert names == {"fully_connected/weights", "fully_connected/biases"}, names

    _, params, bs, _ = _init("DbofModel", rng, frame=True)
    names = set(ci.export_reference_layout(params, bs, CFG.vocab_size))
    expected = {
        "input_bn/gamma", "input_bn/beta", "input_bn/moving_mean",
        "input_bn/moving_variance",
        "cluster_weights", "cluster_bn/gamma", "cluster_bn/beta",
        "cluster_bn/moving_mean", "cluster_bn/moving_variance",
        "hidden1_weights", "hidden1_bn/gamma", "hidden1_bn/beta",
        "hidden1_bn/moving_mean", "hidden1_bn/moving_variance",
        "gates/weights", "experts/weights", "experts/biases",
    }
    assert names == expected, names ^ expected

    _, params, bs, _ = _init("NetVLADModelLF", rng, frame=True, d=1026)
    names = set(ci.export_reference_layout(params, bs, CFG.vocab_size))
    for want in (
        "video_VLAD/cluster_weights", "video_VLAD/cluster_weights2",
        "video_VLAD/cluster_bn/gamma", "video_VLAD/cluster_bn/moving_mean",
        "audio_VLAD/cluster_weights", "hidden1_weights", "hidden1_biases",
        "gating_weights", "gating_bn/gamma", "gates/weights",
        "experts/weights", "experts/biases", "input_bn/beta",
    ):
        assert want in names, (want, sorted(names))
