"""GAP@20 parity drill, part 2: the remaining BASELINE configs (1, 2, 5)
plus the recurrent family (LstmModel).

`test_gap_parity_drill.py` proved the end-to-end 1e-3 GAP promise for
NetVLADModelLF (config 4) and DbofModel (config 3).  This file completes the
must-parity matrix from `BASELINE.json#configs`:

- **config 1, LogisticModel** and **config 2, MoeModel** — the video-level
  path: tf.Example parse (`readers.py#YT8MAggregatedFeatureReader`
  transcription) → l2-normalize (`train.py#build_graph`) → head read from a
  TF1-Saver checkpoint under REFERENCE variable names
  (`fully_connected/weights`, mixture-major `gates/weights`) →
  reference-semantics EvaluationMetrics, vs our
  ``eval.py --reference_checkpoint`` with ``--frame_features=False``.
- **config 5, TransformerEncoderModel** — the full attention graph
  (input proj → masked encoder blocks → masked mean → gated MoE tail,
  ref: attention_modules.py#TransformerEncoder).  The reference's TF
  variable names for this family are [M]-confidence (SURVEY.md §2.2), so
  the checkpoint uses the importer's canonical layout (flax-verbatim for
  encoder leaves, reference names for the shared tail) — what the drill
  proves is cross-stack numerical parity of the COMPLETE pipeline
  (TFRecord parse → dequantize → pad → model → GAP), which holds for any
  naming.  The transformer consumes all frames deterministically (no
  sampling), so default, ``--fast_eval`` AND the ``--fast_forward`` fused
  path are all exactly comparable against the TF stack.

Determinism note: video-level features have no frame sampling at all; the
transformer uses every frame with a num_frames mask — both stacks are
deterministic end to end, so the deltas below measure numerics only.
"""

import os

import numpy as np
import pytest
import tensorflow as tf

from learnablepoolingmethods_tpu import eval as eval_cli
from learnablepoolingmethods_tpu.config import ModelConfig, TrainingConfig
from learnablepoolingmethods_tpu.core import checkpoint_import as ci
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.data.fixtures import (
    make_learnable_synthetic_frame_level,
    make_learnable_synthetic_video_level,
)
from learnablepoolingmethods_tpu.metrics import eval_util

FLAGS = eval_cli.FLAGS

V = 32
TOP_K = 20
BN_EPS = 1e-3
LN_EPS = 1e-6

# video-level set (configs 1–2)
VL_N, VL_RGB, VL_AUD = 400, 16, 4
VL_D = VL_RGB + VL_AUD

# frame-level set (config 5)
FL_N, FL_RGB, FL_AUD, MAXF = 400, 16, 4, 10
FL_D = FL_RGB + FL_AUD

ATTN_FLAGS = dict(
    attention_hidden_size=16,
    attention_heads=2,
    transformer_layers=2,
    transformer_ff_size=24,
    moe_num_mixtures=2,
)


def _train_and_export(model_name, data_pattern, ckpt_path, mcfg, reader,
                      frame_features, steps=35, lr=0.02, batch_size=64):
    """A few train steps on the drill set → TF1 checkpoint in the importer's
    canonical reference layout (core/checkpoint_import.py)."""
    import jax

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.core import optimizers
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.data import pipeline
    from learnablepoolingmethods_tpu.models import create_model

    tcfg = TrainingConfig(batch_size=batch_size, base_learning_rate=lr)
    model = create_model(model_name, mcfg)
    batches = pipeline.batch_iterator(
        reader, data_pattern, tcfg.batch_size, num_epochs=None, shuffle=True,
        seed=0,
    )
    first = next(batches)
    params, bs = step_lib.init_model_variables(
        model, first, frame_features=frame_features, seed=0
    )
    state = TrainState.create(params, bs, optimizers.create_optimizer(tcfg))
    step = jax.jit(
        step_lib.make_train_step(
            model, losses.CrossEntropyLoss(), tcfg, mcfg,
            frame_features=frame_features,
        ),
        donate_argnums=0,
    )
    rng = jax.random.key(0)
    batch = first
    for _ in range(steps):
        db = {k: v for k, v in batch.items() if k != "video_id"}
        state, metrics = step(state, db, rng)
        batch = next(batches)
    assert np.isfinite(float(metrics["loss"]))

    ref_vars = ci.export_reference_layout(
        jax.device_get(state.params), jax.device_get(state.batch_stats), V
    )
    tf1 = tf.compat.v1
    g = tf.Graph()
    with g.as_default():
        for name, val in ref_vars.items():
            tf1.Variable(initial_value=val, name=name)
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, ckpt_path, write_meta_graph=False)
    return ckpt_path


def _tf_stack_metrics(preds, labels):
    em = eval_util.EvaluationMetrics(V, TOP_K)
    em.accumulate(preds, labels, 0.0)
    return em.get()


def _our_stack_metrics(data_pattern, ckpt, model_name, *, frame_features,
                       feature_names, feature_sizes, max_frames=MAXF,
                       fast_eval=False, fast_forward=False, extra_flags=()):
    FLAGS(["gap_parity_drill_more"])
    FLAGS.eval_data_pattern = data_pattern
    FLAGS.reference_checkpoint = ckpt
    FLAGS.run_once = True
    FLAGS.fast_eval = fast_eval
    FLAGS.fast_forward = fast_forward
    FLAGS.batch_size = 32
    FLAGS.top_k = TOP_K
    FLAGS.model = model_name
    FLAGS.frame_features = frame_features
    FLAGS.feature_names = feature_names
    FLAGS.feature_sizes = feature_sizes
    FLAGS.max_frames = max_frames
    FLAGS.num_classes = V
    FLAGS.model_parallelism = 1
    FLAGS.dcn_parallelism = 1
    FLAGS.use_grain = False
    FLAGS.packed_cache_dir = ""
    FLAGS.int8_hidden = False  # sticky across parametrized runs otherwise
    for name, val in dict(extra_flags).items():
        setattr(FLAGS, name, val)
    return eval_cli.evaluation_loop()


# ---------------------------------------------------------------------------
# Video-level TF stack (configs 1–2)
# ---------------------------------------------------------------------------


def _tf_parse_video_level(data_pattern):
    """readers.py#YT8MAggregatedFeatureReader transcription: parse
    tf.Example {id, labels, mean_rgb[16], mean_audio[4]} → dense multi-hot."""

    def parse(rec):
        ex = tf.io.parse_single_example(
            rec,
            {
                "id": tf.io.FixedLenFeature([], tf.string),
                "labels": tf.io.VarLenFeature(tf.int64),
                "mean_rgb": tf.io.FixedLenFeature([VL_RGB], tf.float32),
                "mean_audio": tf.io.FixedLenFeature([VL_AUD], tf.float32),
            },
        )
        x = tf.concat([ex["mean_rgb"], ex["mean_audio"]], axis=0)
        labels = tf.sparse.to_dense(ex["labels"])
        multihot = tf.scatter_nd(
            labels[:, None], tf.ones_like(labels, tf.float32), [V]
        )
        return x, multihot

    ds = tf.data.TFRecordDataset(data_pattern).map(parse)
    xs, ys = [], []
    for x, y in ds:
        xs.append(x.numpy())
        ys.append(y.numpy())
    return np.stack(xs), np.stack(ys)


def _tf_eval_logistic(ckpt, x):
    """video_level_models.py#LogisticModel: l2-normalize → sigmoid FC
    (slim fully_connected variable names)."""
    r = tf.train.load_checkpoint(ckpt)
    h = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    logits = tf.matmul(
        h, tf.constant(r.get_tensor("fully_connected/weights"))
    ) + tf.constant(r.get_tensor("fully_connected/biases"))
    return tf.nn.sigmoid(logits).numpy()


def _tf_moe_reference(h, r, m):
    """video_level_models.py#MoeModel: mixture-major reshape(-1, M+1)."""
    gate_act = tf.matmul(h, tf.constant(r.get_tensor("gates/weights")))
    expert_act = tf.matmul(
        h, tf.constant(r.get_tensor("experts/weights"))
    ) + tf.constant(r.get_tensor("experts/biases"))
    gating = tf.nn.softmax(tf.reshape(gate_act, [-1, m + 1]))
    expert = tf.nn.sigmoid(tf.reshape(expert_act, [-1, m]))
    probs = tf.reduce_sum(gating[:, :m] * expert, 1)
    return tf.reshape(probs, [-1, V])


def _tf_eval_moe(ckpt, x, m):
    r = tf.train.load_checkpoint(ckpt)
    h = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    return _tf_moe_reference(h, r, m).numpy()


# ---------------------------------------------------------------------------
# Transformer TF stack (config 5)
# ---------------------------------------------------------------------------


def _tf_parse_frame_level(data_pattern):
    """readers.py#YT8MFrameFeatureReader transcription (same as the part-1
    drill): parse → decode_raw(uint8) → Dequantize(2, −2) → pad to MAXF."""

    def parse(rec):
        ctx, seq = tf.io.parse_single_sequence_example(
            rec,
            context_features={
                "id": tf.io.FixedLenFeature([], tf.string),
                "labels": tf.io.VarLenFeature(tf.int64),
            },
            sequence_features={
                "rgb": tf.io.FixedLenSequenceFeature([], tf.string),
                "audio": tf.io.FixedLenSequenceFeature([], tf.string),
            },
        )
        feats = []
        for name, width in (("rgb", FL_RGB), ("audio", FL_AUD)):
            raw = tf.cast(tf.io.decode_raw(seq[name], tf.uint8), tf.float32)
            deq = raw * (4.0 / 255.0) + (4.0 / 512.0 - 2.0)  # utils.Dequantize
            feats.append(tf.reshape(deq, [-1, width]))
        x = tf.concat(feats, axis=1)
        nf = tf.minimum(tf.shape(x)[0], MAXF)
        x = tf.pad(x[:MAXF], [[0, MAXF - nf], [0, 0]])  # resize_axis
        labels = tf.sparse.to_dense(ctx["labels"])
        multihot = tf.scatter_nd(
            labels[:, None], tf.ones_like(labels, tf.float32), [V]
        )
        return x, multihot, nf

    ds = tf.data.TFRecordDataset(data_pattern).map(parse)
    xs, ys, nfs = [], [], []
    for x, y, nf in ds:
        xs.append(x.numpy())
        ys.append(y.numpy())
        nfs.append(int(nf.numpy()))
    return np.stack(xs), np.stack(ys), np.asarray(nfs, np.int32)


def _ckpt_tree(ckpt):
    """Checkpoint variables → nested dict keyed by '/'-split names."""
    r = tf.train.load_checkpoint(ckpt)
    tree = {}
    for name in r.get_variable_to_shape_map():
        node = tree
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = r.get_tensor(name)
    return tree


def _t(a):
    return tf.constant(np.asarray(a, np.float32))


def _tf_layernorm(x, p):
    mean = tf.reduce_mean(x, axis=-1, keepdims=True)
    var = tf.reduce_mean(tf.square(x), axis=-1, keepdims=True) - tf.square(mean)
    return (x - mean) * tf.math.rsqrt(var + LN_EPS) * _t(p["scale"]) + _t(
        p["bias"]
    )


def _tf_mha(x, p, mask):
    """flax nn.MultiHeadDotProductAttention, deterministic, f32 (same
    transcription as tests/golden/test_attention_lstm_golden.py)."""
    head_dim = np.asarray(p["query"]["kernel"]).shape[-1]
    q = tf.einsum("bqd,dhk->bqhk", x, _t(p["query"]["kernel"])) + _t(
        p["query"]["bias"]
    )
    k = tf.einsum("bsd,dhk->bshk", x, _t(p["key"]["kernel"])) + _t(
        p["key"]["bias"]
    )
    v = tf.einsum("bsd,dhk->bshk", x, _t(p["value"]["kernel"])) + _t(
        p["value"]["bias"]
    )
    q = q / np.float32(np.sqrt(head_dim))
    logits = tf.einsum("bqhk,bshk->bhqs", q, k)
    logits = tf.where(mask, logits, tf.fill(tf.shape(logits), np.float32(-1e9)))
    w = tf.nn.softmax(logits, axis=-1)
    out = tf.einsum("bhqs,bshk->bqhk", w, v)
    return tf.einsum("bqhk,hkd->bqd", out, _t(p["out"]["kernel"])) + _t(
        p["out"]["bias"]
    )


def _tf_eval_transformer(ckpt, x, nf):
    """Full TransformerEncoderModel graph (attention.py#TransformerEncoderModel):
    l2-norm → input proj → masked encoder blocks → masked mean → hidden FC →
    gating BN → mixture-major MoE head."""
    tree = _ckpt_tree(ckpt)
    r = tf.train.load_checkpoint(ckpt)
    m = ATTN_FLAGS["moe_num_mixtures"]
    pad_mask = (np.arange(MAXF)[None, :] < nf[:, None]).astype(np.float32)

    h = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    h = tf.matmul(h, _t(tree["input_proj"]["kernel"])) + _t(
        tree["input_proj"]["bias"]
    )
    attn_mask = tf.cast(_t(pad_mask), tf.bool)[:, None, None, :] & tf.fill(
        (1, 1, MAXF, 1), True
    )
    for i in range(ATTN_FLAGS["transformer_layers"]):
        lp = tree["encoder"][f"layer_{i}"]
        attn = _tf_mha(h, lp["mha"], attn_mask)
        h = _tf_layernorm(h + attn, lp["ln1"])
        ff = tf.nn.relu(
            tf.matmul(h, _t(lp["ff1"]["kernel"])) + _t(lp["ff1"]["bias"])
        )
        ff = tf.matmul(ff, _t(lp["ff2"]["kernel"])) + _t(lp["ff2"]["bias"])
        h = _tf_layernorm(h + ff, lp["ln2"])

    denom = tf.maximum(tf.reduce_sum(_t(pad_mask), axis=1, keepdims=True), 1.0)
    pooled = tf.reduce_sum(h * _t(pad_mask)[:, :, None], axis=1) / denom

    h2 = tf.matmul(pooled, _t(r.get_tensor("hidden1_weights"))) + _t(
        r.get_tensor("hidden1_biases")
    )
    gates = tf.matmul(h2, _t(r.get_tensor("gating_weights")))
    gates = (gates - _t(r.get_tensor("gating_bn/moving_mean"))) * tf.math.rsqrt(
        _t(r.get_tensor("gating_bn/moving_variance")) + BN_EPS
    ) * _t(r.get_tensor("gating_bn/gamma")) + _t(r.get_tensor("gating_bn/beta"))
    h2 = h2 * tf.nn.sigmoid(gates)
    return _tf_moe_reference(h2, r, m).numpy()


# ---------------------------------------------------------------------------
# Fixtures + tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vl_drill(tmp_path_factory):
    from learnablepoolingmethods_tpu.data import readers

    root = str(tmp_path_factory.mktemp("gapdrill_vl"))
    data = os.path.join(root, "val_vl.tfrecord")
    make_learnable_synthetic_video_level(
        data, num_videos=VL_N, num_classes=V, rgb_size=VL_RGB,
        audio_size=VL_AUD, seed=7,
    )
    x, labels = _tf_parse_video_level(data)
    assert x.shape == (VL_N, VL_D)
    reader = readers.YT8MAggregatedFeatureReader(
        num_classes=V, feature_sizes=(VL_RGB, VL_AUD),
        feature_names=("mean_rgb", "mean_audio"),
    )
    mcfg = ModelConfig(vocab_size=V, moe_num_mixtures=2)
    ckpts = {
        name: _train_and_export(
            name, data, os.path.join(root, f"{name}.ckpt"), mcfg, reader,
            frame_features=False,
        )
        for name in ("LogisticModel", "MoeModel")
    }
    return data, ckpts, x, labels


@pytest.mark.parametrize("model_name", ["LogisticModel", "MoeModel"])
def test_gap_parity_video_level(vl_drill, model_name):
    data, ckpts, x, labels = vl_drill
    if model_name == "LogisticModel":
        tf_preds = _tf_eval_logistic(ckpts[model_name], x)
    else:
        tf_preds = _tf_eval_moe(ckpts[model_name], x, m=2)
    tf_info = _tf_stack_metrics(tf_preds, labels)

    kw = dict(
        frame_features=False,
        feature_names="mean_rgb,mean_audio",
        feature_sizes=f"{VL_RGB},{VL_AUD}",
        extra_flags={"moe_num_mixtures": 2},
    )
    our_info = _our_stack_metrics(data, ckpts[model_name], model_name, **kw)
    fast_info = _our_stack_metrics(
        data, ckpts[model_name], model_name, fast_eval=True, **kw
    )

    d_gap = abs(tf_info["gap"] - our_info["gap"])
    d_gap_fast = abs(tf_info["gap"] - fast_info["gap"])
    print(
        f"\nGAP-parity drill [{model_name}]: TF={tf_info['gap']:.6f} "
        f"ours={our_info['gap']:.6f} (Δ={d_gap:.2e}) "
        f"fast={fast_info['gap']:.6f} (Δ={d_gap_fast:.2e})"
    )
    assert tf_info["gap"] > 0.2, f"drill model did not train ({tf_info['gap']})"
    assert d_gap <= 1e-3, (tf_info["gap"], our_info["gap"])
    assert d_gap_fast <= 1e-3, (tf_info["gap"], fast_info["gap"])
    assert abs(tf_info["avg_hit_at_one"] - our_info["avg_hit_at_one"]) <= 1e-3
    assert abs(tf_info["avg_perr"] - our_info["avg_perr"]) <= 1e-3


@pytest.fixture(scope="module")
def attn_drill(tmp_path_factory):
    from learnablepoolingmethods_tpu.data import readers

    root = str(tmp_path_factory.mktemp("gapdrill_attn"))
    data = os.path.join(root, "val_fl.tfrecord")
    make_learnable_synthetic_frame_level(
        data, num_videos=FL_N, num_classes=V, rgb_size=FL_RGB,
        audio_size=FL_AUD, max_frames=MAXF, seed=11,
    )
    x, labels, nf = _tf_parse_frame_level(data)
    assert x.shape == (FL_N, MAXF, FL_D)
    reader = readers.YT8MFrameFeatureReader(
        num_classes=V, feature_sizes=(FL_RGB, FL_AUD),
        feature_names=("rgb", "audio"), max_frames=MAXF,
    )
    mcfg = ModelConfig(vocab_size=V, **ATTN_FLAGS)
    ckpt = _train_and_export(
        "TransformerEncoderModel", data, os.path.join(root, "attn.ckpt"),
        mcfg, reader, frame_features=True, steps=45,
    )
    return data, ckpt, x, labels, nf


def test_gap_parity_transformer(attn_drill):
    data, ckpt, x, labels, nf = attn_drill
    tf_preds = _tf_eval_transformer(ckpt, x, nf)
    tf_info = _tf_stack_metrics(tf_preds, labels)

    kw = dict(
        frame_features=True,
        feature_names="rgb,audio",
        feature_sizes=f"{FL_RGB},{FL_AUD}",
        extra_flags=ATTN_FLAGS,
    )
    name = "TransformerEncoderModel"
    our_info = _our_stack_metrics(data, ckpt, name, **kw)
    fast_info = _our_stack_metrics(data, ckpt, name, fast_eval=True, **kw)
    # the transformer samples nothing, so even the fused --fast_forward path
    # is deterministic and exactly comparable against the TF stack
    fused_info = _our_stack_metrics(data, ckpt, name, fast_forward=True, **kw)

    d = abs(tf_info["gap"] - our_info["gap"])
    d_fast = abs(tf_info["gap"] - fast_info["gap"])
    d_fused = abs(tf_info["gap"] - fused_info["gap"])
    print(
        f"\nGAP-parity drill [TransformerEncoderModel]: TF={tf_info['gap']:.6f} "
        f"ours={our_info['gap']:.6f} (Δ={d:.2e}) "
        f"fast={fast_info['gap']:.6f} (Δ={d_fast:.2e}) "
        f"fused={fused_info['gap']:.6f} (Δ={d_fused:.2e})"
    )
    assert tf_info["gap"] > 0.2, f"drill model did not train ({tf_info['gap']})"
    assert d <= 1e-3, (tf_info["gap"], our_info["gap"])
    assert d_fast <= 1e-3, (tf_info["gap"], fast_info["gap"])
    assert d_fused <= 1e-3, (tf_info["gap"], fused_info["gap"])
    assert abs(tf_info["avg_hit_at_one"] - our_info["avg_hit_at_one"]) <= 1e-3
    assert abs(tf_info["avg_perr"] - our_info["avg_perr"]) <= 1e-3


# ---------------------------------------------------------------------------
# LstmModel arm — the recurrent family end-to-end
# ---------------------------------------------------------------------------

LSTM_FLAGS = dict(lstm_cells=16, lstm_layers=2, moe_num_mixtures=2)


def _tf_eval_lstm(ckpt, x, nf):
    """Full LstmModel graph (frame_level_models.py#LstmModel): l2-norm →
    2 stacked BasicLSTMCells (fused [D+H,4H] kernels read from the
    checkpoint under reference names, runtime forget_bias=1.0,
    sequence_length-frozen state — dynamic_rnn semantics) → final h → MoE."""
    r = tf.train.load_checkpoint(ckpt)
    m = LSTM_FLAGS["moe_num_mixtures"]
    h_units = LSTM_FLAGS["lstm_cells"]

    seq = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    nf_t = tf.constant(nf)
    final_h = None
    for layer in range(LSTM_FLAGS["lstm_layers"]):
        scope = f"RNN/rnn/multi_rnn_cell/cell_{layer}/basic_lstm_cell"
        w = tf.constant(r.get_tensor(f"{scope}/kernel"))
        b = tf.constant(r.get_tensor(f"{scope}/bias"))
        b_sz = seq.shape[0]
        c = tf.zeros((b_sz, h_units), tf.float32)
        hh = tf.zeros((b_sz, h_units), tf.float32)
        outs = []
        for t in range(seq.shape[1]):
            zt = tf.matmul(tf.concat([seq[:, t], hh], axis=1), w) + b
            i, j, f, o = tf.split(zt, 4, axis=1)
            new_c = c * tf.sigmoid(f + 1.0) + tf.sigmoid(i) * tf.tanh(j)
            new_h = tf.tanh(new_c) * tf.sigmoid(o)
            alive = tf.cast(t < nf_t, tf.float32)[:, None]
            c = alive * new_c + (1 - alive) * c
            hh = alive * new_h + (1 - alive) * hh
            outs.append(alive * new_h)
        seq = tf.stack(outs, axis=1)
        final_h = hh
    return _tf_moe_reference(final_h, r, m).numpy()


@pytest.fixture(scope="module")
def lstm_drill(tmp_path_factory):
    from learnablepoolingmethods_tpu.data import readers

    root = str(tmp_path_factory.mktemp("gapdrill_lstm"))
    data = os.path.join(root, "val_lstm.tfrecord")
    make_learnable_synthetic_frame_level(
        data, num_videos=FL_N, num_classes=V, rgb_size=FL_RGB,
        audio_size=FL_AUD, max_frames=MAXF, seed=13,
    )
    x, labels, nf = _tf_parse_frame_level(data)
    reader = readers.YT8MFrameFeatureReader(
        num_classes=V, feature_sizes=(FL_RGB, FL_AUD),
        feature_names=("rgb", "audio"), max_frames=MAXF,
    )
    mcfg = ModelConfig(vocab_size=V, **LSTM_FLAGS)
    ckpt = _train_and_export(
        "LstmModel", data, os.path.join(root, "lstm.ckpt"), mcfg, reader,
        frame_features=True, steps=60, lr=0.05,
    )
    return data, ckpt, x, labels, nf


def test_gap_parity_lstm(lstm_drill):
    data, ckpt, x, labels, nf = lstm_drill
    tf_info = _tf_stack_metrics(_tf_eval_lstm(ckpt, x, nf), labels)

    kw = dict(
        frame_features=True,
        feature_names="rgb,audio",
        feature_sizes=f"{FL_RGB},{FL_AUD}",
        extra_flags=LSTM_FLAGS,
    )
    our_info = _our_stack_metrics(data, ckpt, "LstmModel", **kw)
    fast_info = _our_stack_metrics(data, ckpt, "LstmModel", fast_eval=True, **kw)

    d = abs(tf_info["gap"] - our_info["gap"])
    d_fast = abs(tf_info["gap"] - fast_info["gap"])
    print(
        f"\nGAP-parity drill [LstmModel]: TF={tf_info['gap']:.6f} "
        f"ours={our_info['gap']:.6f} (Δ={d:.2e}) "
        f"fast={fast_info['gap']:.6f} (Δ={d_fast:.2e})"
    )
    assert tf_info["gap"] > 0.2, f"drill model did not train ({tf_info['gap']})"
    assert d <= 1e-3, (tf_info["gap"], our_info["gap"])
    assert d_fast <= 1e-3, (tf_info["gap"], fast_info["gap"])
    assert abs(tf_info["avg_hit_at_one"] - our_info["avg_hit_at_one"]) <= 1e-3


GRU_FLAGS = dict(gru_cells=16, gru_layers=2, moe_num_mixtures=2)


def _tf_eval_gru(ckpt, x, nf):
    """Full GruModel graph: l2-norm → stacked reset-after GRU cells (read
    from the checkpoint's verbatim flax layout — the rebuild's GRU is the
    reset-after variant, tests/golden/test_attention_lstm_golden.py) →
    final h → MoE."""
    tree = _ckpt_tree(ckpt)
    r = tf.train.load_checkpoint(ckpt)
    m = GRU_FLAGS["moe_num_mixtures"]
    h_units = GRU_FLAGS["gru_cells"]

    def _t(a):
        return tf.constant(np.asarray(a, np.float32))

    seq = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    nf_t = tf.constant(nf)
    hh = None
    for layer in range(GRU_FLAGS["gru_layers"]):
        cp = tree[f"GRUCell_{layer}"]
        b_sz = seq.shape[0]
        hh = tf.zeros((b_sz, h_units), tf.float32)
        outs = []
        for t in range(seq.shape[1]):
            xt = seq[:, t]
            rg = tf.sigmoid(
                tf.matmul(xt, _t(cp["ir"]["kernel"])) + _t(cp["ir"]["bias"])
                + tf.matmul(hh, _t(cp["hr"]["kernel"]))
            )
            z = tf.sigmoid(
                tf.matmul(xt, _t(cp["iz"]["kernel"])) + _t(cp["iz"]["bias"])
                + tf.matmul(hh, _t(cp["hz"]["kernel"]))
            )
            n = tf.tanh(
                tf.matmul(xt, _t(cp["in"]["kernel"])) + _t(cp["in"]["bias"])
                + rg * (tf.matmul(hh, _t(cp["hn"]["kernel"])) + _t(cp["hn"]["bias"]))
            )
            new_h = (1.0 - z) * n + z * hh
            alive = tf.cast(t < nf_t, tf.float32)[:, None]
            hh = alive * new_h + (1 - alive) * hh
            outs.append(alive * new_h)
        seq = tf.stack(outs, axis=1)
    return _tf_moe_reference(hh, r, m).numpy()


def test_gap_parity_gru(tmp_path_factory):
    from learnablepoolingmethods_tpu.data import readers

    root = str(tmp_path_factory.mktemp("gapdrill_gru"))
    data = os.path.join(root, "val_gru.tfrecord")
    make_learnable_synthetic_frame_level(
        data, num_videos=FL_N, num_classes=V, rgb_size=FL_RGB,
        audio_size=FL_AUD, max_frames=MAXF, seed=17,
    )
    x, labels, nf = _tf_parse_frame_level(data)
    reader = readers.YT8MFrameFeatureReader(
        num_classes=V, feature_sizes=(FL_RGB, FL_AUD),
        feature_names=("rgb", "audio"), max_frames=MAXF,
    )
    mcfg = ModelConfig(vocab_size=V, **GRU_FLAGS)
    ckpt = _train_and_export(
        "GruModel", data, os.path.join(root, "gru.ckpt"), mcfg, reader,
        frame_features=True, steps=60, lr=0.05,
    )

    tf_info = _tf_stack_metrics(_tf_eval_gru(ckpt, x, nf), labels)
    our_info = _our_stack_metrics(
        data, ckpt, "GruModel", frame_features=True,
        feature_names="rgb,audio", feature_sizes=f"{FL_RGB},{FL_AUD}",
        extra_flags=GRU_FLAGS,
    )
    d = abs(tf_info["gap"] - our_info["gap"])
    print(
        f"\nGAP-parity drill [GruModel]: TF={tf_info['gap']:.6f} "
        f"ours={our_info['gap']:.6f} (Δ={d:.2e})"
    )
    assert tf_info["gap"] > 0.2, f"drill model did not train ({tf_info['gap']})"
    assert d <= 1e-3, (tf_info["gap"], our_info["gap"])


# ---------------------------------------------------------------------------
# LOUPE-LF variants (NetFV / NetRVLAD / SoftDBoW) — the remaining families
# ---------------------------------------------------------------------------

LF_FLAGS = dict(
    iterations=MAXF,
    sample_random_frames=False,
    netvlad_hidden_size=16,
    fv_cluster_size=8,
    rvlad_cluster_size=8,
    dbow_cluster_size=16,
    moe_num_mixtures=2,
)


def _tf_bn(x, r, scope):
    return (x - tf.constant(r.get_tensor(f"{scope}/moving_mean"))) * tf.math.rsqrt(
        tf.constant(r.get_tensor(f"{scope}/moving_variance")) + BN_EPS
    ) * tf.constant(r.get_tensor(f"{scope}/gamma")) + tf.constant(
        r.get_tensor(f"{scope}/beta")
    )


def _tf_window_sample(x, nf):
    """train.py l2-normalize + deterministic window (iterations==max_frames
    ⇒ idx_t = min(t, nf−1)) — same as drill part 1."""
    x = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    idx = tf.minimum(tf.range(MAXF)[None, :], tf.constant(nf)[:, None] - 1)
    return tf.gather(x, idx, batch_dims=1)


def _tf_lf_assignment(frames, r, scope, k):
    """softmax(BN(X·cluster_weights)) → [B, F, K] (BN replaces the bias in
    the default add_batch_norm config, all LOUPE modules)."""
    acts = tf.matmul(
        tf.reshape(frames, [-1, FL_D]),
        tf.constant(r.get_tensor(f"{scope}/cluster_weights")),
    )
    acts = _tf_bn(acts, r, f"{scope}/cluster_bn")
    return tf.reshape(tf.nn.softmax(acts), [-1, MAXF, k])


def _tf_lf_tail(pooled, r, m):
    h = tf.matmul(pooled, tf.constant(r.get_tensor("hidden1_weights"))) + tf.constant(
        r.get_tensor("hidden1_biases")
    )
    gates = tf.matmul(h, tf.constant(r.get_tensor("gating_weights")))
    gates = _tf_bn(gates, r, "gating_bn")
    h = h * tf.nn.sigmoid(gates)
    return _tf_moe_reference(h, r, m).numpy()


def _tf_eval_netfv(ckpt, x, nf):
    """frame_level_models.py#NetFVModelLF: 1st+2nd-order Fisher statistics
    (video_pooling_modules.py#NetFV transcription, BN'd assignment)."""
    r = tf.train.load_checkpoint(ckpt)
    k = LF_FLAGS["fv_cluster_size"]
    frames = _tf_window_sample(x, nf)
    frames = _tf_bn(frames, r, "input_bn")
    scope = "video_FV"
    cw2 = tf.constant(r.get_tensor(f"{scope}/cluster_weights2"))
    covar = tf.square(tf.constant(r.get_tensor(f"{scope}/covar_weights"))) + 1e-6
    activation = _tf_lf_assignment(frames, r, scope, k)
    a_sum = tf.reduce_sum(activation, -2, keepdims=True)
    a = tf.multiply(a_sum, cw2)
    activation_t = tf.transpose(activation, perm=[0, 2, 1])
    xb = tf.reshape(frames, [-1, MAXF, FL_D])
    fv1 = tf.transpose(tf.matmul(activation_t, xb), perm=[0, 2, 1])
    a2 = tf.multiply(a_sum, tf.square(cw2))
    b2 = tf.multiply(fv1, cw2)
    fv2 = tf.transpose(tf.matmul(activation_t, tf.square(xb)), perm=[0, 2, 1])
    fv2 = a2 + fv2 - 2 * b2
    fv2 = tf.divide(fv2, tf.square(covar))
    fv2 = tf.subtract(fv2, a_sum)
    fv2 = tf.nn.l2_normalize(fv2, 1)
    fv2 = tf.reshape(fv2, [-1, k * FL_D])
    fv2 = tf.nn.l2_normalize(fv2, 1)
    fv1 = tf.subtract(fv1, a)
    fv1 = tf.divide(fv1, covar)
    fv1 = tf.nn.l2_normalize(fv1, 1)
    fv1 = tf.reshape(fv1, [-1, k * FL_D])
    fv1 = tf.nn.l2_normalize(fv1, 1)
    pooled = tf.concat([fv1, fv2], 1)
    return _tf_lf_tail(pooled, r, LF_FLAGS["moe_num_mixtures"])


def _tf_eval_netrvlad(ckpt, x, nf):
    """NetRVLAD: residual-less VLAD (no center subtraction)."""
    r = tf.train.load_checkpoint(ckpt)
    k = LF_FLAGS["rvlad_cluster_size"]
    frames = _tf_window_sample(x, nf)
    frames = _tf_bn(frames, r, "input_bn")
    activation = _tf_lf_assignment(frames, r, "video_RVLAD", k)
    activation_t = tf.transpose(activation, perm=[0, 2, 1])
    xb = tf.reshape(frames, [-1, MAXF, FL_D])
    vlad = tf.transpose(tf.matmul(activation_t, xb), perm=[0, 2, 1])
    vlad = tf.nn.l2_normalize(vlad, 1)
    vlad = tf.reshape(vlad, [-1, k * FL_D])
    pooled = tf.nn.l2_normalize(vlad, 1)
    return _tf_lf_tail(pooled, r, LF_FLAGS["moe_num_mixtures"])


def _tf_eval_softdbof(ckpt, x, nf):
    """SoftDBoW: soft-assignment histogram."""
    r = tf.train.load_checkpoint(ckpt)
    k = LF_FLAGS["dbow_cluster_size"]
    frames = _tf_window_sample(x, nf)
    frames = _tf_bn(frames, r, "input_bn")
    activation = _tf_lf_assignment(frames, r, "video_DBOW", k)
    bow = tf.reduce_sum(activation, 1)
    pooled = tf.nn.l2_normalize(bow, 1)
    return _tf_lf_tail(pooled, r, LF_FLAGS["moe_num_mixtures"])


_LF_EVALS = {
    "NetFVModelLF": _tf_eval_netfv,
    "NetRVLADModelLF": _tf_eval_netrvlad,
    "SoftDbofModelLF": _tf_eval_softdbof,
}


@pytest.fixture(scope="module")
def lf_drill(tmp_path_factory):
    from learnablepoolingmethods_tpu.data import readers

    root = str(tmp_path_factory.mktemp("gapdrill_lf"))
    data = os.path.join(root, "val_lf.tfrecord")
    make_learnable_synthetic_frame_level(
        data, num_videos=FL_N, num_classes=V, rgb_size=FL_RGB,
        audio_size=FL_AUD, max_frames=MAXF, seed=19,
    )
    x, labels, nf = _tf_parse_frame_level(data)
    reader = readers.YT8MFrameFeatureReader(
        num_classes=V, feature_sizes=(FL_RGB, FL_AUD),
        feature_names=("rgb", "audio"), max_frames=MAXF,
    )
    mcfg = ModelConfig(vocab_size=V, **LF_FLAGS)
    ckpts = {
        name: _train_and_export(
            name, data, os.path.join(root, f"{name}.ckpt"), mcfg, reader,
            frame_features=True, steps=30,
        )
        for name in _LF_EVALS
    }
    return data, ckpts, x, labels, nf


@pytest.mark.parametrize("model_name", sorted(_LF_EVALS))
def test_gap_parity_lf_variants(lf_drill, model_name):
    data, ckpts, x, labels, nf = lf_drill
    tf_info = _tf_stack_metrics(_LF_EVALS[model_name](ckpts[model_name], x, nf), labels)
    our_info = _our_stack_metrics(
        data, ckpts[model_name], model_name, frame_features=True,
        feature_names="rgb,audio", feature_sizes=f"{FL_RGB},{FL_AUD}",
        extra_flags=LF_FLAGS,
    )
    d = abs(tf_info["gap"] - our_info["gap"])
    print(
        f"\nGAP-parity drill [{model_name}]: TF={tf_info['gap']:.6f} "
        f"ours={our_info['gap']:.6f} (Δ={d:.2e})"
    )
    assert tf_info["gap"] > 0.2, f"drill model did not train ({tf_info['gap']})"
    assert d <= 1e-3, (tf_info["gap"], our_info["gap"])
    assert abs(tf_info["avg_hit_at_one"] - our_info["avg_hit_at_one"]) <= 1e-3

    if model_name == "NetFVModelLF":
        # int8-hidden accuracy on this trained set, measured the way the
        # NetVLAD +14% row was: fused eval bf16 vs int8 under IDENTICAL
        # rng (same sampled frames → the delta isolates the int8 weights).
        # The drill's deterministic contiguous-window eval itself cannot
        # take the fast path (it samples iid by design), so the oracle
        # here is the fused bf16 eval, itself drill-validated above via
        # the flax default path.
        kw = dict(
            frame_features=True, feature_names="rgb,audio",
            feature_sizes=f"{FL_RGB},{FL_AUD}", fast_forward=True,
        )
        f16_info = _our_stack_metrics(
            data, ckpts[model_name], model_name, **kw,
            extra_flags={**LF_FLAGS, "sample_random_frames": True},
        )
        i8_info = _our_stack_metrics(
            data, ckpts[model_name], model_name, **kw,
            extra_flags={
                **LF_FLAGS, "sample_random_frames": True, "int8_hidden": True,
            },
        )
        d8 = abs(f16_info["gap"] - i8_info["gap"])
        print(f"GAP-parity drill [netfv int8 vs fused bf16]: Δ={d8:.2e}")
        assert d8 <= 1e-3, (f16_info["gap"], i8_info["gap"])


# ---------------------------------------------------------------------------
# FrameLevelLogisticModel + the remaining attention models — the matrix is
# now literally every reference-lineage model in the zoo
# ---------------------------------------------------------------------------


def _tf_eval_frame_logistic(ckpt, x, nf):
    """frame_level_models.py#FrameLevelLogisticModel: zero-padded sum over
    frames / num_frames → sigmoid FC (slim names)."""
    r = tf.train.load_checkpoint(ckpt)
    h = tf.nn.l2_normalize(tf.constant(x), axis=-1)  # pads stay zero
    pooled = tf.reduce_sum(h, axis=1) / tf.maximum(
        tf.cast(tf.constant(nf), tf.float32), 1.0
    )[:, None]
    logits = tf.matmul(
        pooled, tf.constant(r.get_tensor("fully_connected/weights"))
    ) + tf.constant(r.get_tensor("fully_connected/biases"))
    return tf.nn.sigmoid(logits).numpy()


def test_gap_parity_frame_logistic(tmp_path_factory):
    from learnablepoolingmethods_tpu.data import readers

    root = str(tmp_path_factory.mktemp("gapdrill_fll"))
    data = os.path.join(root, "val_fll.tfrecord")
    make_learnable_synthetic_frame_level(
        data, num_videos=FL_N, num_classes=V, rgb_size=FL_RGB,
        audio_size=FL_AUD, max_frames=MAXF, seed=23,
    )
    x, labels, nf = _tf_parse_frame_level(data)
    reader = readers.YT8MFrameFeatureReader(
        num_classes=V, feature_sizes=(FL_RGB, FL_AUD),
        feature_names=("rgb", "audio"), max_frames=MAXF,
    )
    mcfg = ModelConfig(vocab_size=V)
    ckpt = _train_and_export(
        "FrameLevelLogisticModel", data, os.path.join(root, "fll.ckpt"),
        mcfg, reader, frame_features=True, steps=40, lr=0.05,
    )
    tf_info = _tf_stack_metrics(_tf_eval_frame_logistic(ckpt, x, nf), labels)
    our_info = _our_stack_metrics(
        data, ckpt, "FrameLevelLogisticModel", frame_features=True,
        feature_names="rgb,audio", feature_sizes=f"{FL_RGB},{FL_AUD}",
    )
    d = abs(tf_info["gap"] - our_info["gap"])
    print(
        f"\nGAP-parity drill [FrameLevelLogisticModel]: TF={tf_info['gap']:.6f} "
        f"ours={our_info['gap']:.6f} (Δ={d:.2e})"
    )
    assert tf_info["gap"] > 0.2
    assert d <= 1e-3, (tf_info["gap"], our_info["gap"])


def _tf_mha_generic(xq, xkv, p, mask):
    """flax MultiHeadDotProductAttention from checkpoint-tree params."""
    def _t(a):
        return tf.constant(np.asarray(a, np.float32))

    head_dim = np.asarray(p["query"]["kernel"]).shape[-1]
    q = tf.einsum("bqd,dhk->bqhk", xq, _t(p["query"]["kernel"])) + _t(p["query"]["bias"])
    k = tf.einsum("bsd,dhk->bshk", xkv, _t(p["key"]["kernel"])) + _t(p["key"]["bias"])
    v = tf.einsum("bsd,dhk->bshk", xkv, _t(p["value"]["kernel"])) + _t(p["value"]["bias"])
    q = q / np.float32(np.sqrt(head_dim))
    logits = tf.einsum("bqhk,bshk->bhqs", q, k)
    logits = tf.where(mask, logits, tf.fill(tf.shape(logits), np.float32(-1e9)))
    w = tf.nn.softmax(logits, axis=-1)
    out = tf.einsum("bhqs,bshk->bqhk", w, v)
    return tf.einsum("bqhk,hkd->bqd", out, _t(p["out"]["kernel"])) + _t(p["out"]["bias"])


def _tf_encoder_from_tree(h, tree, n_layers, pad_mask):
    def _t(a):
        return tf.constant(np.asarray(a, np.float32))

    attn_mask = tf.cast(pad_mask, tf.bool)[:, None, None, :] & tf.fill(
        (1, 1, int(h.shape[1]), 1), True
    )
    for i in range(n_layers):
        lp = tree["encoder"][f"layer_{i}"]
        attn = _tf_mha_generic(h, h, lp["mha"], attn_mask)
        h = _tf_ln(h + attn, lp["ln1"])
        ff = tf.nn.relu(tf.matmul(h, _t(lp["ff1"]["kernel"])) + _t(lp["ff1"]["bias"]))
        ff = tf.matmul(ff, _t(lp["ff2"]["kernel"])) + _t(lp["ff2"]["bias"])
        h = _tf_ln(h + ff, lp["ln2"])
    return h


def _tf_ln(x, p):
    mean = tf.reduce_mean(x, axis=-1, keepdims=True)
    var = tf.reduce_mean(tf.square(x), axis=-1, keepdims=True) - tf.square(mean)
    return (x - mean) * tf.math.rsqrt(var + LN_EPS) * tf.constant(
        np.asarray(p["scale"], np.float32)
    ) + tf.constant(np.asarray(p["bias"], np.float32))


ATTN2_FLAGS = dict(
    attention_hidden_size=16,
    attention_heads=2,
    transformer_layers=2,
    transformer_ff_size=24,
    attention_cluster_size=3,
    netvlad_cluster_size=4,
    netvlad_hidden_size=16,
    moe_num_mixtures=2,
)


def _tf_eval_attention_pooling(ckpt, x, nf):
    """attention.py#AttentionPoolingModel: learned-query MHA pooling →
    concat → gated tail."""
    tree = _ckpt_tree(ckpt)
    r = tf.train.load_checkpoint(ckpt)
    pad_mask = (np.arange(MAXF)[None, :] < nf[:, None]).astype(np.float32)
    b = x.shape[0]

    h = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    h = tf.matmul(h, tf.constant(tree["input_proj"]["kernel"])) + tf.constant(
        tree["input_proj"]["bias"]
    )
    q_param = np.asarray(tree["attn_pool"]["queries"], np.float32)
    nq = q_param.shape[0]
    q = tf.tile(tf.constant(q_param)[None], [b, 1, 1])
    attn_mask = tf.cast(tf.constant(pad_mask), tf.bool)[:, None, None, :] & tf.fill(
        (1, 1, nq, 1), True
    )
    pooled = _tf_mha_generic(q, h, tree["attn_pool"]["pool_mha"], attn_mask)
    pooled = tf.reshape(pooled, [b, nq * ATTN2_FLAGS["attention_hidden_size"]])
    return _tf_lf_tail(pooled, r, ATTN2_FLAGS["moe_num_mixtures"])


def _tf_eval_attention_netvlad(ckpt, x, nf):
    """attention.py#AttentionNetVLADModel: encoder → mask-zero → NetVLAD
    (BN'd assignment) → gated tail."""
    tree = _ckpt_tree(ckpt)
    r = tf.train.load_checkpoint(ckpt)
    d = ATTN2_FLAGS["attention_hidden_size"]
    k = ATTN2_FLAGS["netvlad_cluster_size"]
    pad_mask = (np.arange(MAXF)[None, :] < nf[:, None]).astype(np.float32)

    h = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    h = tf.matmul(h, tf.constant(tree["input_proj"]["kernel"])) + tf.constant(
        tree["input_proj"]["bias"]
    )
    h = _tf_encoder_from_tree(
        h, tree, ATTN2_FLAGS["transformer_layers"], tf.constant(pad_mask)
    )
    h = h * tf.constant(pad_mask)[:, :, None]

    vp = tree["vlad"]
    acts = tf.matmul(tf.reshape(h, [-1, d]), tf.constant(vp["cluster_weights"]))
    acts = (acts - tf.constant(vp["cluster_bn"]["moving_mean"])) * tf.math.rsqrt(
        tf.constant(vp["cluster_bn"]["moving_variance"]) + BN_EPS
    ) * tf.constant(vp["cluster_bn"]["gamma"]) + tf.constant(
        vp["cluster_bn"]["beta"]
    )
    acts = tf.reshape(tf.nn.softmax(acts), [-1, MAXF, k])
    a_sum = tf.reduce_sum(acts, -2, keepdims=True)
    a = a_sum * tf.constant(np.asarray(vp["cluster_weights2"], np.float32))
    vlad = tf.matmul(tf.transpose(acts, [0, 2, 1]), tf.reshape(h, [-1, MAXF, d]))
    vlad = tf.transpose(vlad, [0, 2, 1]) - a
    vlad = tf.nn.l2_normalize(vlad, 1)
    vlad = tf.reshape(vlad, [-1, k * d])
    pooled = tf.nn.l2_normalize(vlad, 1)
    return _tf_lf_tail(pooled, r, ATTN2_FLAGS["moe_num_mixtures"])


_ATTN2_EVALS = {
    "AttentionPoolingModel": _tf_eval_attention_pooling,
    "AttentionNetVLADModel": _tf_eval_attention_netvlad,
}


@pytest.fixture(scope="module")
def attn2_drill(tmp_path_factory):
    from learnablepoolingmethods_tpu.data import readers

    root = str(tmp_path_factory.mktemp("gapdrill_attn2"))
    data = os.path.join(root, "val_attn2.tfrecord")
    make_learnable_synthetic_frame_level(
        data, num_videos=FL_N, num_classes=V, rgb_size=FL_RGB,
        audio_size=FL_AUD, max_frames=MAXF, seed=29,
    )
    x, labels, nf = _tf_parse_frame_level(data)
    reader = readers.YT8MFrameFeatureReader(
        num_classes=V, feature_sizes=(FL_RGB, FL_AUD),
        feature_names=("rgb", "audio"), max_frames=MAXF,
    )
    mcfg = ModelConfig(vocab_size=V, **ATTN2_FLAGS)
    ckpts = {
        name: _train_and_export(
            name, data, os.path.join(root, f"{name}.ckpt"), mcfg, reader,
            frame_features=True, steps=45,
        )
        for name in _ATTN2_EVALS
    }
    return data, ckpts, x, labels, nf


@pytest.mark.parametrize("model_name", sorted(_ATTN2_EVALS))
def test_gap_parity_attention_models(attn2_drill, model_name):
    data, ckpts, x, labels, nf = attn2_drill
    tf_info = _tf_stack_metrics(
        _ATTN2_EVALS[model_name](ckpts[model_name], x, nf), labels
    )
    our_info = _our_stack_metrics(
        data, ckpts[model_name], model_name, frame_features=True,
        feature_names="rgb,audio", feature_sizes=f"{FL_RGB},{FL_AUD}",
        extra_flags=ATTN2_FLAGS,
    )
    d = abs(tf_info["gap"] - our_info["gap"])
    print(
        f"\nGAP-parity drill [{model_name}]: TF={tf_info['gap']:.6f} "
        f"ours={our_info['gap']:.6f} (Δ={d:.2e})"
    )
    assert tf_info["gap"] > 0.2, f"drill model did not train ({tf_info['gap']})"
    assert d <= 1e-3, (tf_info["gap"], our_info["gap"])

    if model_name == "AttentionNetVLADModel":
        # the int8-hidden fast path must also hold the 1e-3 GAP budget on
        # this trained set (the NetVLAD path's analog measured 3.1e-4)
        i8_info = _our_stack_metrics(
            data, ckpts[model_name], model_name, frame_features=True,
            feature_names="rgb,audio", feature_sizes=f"{FL_RGB},{FL_AUD}",
            fast_forward=True,
            extra_flags={**ATTN2_FLAGS, "int8_hidden": True},
        )
        d8 = abs(tf_info["gap"] - i8_info["gap"])
        print(f"GAP-parity drill [attn-netvlad int8]: Δ={d8:.2e}")
        assert d8 <= 1e-3, (tf_info["gap"], i8_info["gap"])


# ---------------------------------------------------------------------------
# NeXtVLADModel — the 14th model: the matrix is complete
# ---------------------------------------------------------------------------

NXV_FLAGS = dict(
    iterations=MAXF,
    sample_random_frames=False,
    netvlad_hidden_size=16,
    nextvlad_cluster_size=8,
    nextvlad_groups=8,
    moe_num_mixtures=2,
)


def _tf_eval_nextvlad(ckpt, x, nf):
    """NeXtVLADModel (arXiv:1811.05014 transcription, modules.py#NeXtVLAD):
    expansion → group attention × grouped soft assignment (BN'd) → residual
    aggregation → intra-ℓ2 → vlad BN → gated tail."""
    tree = _ckpt_tree(ckpt)
    r = tf.train.load_checkpoint(ckpt)
    g, k = NXV_FLAGS["nextvlad_groups"], NXV_FLAGS["nextvlad_cluster_size"]
    lam_d = 2 * FL_D
    dp = lam_d // g
    vp = tree["NeXtVLAD_0"]

    def _t(a):
        return tf.constant(np.asarray(a, np.float32))

    def _bn_tree(z, bnp):
        return (z - _t(bnp["moving_mean"])) * tf.math.rsqrt(
            _t(bnp["moving_variance"]) + BN_EPS
        ) * _t(bnp["gamma"]) + _t(bnp["beta"])

    frames = _tf_window_sample(x, nf)
    frames = _tf_bn(frames, r, "input_bn")
    b = frames.shape[0]

    xt = tf.einsum("bfd,de->bfe", frames, _t(vp["expansion_weights"]))
    alpha = tf.sigmoid(
        tf.einsum("bfe,eg->bfg", xt, _t(vp["group_attention_weights"]))
    )
    logits = tf.einsum("bfe,ec->bfc", xt, _t(vp["cluster_weights"]))
    logits = _bn_tree(logits, vp["cluster_bn"])
    logits = tf.reshape(logits, [b, MAXF, g, k])
    assign = tf.nn.softmax(logits, axis=-1) * alpha[..., None]

    xg = tf.reshape(xt, [b, MAXF, g, dp])
    agg = tf.einsum("bfgk,bfgd->bkd", assign, xg)
    a_sum = tf.reduce_sum(assign, axis=[1, 2])
    vlad = agg - a_sum[:, :, None] * _t(vp["cluster_weights2"])[None]
    vlad = tf.nn.l2_normalize(vlad, axis=-1)
    vlad = tf.reshape(vlad, [b, k * dp])
    vlad = _bn_tree(vlad, vp["vlad_bn"])
    return _tf_lf_tail(vlad, r, NXV_FLAGS["moe_num_mixtures"])


def test_gap_parity_nextvlad(tmp_path_factory):
    from learnablepoolingmethods_tpu.data import readers

    root = str(tmp_path_factory.mktemp("gapdrill_nxv"))
    data = os.path.join(root, "val_nxv.tfrecord")
    make_learnable_synthetic_frame_level(
        data, num_videos=FL_N, num_classes=V, rgb_size=FL_RGB,
        audio_size=FL_AUD, max_frames=MAXF, seed=31,
    )
    x, labels, nf = _tf_parse_frame_level(data)
    reader = readers.YT8MFrameFeatureReader(
        num_classes=V, feature_sizes=(FL_RGB, FL_AUD),
        feature_names=("rgb", "audio"), max_frames=MAXF,
    )
    mcfg = ModelConfig(vocab_size=V, **NXV_FLAGS)
    ckpt = _train_and_export(
        "NeXtVLADModel", data, os.path.join(root, "nxv.ckpt"), mcfg, reader,
        frame_features=True, steps=35,
    )
    tf_info = _tf_stack_metrics(_tf_eval_nextvlad(ckpt, x, nf), labels)
    our_info = _our_stack_metrics(
        data, ckpt, "NeXtVLADModel", frame_features=True,
        feature_names="rgb,audio", feature_sizes=f"{FL_RGB},{FL_AUD}",
        extra_flags=NXV_FLAGS,
    )
    d = abs(tf_info["gap"] - our_info["gap"])
    print(
        f"\nGAP-parity drill [NeXtVLADModel]: TF={tf_info['gap']:.6f} "
        f"ours={our_info['gap']:.6f} (Δ={d:.2e})"
    )
    assert tf_info["gap"] > 0.2, f"drill model did not train ({tf_info['gap']})"
    assert d <= 1e-3, (tf_info["gap"], our_info["gap"])
