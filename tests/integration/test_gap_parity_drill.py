"""The mount-independent end-to-end GAP@20 parity drill (verdict item 1).

The framework's central promise — GAP@20 parity with the TF reference within
1e-3 (BASELINE.json#metric) — previously rested on a chain of per-stage
golden tests.  This drill composes them into ONE measured number, no
reference mount needed:

1. train our NetVLADModelLF / DbofModel briefly on a ~500-video synthetic
   frame-level TFRecord set (learnable labels, variable num_frames);
2. export the weights to a TF1-Saver checkpoint under REFERENCE variable
   names/layouts (core/checkpoint_import.py#export_reference_layout);
3. evaluate end-to-end in TWO independent stacks over the same TFRecords:
   - the TF stack: tf.io.parse_single_sequence_example → decode_raw →
     Dequantize → pad (ref: readers.py) → a TF2 transcription of the
     COMPLETE model graph reading the checkpoint by reference names
     (ref: frame_level_models.py#NetVLADModelLF / #DbofModel) → the
     reference-semantics EvaluationMetrics accumulator;
   - our stack: ``eval.py --reference_checkpoint`` (checkpoint import →
     our readers → flax model → GAP), default and ``--fast_eval``;
4. assert |ΔGAP@20| ≤ 1e-3 (the measured deltas are recorded in
   BASELINE.md).

Determinism: the models run with --nosample_random_frames and
--iterations == max_frames, which makes the frame-sampling stage the
deterministic window  idx_t = min(t, num_frames−1)  in both stacks — the
only way a cross-stack comparison can be exact (iid sampling draws from
different PRNGs).  Fast-path ≡ default-path equivalence under iid sampling
is pinned separately (tests/integration/test_eval_api.py), so parity
composes to the sampled configs as well.
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
)
from learnablepoolingmethods_tpu.metrics import eval_util
from learnablepoolingmethods_tpu.models import create_model

FLAGS = eval_cli.FLAGS

N_VIDEOS = 500
V, RGB, AUD, MAXF = 32, 1024, 128, 10
D = RGB + AUD
TOP_K = 20
TRAIN_STEPS = 25
BN_EPS = 1e-3

MODEL_FLAGS = dict(
    iterations=MAXF,
    sample_random_frames=False,
    netvlad_cluster_size=8,
    netvlad_hidden_size=16,
    dbof_cluster_size=16,
    dbof_hidden_size=16,
    moe_num_mixtures=2,
)


def _mcfg():
    return ModelConfig(vocab_size=V, **MODEL_FLAGS)


def _train_and_export(model_name, data_pattern, ckpt_path):
    """A few train steps on the drill set → TF1 checkpoint under reference
    variable names."""
    import jax

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.core import optimizers
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.data import pipeline, readers

    mcfg = _mcfg()
    tcfg = TrainingConfig(batch_size=64, base_learning_rate=0.02)
    model = create_model(model_name, mcfg)
    reader = readers.YT8MFrameFeatureReader(
        num_classes=V, feature_sizes=(RGB, AUD), feature_names=("rgb", "audio"),
        max_frames=MAXF,
    )
    batches = pipeline.batch_iterator(
        reader, data_pattern, tcfg.batch_size, num_epochs=None, shuffle=True,
        seed=0,
    )
    first = next(batches)
    params, bs = step_lib.init_model_variables(
        model, first, frame_features=True, seed=0
    )
    state = TrainState.create(params, bs, optimizers.create_optimizer(tcfg))
    step = jax.jit(
        step_lib.make_train_step(
            model, losses.CrossEntropyLoss(), tcfg, mcfg, frame_features=True
        ),
        donate_argnums=0,
    )
    rng = jax.random.key(0)
    batch = first
    for i in range(TRAIN_STEPS):
        db = {k: v for k, v in batch.items() if k != "video_id"}
        state, metrics = step(state, db, rng)
        batch = next(batches)
    assert np.isfinite(float(metrics["loss"]))

    params_host = jax.device_get(state.params)
    bs_host = jax.device_get(state.batch_stats)
    ref_vars = ci.export_reference_layout(params_host, bs_host, V)
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


# ---------------------------------------------------------------------------
# The TF stack: reference-semantics parse + full-graph transcriptions
# ---------------------------------------------------------------------------


def _tf_parse_dataset(data_pattern):
    """readers.py#YT8MFrameFeatureReader transcription: parse →
    decode_raw(uint8) → Dequantize(2, −2) → resize_axis pad to MAXF."""

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
        for name, width in (("rgb", RGB), ("audio", AUD)):
            raw = tf.cast(tf.io.decode_raw(seq[name], tf.uint8), tf.float32)
            deq = raw * (4.0 / 255.0) + (4.0 / 512.0 - 2.0)  # utils.Dequantize
            feats.append(tf.reshape(deq, [-1, width]))
        x = tf.concat(feats, axis=1)  # [F, 1152]
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


def _tf_preprocess_and_sample(x, nf):
    """train.py#build_graph l2-normalize + the deterministic window
    sampling (iterations == max_frames ⇒ idx_t = min(t, nf−1))."""
    x = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    idx = tf.minimum(
        tf.range(MAXF)[None, :], tf.constant(nf)[:, None] - 1
    )
    return tf.gather(x, idx, batch_dims=1)  # [N, MAXF, D]


def _bn(x, r, scope):
    return (x - tf.constant(r.get_tensor(f"{scope}/moving_mean"))) * tf.math.rsqrt(
        tf.constant(r.get_tensor(f"{scope}/moving_variance")) + BN_EPS
    ) * tf.constant(r.get_tensor(f"{scope}/gamma")) + tf.constant(
        r.get_tensor(f"{scope}/beta")
    )


def _tf_moe_reference(h, r):
    """video_level_models.py#MoeModel: mixture-major reshape(-1, M+1)."""
    m = MODEL_FLAGS["moe_num_mixtures"]
    gate_act = tf.matmul(h, tf.constant(r.get_tensor("gates/weights")))
    expert_act = tf.matmul(h, tf.constant(r.get_tensor("experts/weights"))) + tf.constant(
        r.get_tensor("experts/biases")
    )
    gating = tf.nn.softmax(tf.reshape(gate_act, [-1, m + 1]))
    expert = tf.nn.sigmoid(tf.reshape(expert_act, [-1, m]))
    probs = tf.reduce_sum(gating[:, :m] * expert, 1)
    return tf.reshape(probs, [-1, V])


def _tf_netvlad_block(x, r, scope, d, k):
    """video_pooling_modules.py#NetVLAD with assignment BN."""
    f = x.shape[1]
    acts = tf.matmul(
        tf.reshape(x, [-1, d]), tf.constant(r.get_tensor(f"{scope}/cluster_weights"))
    )
    acts = _bn(acts, r, f"{scope}/cluster_bn")
    acts = tf.nn.softmax(acts)
    acts = tf.reshape(acts, [-1, f, k])
    a_sum = tf.reduce_sum(acts, -2, keepdims=True)
    a = a_sum * tf.constant(r.get_tensor(f"{scope}/cluster_weights2"))
    vlad = tf.matmul(tf.transpose(acts, [0, 2, 1]), tf.reshape(x, [-1, f, d]))
    vlad = tf.transpose(vlad, [0, 2, 1]) - a
    vlad = tf.nn.l2_normalize(vlad, 1)
    vlad = tf.reshape(vlad, [-1, k * d])
    return tf.nn.l2_normalize(vlad, 1)


def _tf_eval_netvlad(ckpt, x, nf):
    """frame_level_models.py#NetVLADModelLF full graph, reference names."""
    r = tf.train.load_checkpoint(ckpt)
    k = MODEL_FLAGS["netvlad_cluster_size"]
    frames = _tf_preprocess_and_sample(x, nf)
    frames = _bn(frames, r, "input_bn")
    v_rgb = _tf_netvlad_block(frames[:, :, :RGB], r, "video_VLAD", RGB, k)
    v_aud = _tf_netvlad_block(frames[:, :, RGB:], r, "audio_VLAD", AUD, k // 2)
    pooled = tf.concat([v_rgb, v_aud], axis=1)
    h = tf.matmul(pooled, tf.constant(r.get_tensor("hidden1_weights"))) + tf.constant(
        r.get_tensor("hidden1_biases")
    )
    gates = tf.matmul(h, tf.constant(r.get_tensor("gating_weights")))
    gates = _bn(gates, r, "gating_bn")
    h = h * tf.nn.sigmoid(gates)
    return _tf_moe_reference(h, r).numpy()


def _tf_eval_dbof(ckpt, x, nf):
    """frame_level_models.py#DbofModel full graph, reference names."""
    r = tf.train.load_checkpoint(ckpt)
    c = MODEL_FLAGS["dbof_cluster_size"]
    frames = _tf_preprocess_and_sample(x, nf)
    frames = _bn(frames, r, "input_bn")
    acts = tf.matmul(
        tf.reshape(frames, [-1, D]), tf.constant(r.get_tensor("cluster_weights"))
    )
    acts = _bn(acts, r, "cluster_bn")
    acts = tf.nn.relu6(acts)
    pooled = tf.reduce_max(tf.reshape(acts, [-1, MAXF, c]), axis=1)
    h = tf.matmul(pooled, tf.constant(r.get_tensor("hidden1_weights")))
    h = _bn(h, r, "hidden1_bn")
    h = tf.nn.relu6(h)
    return _tf_moe_reference(h, r).numpy()


def _tf_stack_metrics(preds, labels):
    em = eval_util.EvaluationMetrics(V, TOP_K)
    em.accumulate(preds, labels, 0.0)
    return em.get()


def _our_stack_metrics(data_pattern, ckpt, model_name, fast_eval,
                       fast_forward=False, int8_hidden=False,
                       sample_random_frames=None):
    FLAGS(["gap_parity_drill"])
    FLAGS.eval_data_pattern = data_pattern
    FLAGS.reference_checkpoint = ckpt
    FLAGS.run_once = True
    FLAGS.fast_eval = fast_eval
    FLAGS.fast_forward = fast_forward
    FLAGS.int8_hidden = int8_hidden
    FLAGS.batch_size = 32
    FLAGS.top_k = TOP_K
    FLAGS.model = model_name
    FLAGS.frame_features = True
    FLAGS.feature_names = "rgb,audio"
    FLAGS.feature_sizes = f"{RGB},{AUD}"
    FLAGS.max_frames = MAXF
    FLAGS.num_classes = V
    FLAGS.model_parallelism = 1
    FLAGS.dcn_parallelism = 1
    FLAGS.use_grain = False
    FLAGS.packed_cache_dir = ""
    for name, val in MODEL_FLAGS.items():
        setattr(FLAGS, name, val)
    if sample_random_frames is not None:
        FLAGS.sample_random_frames = sample_random_frames
    return eval_cli.evaluation_loop()


@pytest.fixture(scope="module")
def drill(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gapdrill"))
    data = os.path.join(root, "val0.tfrecord")
    make_learnable_synthetic_frame_level(
        data, num_videos=N_VIDEOS, num_classes=V, rgb_size=RGB,
        audio_size=AUD, max_frames=MAXF, seed=5,
    )
    x, labels, nf = _tf_parse_dataset(data)
    assert x.shape == (N_VIDEOS, MAXF, D)
    ckpts = {
        name: _train_and_export(name, data, os.path.join(root, f"{name}.ckpt"))
        for name in ("NetVLADModelLF", "DbofModel")
    }
    return data, ckpts, x, labels, nf


@pytest.mark.parametrize("model_name", ["NetVLADModelLF", "DbofModel"])
def test_gap_parity_end_to_end(drill, model_name):
    data, ckpts, x, labels, nf = drill
    tf_preds = (
        _tf_eval_netvlad if model_name == "NetVLADModelLF" else _tf_eval_dbof
    )(ckpts[model_name], x, nf)
    tf_info = _tf_stack_metrics(tf_preds, labels)

    our_info = _our_stack_metrics(data, ckpts[model_name], model_name, False)
    fast_info = _our_stack_metrics(data, ckpts[model_name], model_name, True)

    d_gap = abs(tf_info["gap"] - our_info["gap"])
    d_gap_fast = abs(tf_info["gap"] - fast_info["gap"])
    print(
        f"\nGAP-parity drill [{model_name}]: TF={tf_info['gap']:.6f} "
        f"ours={our_info['gap']:.6f} (Δ={d_gap:.2e}) "
        f"fast={fast_info['gap']:.6f} (Δ={d_gap_fast:.2e})"
    )
    # non-vacuity: a trained model must beat chance decisively
    assert tf_info["gap"] > 0.2, f"drill model did not train (GAP {tf_info['gap']})"
    assert d_gap <= 1e-3, (tf_info["gap"], our_info["gap"])
    assert d_gap_fast <= 1e-3, (tf_info["gap"], fast_info["gap"])
    assert abs(tf_info["avg_hit_at_one"] - our_info["avg_hit_at_one"]) <= 1e-3
    assert abs(tf_info["avg_perr"] - our_info["avg_perr"]) <= 1e-3

    if model_name == "NetVLADModelLF":
        # --int8_hidden accuracy claim (README/BASELINE.md), CLI-level:
        # the fused forward only supports iid frame sampling (it rejects
        # the TF oracle's contiguous windows), so this arm doesn't compare
        # against TF — instead run the fused eval TWICE with the identical
        # eval rng — bf16 vs int8 hidden FC — and the GAP delta isolates
        # the quantization error exactly, on the drill's trained model and
        # 500-video set (a realistic score distribution).
        ff_bf16 = _our_stack_metrics(
            data, ckpts[model_name], model_name, False, fast_forward=True,
            sample_random_frames=True,
        )
        ff_i8 = _our_stack_metrics(
            data, ckpts[model_name], model_name, False,
            fast_forward=True, int8_hidden=True, sample_random_frames=True,
        )
        d_gap_i8 = abs(ff_bf16["gap"] - ff_i8["gap"])
        print(
            f"GAP-parity drill [int8_hidden vs bf16 fast]: "
            f"bf16={ff_bf16['gap']:.6f} int8={ff_i8['gap']:.6f} "
            f"(Δ={d_gap_i8:.2e})"
        )
        assert ff_bf16["gap"] > 0.2  # non-vacuous on the fused path too
        assert d_gap_i8 <= 1e-3, (ff_bf16["gap"], ff_i8["gap"])
