"""Shared, dimension-parameterized core of the GAP-parity drills.

The two-stack protocol (train → export to a TF1-Saver checkpoint under
reference variable names → evaluate the same TFRecords through a TF2
transcription of the complete reference graph AND through our
``eval.py --reference_checkpoint``) is identical between the toy-dim drill
(tests/integration/test_gap_parity_drill.py) and the full-Willow-dimension
drill (test_gap_parity_drill_fullshape.py); only the dimensions differ.
This module holds the protocol once, parameterized by :class:`DrillDims`.

TF transcription anchors (reference lineage, SURVEY.md citation
convention): readers.py#YT8MFrameFeatureReader, utils.py#Dequantize,
train.py#build_graph (l2-normalize), model_utils.py#SampleRandomFrames
(deterministic window when iterations == max_frames and sampling is off),
frame_level_models.py#NetVLADModelLF / #DbofModel,
video_level_models.py#MoeModel.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import tensorflow as tf

from learnablepoolingmethods_tpu import eval as eval_cli
from learnablepoolingmethods_tpu.config import ModelConfig, TrainingConfig
from learnablepoolingmethods_tpu.core import checkpoint_import as ci
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.metrics import eval_util
from learnablepoolingmethods_tpu.models import create_model

FLAGS = eval_cli.FLAGS

BN_EPS = 1e-3


@dataclasses.dataclass(frozen=True)
class DrillDims:
    """Every dimension/knob of one drill instantiation."""

    n_videos: int
    v: int  # vocab size
    rgb: int
    aud: int
    maxf: int
    model_flags: dict  # iterations, cluster sizes, hidden sizes, moe mixtures
    top_k: int = 20
    train_steps: int = 25
    train_batch: int = 64
    train_lr: float = 0.02
    eval_batch: int = 32

    @property
    def d(self) -> int:
        return self.rgb + self.aud


def mcfg_for(dims: DrillDims) -> ModelConfig:
    return ModelConfig(vocab_size=dims.v, **dims.model_flags)


# --- Full-Willow-dimension drill instantiation (round-4 verdict item 1) ---
#
# Shared between the TPU trainer (tools/drill_train_fullshape_tpu.py — a
# 285M-param model cannot be trained to a non-vacuous GAP in the CPU-step
# budget a pytest run affords; measured: 40 CPU steps ≈ 29 min stayed at
# chance) and the CPU eval drill (test_gap_parity_drill_fullshape.py).

# Per-model flags at full Willow/production dimensions.  NetVLADModelLF is
# BASELINE config 4 (the 285M-param [278528, 1024] hidden FC); DbofModel is
# config 3 at its reference defaults (dbof_cluster_size=8192); NetFVModelLF
# at K=256 carries the zoo's LONGEST hidden-FC accumulation
# (2·(1024·256) + 2·(128·128) = 557,056 rows) — the int8/bf16 deltas are
# accumulation-length-dependent, which is what this drill measures.
FULLSHAPE_MODEL_FLAGS = {
    "NetVLADModelLF": dict(
        iterations=300,
        sample_random_frames=False,
        netvlad_cluster_size=256,  # Willow config 4 (BASELINE.json)
        netvlad_hidden_size=1024,
        moe_num_mixtures=2,
    ),
    "DbofModel": dict(
        iterations=300,
        sample_random_frames=False,
        dbof_cluster_size=8192,  # config 3 reference default
        dbof_hidden_size=1024,
        moe_num_mixtures=2,
    ),
    "NetFVModelLF": dict(
        iterations=300,
        sample_random_frames=False,
        fv_cluster_size=256,  # → 557k-row hidden FC (longest in the zoo)
        fv_hidden_size=1024,
        moe_num_mixtures=2,
    ),
    # Same 278,528-row hidden FC as NetVLAD but through the residual-less
    # aggregation; NetRVLAD-256 is the zoo's biggest int8 serving win
    # (+74% @ B=256 sampled, BASELINE.md), so its int8 gate is pinned at
    # the production accumulation length too.
    "NetRVLADModelLF": dict(
        iterations=300,
        sample_random_frames=False,
        rvlad_cluster_size=256,
        netvlad_hidden_size=1024,  # shared LF hidden flag (models/frame_level.py#NetRVLADModelLF._hidden_size)
        moe_num_mixtures=2,
    ),
}

FULLSHAPE_DIMS = DrillDims(
    n_videos=200,
    v=3862,
    rgb=1024,
    aud=128,
    maxf=300,
    # = the TPU trainer's default --max_steps (drill_train_fullshape_tpu.py
    # derives its default from this field so the two cannot drift); the
    # trainer early-stops on train-GAP ≥ its --gap_target.
    train_steps=6000,
    train_batch=64,
    # 0.01 (the reference's CLI default) thrashes at this scale — measured
    # 6000 steps stuck at GAP 0.03 with loss oscillating at the all-negative
    # collapse (~70); Adam steps of ~lr against the 285M hidden FC's ~0.002
    # init scale.  0.001 memorizes the 200-video set in <1000 steps
    # (GAP 0.65 @ 1000; docs/drill_runs/fullshape_train_*.json).
    train_lr=0.001,
    eval_batch=32,
    model_flags=FULLSHAPE_MODEL_FLAGS["NetVLADModelLF"],
)


def fullshape_dims_for(model_name: str) -> DrillDims:
    return dataclasses.replace(
        FULLSHAPE_DIMS, model_flags=FULLSHAPE_MODEL_FLAGS[model_name]
    )

# label_threshold ≈ 2.96 σ (σ = sqrt(D) ≈ 33.9) → YT-8M-like sparse labels
# (~a few per video out of 3862); min_labels keeps every video scoreable.
FULLSHAPE_FIXTURE = dict(
    num_videos=FULLSHAPE_DIMS.n_videos,
    num_classes=FULLSHAPE_DIMS.v,
    rgb_size=FULLSHAPE_DIMS.rgb,
    audio_size=FULLSHAPE_DIMS.aud,
    max_frames=FULLSHAPE_DIMS.maxf,
    seed=7,
    label_threshold=100.0,
    min_labels=3,
)


def make_fullshape_fixture(data_path: str):
    from learnablepoolingmethods_tpu.data.fixtures import (
        make_learnable_synthetic_frame_level,
    )

    return make_learnable_synthetic_frame_level(data_path, **FULLSHAPE_FIXTURE)


# --- drill-dir fingerprints + dated run records ----------------------------
#
# The drill dir outlives the source tree that built it (it is rebuilt only
# when missing), so the trainer fingerprints the fixture spec and each
# checkpoint's model flags into the dir; the pytest fixture refuses a stale
# pair instead of silently evaluating the wrong spec.  Passing drill runs are
# date-stamped into docs/drill_runs/ (commit + numbers) so "when did this
# gated drill last pass, at which commit" is answerable from the tree.

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))


def fullshape_fingerprint(model_name: str) -> dict:
    """The PARITY-semantic spec of one drill arm (what the eval arms assume
    about the checkpoint); training knobs (lr/steps) are recorded in the
    docs/drill_runs/ record instead — they affect how trained the
    checkpoint is, not what graph it parameterizes."""
    dims = fullshape_dims_for(model_name)
    return {
        "fixture": dict(FULLSHAPE_FIXTURE),
        "model": model_name,
        "model_flags": dict(dims.model_flags),
    }


def fingerprint_path(drill_dir: str, name: str) -> str:
    return os.path.join(drill_dir, f"{name}.fingerprint.json")


def write_fingerprint(drill_dir: str, name: str, payload: dict):
    import json

    with open(fingerprint_path(drill_dir, name), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)


def check_fingerprint(drill_dir: str, name: str, expected: dict):
    """Returns None if the recorded fingerprint matches, else a reason."""
    import json

    path = fingerprint_path(drill_dir, name)
    if not os.path.exists(path):
        return f"missing fingerprint {path}"
    with open(path) as f:
        actual = json.load(f)
    if actual != json.loads(json.dumps(expected)):
        return f"fingerprint mismatch at {path}: {actual} != {expected}"
    return None


def _jsonable(obj):
    """numpy scalars (np.float32 deltas etc.) are not JSON serializable —
    coerce them via .item(); everything else falls through to json's error."""
    if hasattr(obj, "item"):
        return obj.item()
    raise TypeError(f"not JSON serializable: {type(obj).__name__}")


def record_drill_run(name: str, payload: dict):
    """Write docs/drill_runs/<name>.json with commit + UTC date + payload."""
    import datetime
    import json
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO_ROOT,
            capture_output=True, text=True, timeout=30,
        ).stdout.strip()
    except Exception:
        commit = "unknown"
    out_dir = os.path.join(REPO_ROOT, "docs", "drill_runs")
    os.makedirs(out_dir, exist_ok=True)
    record = {
        "date_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "commit": commit,
        **payload,
    }
    path = os.path.join(out_dir, f"{name}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True, default=_jsonable)
    os.replace(tmp, path)  # never leave a truncated record behind
    return path


def train_and_export(dims: DrillDims, model_name, data_pattern, ckpt_path):
    """A few train steps on the drill set → TF1 checkpoint under reference
    variable names."""
    import jax

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.core import optimizers
    from learnablepoolingmethods_tpu.core.train_state import TrainState
    from learnablepoolingmethods_tpu.data import pipeline, readers

    mcfg = mcfg_for(dims)
    tcfg = TrainingConfig(
        batch_size=dims.train_batch, base_learning_rate=dims.train_lr
    )
    model = create_model(model_name, mcfg)
    reader = readers.YT8MFrameFeatureReader(
        num_classes=dims.v,
        feature_sizes=(dims.rgb, dims.aud),
        feature_names=("rgb", "audio"),
        max_frames=dims.maxf,
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
    for _ in range(dims.train_steps):
        db = {k: v for k, v in batch.items() if k != "video_id"}
        state, metrics = step(state, db, rng)
        batch = next(batches)
    assert np.isfinite(float(metrics["loss"]))

    params_host = jax.device_get(state.params)
    bs_host = jax.device_get(state.batch_stats)
    ref_vars = ci.export_reference_layout(params_host, bs_host, dims.v)
    return save_reference_ckpt(ref_vars, ckpt_path)


# ---------------------------------------------------------------------------
# The TF stack: reference-semantics parse + full-graph transcriptions
# ---------------------------------------------------------------------------


def tf_parse_dataset(dims: DrillDims, data_pattern):
    """readers.py#YT8MFrameFeatureReader transcription: parse →
    decode_raw(uint8) → Dequantize(2, −2) → resize_axis pad to maxf."""

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
        for name, width in (("rgb", dims.rgb), ("audio", dims.aud)):
            raw = tf.cast(tf.io.decode_raw(seq[name], tf.uint8), tf.float32)
            deq = raw * (4.0 / 255.0) + (4.0 / 512.0 - 2.0)  # utils.Dequantize
            feats.append(tf.reshape(deq, [-1, width]))
        x = tf.concat(feats, axis=1)  # [F, D]
        nf = tf.minimum(tf.shape(x)[0], dims.maxf)
        x = tf.pad(x[: dims.maxf], [[0, dims.maxf - nf], [0, 0]])  # resize_axis
        labels = tf.sparse.to_dense(ctx["labels"])
        multihot = tf.scatter_nd(
            labels[:, None], tf.ones_like(labels, tf.float32), [dims.v]
        )
        return x, multihot, nf

    ds = tf.data.TFRecordDataset(data_pattern).map(parse)
    xs, ys, nfs = [], [], []
    for x, y, nf in ds:
        xs.append(x.numpy())
        ys.append(y.numpy())
        nfs.append(int(nf.numpy()))
    return np.stack(xs), np.stack(ys), np.asarray(nfs, np.int32)


def tf_preprocess_and_sample(dims: DrillDims, x, nf):
    """train.py#build_graph l2-normalize + the deterministic window
    sampling (iterations == max_frames ⇒ idx_t = min(t, nf−1))."""
    x = tf.nn.l2_normalize(tf.constant(x), axis=-1)
    idx = tf.minimum(
        tf.range(dims.maxf)[None, :], tf.constant(nf)[:, None] - 1
    )
    return tf.gather(x, idx, batch_dims=1)  # [N, maxf, D]


def tf_bn(x, r, scope):
    return (x - tf.constant(r.get_tensor(f"{scope}/moving_mean"))) * tf.math.rsqrt(
        tf.constant(r.get_tensor(f"{scope}/moving_variance")) + BN_EPS
    ) * tf.constant(r.get_tensor(f"{scope}/gamma")) + tf.constant(
        r.get_tensor(f"{scope}/beta")
    )


def tf_moe_reference(dims: DrillDims, h, r):
    """video_level_models.py#MoeModel: mixture-major reshape(-1, M+1)."""
    m = dims.model_flags["moe_num_mixtures"]
    gate_act = tf.matmul(h, tf.constant(r.get_tensor("gates/weights")))
    expert_act = tf.matmul(
        h, tf.constant(r.get_tensor("experts/weights"))
    ) + tf.constant(r.get_tensor("experts/biases"))
    gating = tf.nn.softmax(tf.reshape(gate_act, [-1, m + 1]))
    expert = tf.nn.sigmoid(tf.reshape(expert_act, [-1, m]))
    probs = tf.reduce_sum(gating[:, :m] * expert, 1)
    return tf.reshape(probs, [-1, dims.v])


def tf_netvlad_block(x, r, scope, d, k):
    """video_pooling_modules.py#NetVLAD with assignment BN."""
    f = x.shape[1]
    acts = tf.matmul(
        tf.reshape(x, [-1, d]), tf.constant(r.get_tensor(f"{scope}/cluster_weights"))
    )
    acts = tf_bn(acts, r, f"{scope}/cluster_bn")
    acts = tf.nn.softmax(acts)
    acts = tf.reshape(acts, [-1, f, k])
    a_sum = tf.reduce_sum(acts, -2, keepdims=True)
    a = a_sum * tf.constant(r.get_tensor(f"{scope}/cluster_weights2"))
    vlad = tf.matmul(tf.transpose(acts, [0, 2, 1]), tf.reshape(x, [-1, f, d]))
    vlad = tf.transpose(vlad, [0, 2, 1]) - a
    vlad = tf.nn.l2_normalize(vlad, 1)
    vlad = tf.reshape(vlad, [-1, k * d])
    return tf.nn.l2_normalize(vlad, 1)


def tf_eval_netvlad(dims: DrillDims, ckpt, x, nf, batch: int = 0):
    """frame_level_models.py#NetVLADModelLF full graph, reference names.

    ``batch`` > 0 evaluates in chunks (needed at Willow dimensions, where
    the intermediate [N, maxf, K] / [N, D·K] tensors would otherwise peak
    several GB); chunking is mathematically a no-op for a per-video
    forward.
    """
    r = tf.train.load_checkpoint(ckpt)
    k = dims.model_flags["netvlad_cluster_size"]
    frames_all = tf_preprocess_and_sample(dims, x, nf)
    n = frames_all.shape[0]
    batch = batch or n
    outs = []
    for s in range(0, n, batch):
        frames = tf_bn(frames_all[s : s + batch], r, "input_bn")
        v_rgb = tf_netvlad_block(
            frames[:, :, : dims.rgb], r, "video_VLAD", dims.rgb, k
        )
        v_aud = tf_netvlad_block(
            frames[:, :, dims.rgb :], r, "audio_VLAD", dims.aud, k // 2
        )
        pooled = tf.concat([v_rgb, v_aud], axis=1)
        h = tf.matmul(
            pooled, tf.constant(r.get_tensor("hidden1_weights"))
        ) + tf.constant(r.get_tensor("hidden1_biases"))
        gates = tf.matmul(h, tf.constant(r.get_tensor("gating_weights")))
        gates = tf_bn(gates, r, "gating_bn")
        h = h * tf.nn.sigmoid(gates)
        outs.append(tf_moe_reference(dims, h, r).numpy())
    return np.concatenate(outs, axis=0)


def tf_rvlad_block(x, r, scope, d, k):
    """video_pooling_modules.py#NetRVLAD: NetVLAD's BN'd softmax assignment
    and Aᵀ·X aggregation WITHOUT the cluster_weights2 center subtraction
    ("residual-less"); intra- then global ℓ2 normalization.  Dimension-
    parameterized twin of test_gap_parity_drill_more.py's toy transcription
    (single-modality by construction)."""
    f = x.shape[1]
    acts = tf.matmul(
        tf.reshape(x, [-1, d]), tf.constant(r.get_tensor(f"{scope}/cluster_weights"))
    )
    acts = tf_bn(acts, r, f"{scope}/cluster_bn")
    acts = tf.nn.softmax(acts)
    acts = tf.reshape(acts, [-1, f, k])
    vlad = tf.matmul(tf.transpose(acts, [0, 2, 1]), tf.reshape(x, [-1, f, d]))
    vlad = tf.transpose(vlad, [0, 2, 1])
    vlad = tf.nn.l2_normalize(vlad, 1)
    vlad = tf.reshape(vlad, [-1, k * d])
    return tf.nn.l2_normalize(vlad, 1)


def tf_eval_netrvlad(dims: DrillDims, ckpt, x, nf, batch: int = 0):
    """frame_level_models.py#NetRVLADModelLF full graph, reference names —
    per-modality NetRVLAD (audio clusters = rgb/2), shared gated-MoE tail."""
    r = tf.train.load_checkpoint(ckpt)
    k = dims.model_flags["rvlad_cluster_size"]
    frames_all = tf_preprocess_and_sample(dims, x, nf)
    n = frames_all.shape[0]
    batch = batch or n
    outs = []
    for s in range(0, n, batch):
        frames = tf_bn(frames_all[s : s + batch], r, "input_bn")
        v_rgb = tf_rvlad_block(
            frames[:, :, : dims.rgb], r, "video_RVLAD", dims.rgb, k
        )
        v_aud = tf_rvlad_block(
            frames[:, :, dims.rgb :], r, "audio_RVLAD", dims.aud, k // 2
        )
        pooled = tf.concat([v_rgb, v_aud], axis=1)
        h = tf.matmul(
            pooled, tf.constant(r.get_tensor("hidden1_weights"))
        ) + tf.constant(r.get_tensor("hidden1_biases"))
        gates = tf.matmul(h, tf.constant(r.get_tensor("gating_weights")))
        gates = tf_bn(gates, r, "gating_bn")
        h = h * tf.nn.sigmoid(gates)
        outs.append(tf_moe_reference(dims, h, r).numpy())
    return np.concatenate(outs, axis=0)


def tf_eval_dbof(dims: DrillDims, ckpt, x, nf, batch: int = 0):
    """frame_level_models.py#DbofModel full graph, reference names."""
    r = tf.train.load_checkpoint(ckpt)
    c = dims.model_flags["dbof_cluster_size"]
    frames_all = tf_preprocess_and_sample(dims, x, nf)
    n = frames_all.shape[0]
    batch = batch or n
    outs = []
    for s in range(0, n, batch):
        frames = tf_bn(frames_all[s : s + batch], r, "input_bn")
        acts = tf.matmul(
            tf.reshape(frames, [-1, dims.d]),
            tf.constant(r.get_tensor("cluster_weights")),
        )
        acts = tf_bn(acts, r, "cluster_bn")
        acts = tf.nn.relu6(acts)
        pooled = tf.reduce_max(
            tf.reshape(acts, [-1, dims.maxf, c]), axis=1
        )
        h = tf.matmul(pooled, tf.constant(r.get_tensor("hidden1_weights")))
        h = tf_bn(h, r, "hidden1_bn")
        h = tf.nn.relu6(h)
        outs.append(tf_moe_reference(dims, h, r).numpy())
    return np.concatenate(outs, axis=0)


def tf_fv_block(x, r, scope, d, k):
    """video_pooling_modules.py#NetFV: softmax(BN(X·C)) assignment, then
    1st-order (mean-residual / covar) and 2nd-order (variance) Fisher
    statistics, each intra+global ℓ2-normalized, concatenated [fv1 ‖ fv2].
    Dimension-parameterized twin of test_gap_parity_drill_more.py's toy
    transcription (which is single-modality by construction)."""
    f = x.shape[1]
    cw2 = tf.constant(r.get_tensor(f"{scope}/cluster_weights2"))
    covar = tf.square(tf.constant(r.get_tensor(f"{scope}/covar_weights"))) + 1e-6
    acts = tf.matmul(
        tf.reshape(x, [-1, d]), tf.constant(r.get_tensor(f"{scope}/cluster_weights"))
    )
    acts = tf_bn(acts, r, f"{scope}/cluster_bn")
    activation = tf.reshape(tf.nn.softmax(acts), [-1, f, k])
    a_sum = tf.reduce_sum(activation, -2, keepdims=True)
    a = tf.multiply(a_sum, cw2)
    activation_t = tf.transpose(activation, perm=[0, 2, 1])
    xb = tf.reshape(x, [-1, f, d])
    fv1 = tf.transpose(tf.matmul(activation_t, xb), perm=[0, 2, 1])
    a2 = tf.multiply(a_sum, tf.square(cw2))
    b2 = tf.multiply(fv1, cw2)
    fv2 = tf.transpose(tf.matmul(activation_t, tf.square(xb)), perm=[0, 2, 1])
    fv2 = a2 + fv2 - 2 * b2
    fv2 = tf.divide(fv2, tf.square(covar))
    fv2 = tf.subtract(fv2, a_sum)
    fv2 = tf.nn.l2_normalize(fv2, 1)
    fv2 = tf.reshape(fv2, [-1, k * d])
    fv2 = tf.nn.l2_normalize(fv2, 1)
    fv1 = tf.subtract(fv1, a)
    fv1 = tf.divide(fv1, covar)
    fv1 = tf.nn.l2_normalize(fv1, 1)
    fv1 = tf.reshape(fv1, [-1, k * d])
    fv1 = tf.nn.l2_normalize(fv1, 1)
    return tf.concat([fv1, fv2], 1)


def tf_eval_netfv(dims: DrillDims, ckpt, x, nf, batch: int = 0):
    """frame_level_models.py#NetFVModelLF full graph, reference names —
    per-modality NetFV (audio clusters = rgb/2), shared gated-MoE tail."""
    r = tf.train.load_checkpoint(ckpt)
    k = dims.model_flags["fv_cluster_size"]
    frames_all = tf_preprocess_and_sample(dims, x, nf)
    n = frames_all.shape[0]
    batch = batch or n
    outs = []
    for s in range(0, n, batch):
        frames = tf_bn(frames_all[s : s + batch], r, "input_bn")
        fv_rgb = tf_fv_block(frames[:, :, : dims.rgb], r, "video_FV", dims.rgb, k)
        fv_aud = tf_fv_block(
            frames[:, :, dims.rgb :], r, "audio_FV", dims.aud, k // 2
        )
        pooled = tf.concat([fv_rgb, fv_aud], axis=1)
        h = tf.matmul(
            pooled, tf.constant(r.get_tensor("hidden1_weights"))
        ) + tf.constant(r.get_tensor("hidden1_biases"))
        gates = tf.matmul(h, tf.constant(r.get_tensor("gating_weights")))
        gates = tf_bn(gates, r, "gating_bn")
        h = h * tf.nn.sigmoid(gates)
        outs.append(tf_moe_reference(dims, h, r).numpy())
    return np.concatenate(outs, axis=0)


def tf_stack_metrics(dims: DrillDims, preds, labels):
    em = eval_util.EvaluationMetrics(dims.v, dims.top_k)
    em.accumulate(preds, labels, 0.0)
    return em.get()


# ---------------------------------------------------------------------------
# Training-parity drill (round-4 verdict item 2): the TF stack's TRAIN step
# ---------------------------------------------------------------------------


def capture_train_batches(dims: DrillDims, data_pattern, steps: int):
    """Materialize the first ``steps`` training batches (our pipeline,
    shuffle seed 0) so both stacks consume the identical byte-for-byte batch
    order — the shuffle itself is not part of the parity claim."""
    from learnablepoolingmethods_tpu.data import pipeline, readers

    reader = readers.YT8MFrameFeatureReader(
        num_classes=dims.v,
        feature_sizes=(dims.rgb, dims.aud),
        feature_names=("rgb", "audio"),
        max_frames=dims.maxf,
    )
    it = pipeline.batch_iterator(
        reader, data_pattern, dims.train_batch, num_epochs=None, shuffle=True,
        seed=0,
    )
    out = []
    for _ in range(steps):
        b = next(it)
        assert np.all(np.asarray(b["weights"]) == 1.0), (
            "training-parity drill requires full batches"
        )
        out.append(
            {k: np.asarray(v) for k, v in b.items() if k != "video_id"}
        )
    return out


def our_train_run(dims: DrillDims, model_name, batches):
    """Run ``make_train_step`` over the captured batches.

    Returns (per-step label losses, init reference-layout vars, final
    reference-layout vars) — init/final in the TF1 reference naming so the
    TF stack can start from the identical initialization and both final
    models can be evaluated through the identical eval transcription.
    """
    import jax

    from learnablepoolingmethods_tpu import losses
    from learnablepoolingmethods_tpu.core import optimizers
    from learnablepoolingmethods_tpu.core.train_state import TrainState

    mcfg = mcfg_for(dims)
    tcfg = TrainingConfig(
        batch_size=dims.train_batch, base_learning_rate=dims.train_lr
    )
    model = create_model(model_name, mcfg)
    params, bs = step_lib.init_model_variables(
        model, batches[0], frame_features=True, seed=0
    )
    init_vars = ci.export_reference_layout(
        jax.device_get(params), jax.device_get(bs), dims.v
    )
    state = TrainState.create(params, bs, optimizers.create_optimizer(tcfg))
    step = jax.jit(
        step_lib.make_train_step(
            model, losses.CrossEntropyLoss(), tcfg, mcfg, frame_features=True
        ),
        donate_argnums=0,
    )
    rng = jax.random.key(0)
    loss_hist = []
    for b in batches:
        state, metrics = step(state, b, rng)
        loss_hist.append(float(metrics["label_loss"]))
    final_vars = ci.export_reference_layout(
        jax.device_get(state.params), jax.device_get(state.batch_stats), dims.v
    )
    return loss_hist, init_vars, final_vars


class TfReferenceTrainer:
    """TF2 transcription of the reference NetVLADModelLF TRAIN step.

    (ref: train.py#build_graph — AdamOptimizer + tf.train.exponential_decay
    in examples seen + utils.py#clip_gradient_norms per-tensor clip +
    regularization_penalty · slim-l2 on the MoE head kernels + slim
    batch_norm updates, decay 0.999 / eps 1e-3.)

    tf.Variables are created from a reference-layout {name: array} dict
    (core/checkpoint_import.py#export_reference_layout of OUR flax init), so
    both stacks start bit-identical; Adam is implemented with the TF1 update
    formula (lr_t = lr·√(1−β₂ᵗ)/(1−β₁ᵗ); p −= lr_t·m/(√v+ε)) — note this
    differs from optax.adam's ε-inside-correction placement, which is part
    of what this drill measures.
    """

    def __init__(self, dims: DrillDims, init_vars, *, base_lr, batch_size,
                 decay_rate=0.95, decay_examples=4_000_000, clip_norm=1.0,
                 reg_penalty=1.0, moe_l2=1e-8, b1=0.9, b2=0.999,
                 adam_eps=1e-8, bn_decay=0.999):
        self.dims = dims
        self.base_lr = base_lr
        self.batch_size = batch_size
        self.decay_rate = decay_rate
        self.decay_examples = decay_examples
        self.clip_norm = clip_norm
        self.reg_penalty = reg_penalty
        self.moe_l2 = moe_l2
        self.b1, self.b2, self.adam_eps = b1, b2, adam_eps
        self.bn_decay = bn_decay
        self.k = dims.model_flags["netvlad_cluster_size"]
        self.vars = {
            name: tf.Variable(np.asarray(val, np.float32),
                              name=name.replace("/", "__"))
            for name, val in init_vars.items()
        }
        self.trainable = {
            n: v for n, v in self.vars.items()
            if not n.endswith(("moving_mean", "moving_variance"))
        }
        self.adam_m = {n: tf.Variable(tf.zeros_like(v))
                       for n, v in self.trainable.items()}
        self.adam_v = {n: tf.Variable(tf.zeros_like(v))
                       for n, v in self.trainable.items()}
        self.t = 0  # completed optimizer steps

    # -- train-mode building blocks -----------------------------------------

    def _bn_train(self, x, scope):
        axes = list(range(len(x.shape) - 1))
        mean, var = tf.nn.moments(x, axes=axes)
        self._bn_updates.append((f"{scope}/moving_mean", mean))
        self._bn_updates.append((f"{scope}/moving_variance", var))
        return (x - mean) * tf.math.rsqrt(var + BN_EPS) * self.vars[
            f"{scope}/gamma"
        ] + self.vars[f"{scope}/beta"]

    def _netvlad_block(self, x, scope, d, k):
        """Train-mode twin of tf_netvlad_block (batch-stat BN)."""
        f = x.shape[1]
        acts = tf.matmul(
            tf.reshape(x, [-1, d]), self.vars[f"{scope}/cluster_weights"]
        )
        acts = self._bn_train(acts, f"{scope}/cluster_bn")
        acts = tf.nn.softmax(acts)
        acts = tf.reshape(acts, [-1, f, k])
        a_sum = tf.reduce_sum(acts, -2, keepdims=True)
        a = a_sum * self.vars[f"{scope}/cluster_weights2"]
        vlad = tf.matmul(tf.transpose(acts, [0, 2, 1]), tf.reshape(x, [-1, f, d]))
        vlad = tf.transpose(vlad, [0, 2, 1]) - a
        vlad = tf.nn.l2_normalize(vlad, 1)
        vlad = tf.reshape(vlad, [-1, k * d])
        return tf.nn.l2_normalize(vlad, 1)

    def _forward_train(self, feats_u8, nf):
        dims = self.dims
        x = tf.cast(feats_u8, tf.float32) * (4.0 / 255.0) + (4.0 / 512.0 - 2.0)
        x = tf.nn.l2_normalize(x, axis=-1)
        nf = tf.minimum(tf.cast(nf, tf.int32), dims.maxf)
        idx = tf.minimum(tf.range(dims.maxf)[None, :], nf[:, None] - 1)
        frames = tf.gather(x, idx, batch_dims=1)  # deterministic window
        frames = self._bn_train(frames, "input_bn")
        v_rgb = self._netvlad_block(
            frames[:, :, : dims.rgb], "video_VLAD", dims.rgb, self.k
        )
        v_aud = self._netvlad_block(
            frames[:, :, dims.rgb:], "audio_VLAD", dims.aud, self.k // 2
        )
        pooled = tf.concat([v_rgb, v_aud], axis=1)
        h = tf.matmul(pooled, self.vars["hidden1_weights"]) + self.vars[
            "hidden1_biases"
        ]
        gates = tf.matmul(h, self.vars["gating_weights"])
        gates = self._bn_train(gates, "gating_bn")
        h = h * tf.nn.sigmoid(gates)
        m = self.dims.model_flags["moe_num_mixtures"]
        gate_act = tf.matmul(h, self.vars["gates/weights"])
        expert_act = tf.matmul(h, self.vars["experts/weights"]) + self.vars[
            "experts/biases"
        ]
        gating = tf.nn.softmax(tf.reshape(gate_act, [-1, m + 1]))
        expert = tf.nn.sigmoid(tf.reshape(expert_act, [-1, m]))
        probs = tf.reduce_sum(gating[:, :m] * expert, 1)
        return tf.reshape(probs, [-1, self.dims.v])

    # -- one reference train step -------------------------------------------

    def step(self, batch) -> float:
        labels = tf.constant(np.asarray(batch["labels"], np.float32))
        with tf.GradientTape() as tape:
            self._bn_updates = []
            preds = self._forward_train(
                tf.constant(batch["features"]), tf.constant(batch["num_frames"])
            )
            eps = 10e-6  # losses.py#CrossEntropyLoss
            ce = labels * tf.math.log(preds + eps) + (1.0 - labels) * tf.math.log(
                1.0 - preds + eps
            )
            label_loss = tf.reduce_mean(tf.reduce_sum(-ce, 1))
            reg = 0.5 * self.moe_l2 * (
                tf.reduce_sum(tf.square(self.vars["gates/weights"]))
                + tf.reduce_sum(tf.square(self.vars["experts/weights"]))
            )
            total = label_loss + self.reg_penalty * reg
        names = list(self.trainable)
        grads = tape.gradient(total, [self.trainable[n] for n in names])
        # slim BN moving-stat updates (decay 0.999, batch statistics)
        for name, stat in self._bn_updates:
            v = self.vars[name]
            v.assign(self.bn_decay * v + (1.0 - self.bn_decay) * stat)
        # lr: exponential_decay(base, global_step·batch, decay_examples, rate)
        lr = self.base_lr * self.decay_rate ** (
            self.t * self.batch_size / self.decay_examples
        )
        self.t += 1
        lr_t = lr * np.sqrt(1.0 - self.b2 ** self.t) / (1.0 - self.b1 ** self.t)
        for n, g in zip(names, grads):
            if g is None:
                continue
            norm = tf.norm(g)
            g = g * tf.minimum(1.0, self.clip_norm / tf.maximum(norm, 1e-20))
            m, v = self.adam_m[n], self.adam_v[n]
            m.assign(self.b1 * m + (1.0 - self.b1) * g)
            v.assign(self.b2 * v + (1.0 - self.b2) * tf.square(g))
            self.trainable[n].assign_sub(
                lr_t * m / (tf.sqrt(v) + self.adam_eps)
            )
        return float(label_loss)

    def export(self):
        return {n: v.numpy() for n, v in self.vars.items()}


def save_reference_ckpt(ref_vars, ckpt_path):
    """Write a {name: array} dict as a TF1-Saver checkpoint.

    Values are fed through placeholders rather than embedded as graph
    constants — ``tf1.Variable(initial_value=<ndarray>)`` serializes the
    array into the GraphDef, which caps at 2 GB per tensor proto and the
    fullshape NetFVModelLF hidden FC is [557056, 1024] f32 = 2.28 GB.
    Session feeds use the C-API tensor path, which has no such limit."""
    tf1 = tf.compat.v1
    g = tf.Graph()
    feeds = {}
    with g.as_default():
        for name, val in ref_vars.items():
            val = np.asarray(val)
            ph = tf1.placeholder(val.dtype, val.shape)
            tf1.Variable(initial_value=ph, name=name)
            feeds[ph] = val
        saver = tf1.train.Saver()
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer(), feed_dict=feeds)
            saver.save(sess, ckpt_path, write_meta_graph=False)
    return ckpt_path


def our_stack_metrics(dims: DrillDims, data_pattern, ckpt, model_name,
                      fast_eval, fast_forward=False, int8_hidden=False,
                      sample_random_frames=None):
    FLAGS(["gap_parity_drill"])
    FLAGS.eval_data_pattern = data_pattern
    FLAGS.reference_checkpoint = ckpt
    FLAGS.run_once = True
    FLAGS.fast_eval = fast_eval
    FLAGS.fast_forward = fast_forward
    FLAGS.int8_hidden = int8_hidden
    FLAGS.batch_size = dims.eval_batch
    FLAGS.top_k = dims.top_k
    FLAGS.model = model_name
    FLAGS.frame_features = True
    FLAGS.feature_names = "rgb,audio"
    FLAGS.feature_sizes = f"{dims.rgb},{dims.aud}"
    FLAGS.max_frames = dims.maxf
    FLAGS.num_classes = dims.v
    FLAGS.model_parallelism = 1
    FLAGS.dcn_parallelism = 1
    FLAGS.use_grain = False
    FLAGS.packed_cache_dir = ""
    for name, val in dims.model_flags.items():
        setattr(FLAGS, name, val)
    if sample_random_frames is not None:
        FLAGS.sample_random_frames = sample_random_frames
    return eval_cli.evaluation_loop()
