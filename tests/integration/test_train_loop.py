"""End-to-end integration: convergence, checkpoint resume, export roundtrip
(SURVEY.md §4 item 5)."""

import jax
import numpy as np
import pytest

from learnablepoolingmethods_tpu import losses
from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig, TrainingConfig
from learnablepoolingmethods_tpu.core import checkpoints as ckpt_lib
from learnablepoolingmethods_tpu.core import optimizers, step as step_lib
from learnablepoolingmethods_tpu.core.train_state import TrainState
from learnablepoolingmethods_tpu.data import fixtures, pipeline
from learnablepoolingmethods_tpu.data.readers import YT8MAggregatedFeatureReader
from learnablepoolingmethods_tpu.metrics import eval_util
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.parallel import mesh as mesh_lib

MCFG = ModelConfig(vocab_size=32)
TCFG = TrainingConfig(batch_size=64, base_learning_rate=0.05, num_epochs=20)


@pytest.fixture(scope="module")
def synthetic_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "syn.tfrecord")
    fixtures.make_learnable_synthetic_video_level(
        path, num_videos=256, num_classes=32, rgb_size=16, audio_size=4
    )
    return path


def _train(path, num_epochs=20, state=None, seed=0, mcfg=MCFG, tcfg=TCFG):
    reader = YT8MAggregatedFeatureReader(num_classes=32, feature_sizes=(16, 4))
    model = create_model("LogisticModel", mcfg)
    loss_obj = losses.CrossEntropyLoss()
    tx = optimizers.create_optimizer(tcfg)
    batches = pipeline.batch_iterator(
        reader, path, 64, num_epochs=num_epochs, shuffle=True, seed=seed
    )
    first = next(batches)
    if state is None:
        params, bs = step_lib.init_model_variables(model, first, frame_features=False)
        state = TrainState.create(params, bs, tx)
    mesh = mesh_lib.create_mesh()
    state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))
    rng = jax.device_put(jax.random.key(0), mesh_lib.replicated_sharding(mesh))
    train_step = jax.jit(
        step_lib.make_train_step(model, loss_obj, tcfg, mcfg, False), donate_argnums=0
    )
    logs = []
    batch = first
    while True:
        db = {
            k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
            for k, v in batch.items()
            if k != "video_id"
        }
        state, m = train_step(state, db, rng)
        logs.append((float(m["loss"]), np.asarray(m["predictions"]), batch["labels"]))
        try:
            batch = next(batches)
        except StopIteration:
            break
    return state, model, tx, logs


def test_training_converges_and_gap_improves(synthetic_path):
    state, _, _, logs = _train(synthetic_path)
    first_loss, first_preds, first_labels = logs[0]
    last_loss, last_preds, last_labels = logs[-1]
    assert last_loss < first_loss * 0.7
    gap_first = eval_util.calculate_gap(first_preds, first_labels)
    gap_last = eval_util.calculate_gap(last_preds, last_labels)
    assert gap_last > gap_first
    assert gap_last > 0.9


def test_fused_adam_sr_training_converges(synthetic_path):
    """End-to-end learning under the stochastically-rounded bf16 optimizer
    (ops/fused_adam.py): SR noise must not break memorization — the
    convergence bar matches the fp32 optax run up to a small slack."""
    import dataclasses

    mcfg = dataclasses.replace(MCFG, param_dtype="bfloat16")
    tcfg = dataclasses.replace(TCFG, fused_adam=True)
    state, _, _, logs = _train(synthetic_path, mcfg=mcfg, tcfg=tcfg)
    first_loss, first_preds, first_labels = logs[0]
    last_loss, last_preds, last_labels = logs[-1]
    assert last_loss < first_loss * 0.7
    gap_last = eval_util.calculate_gap(last_preds, last_labels)
    assert gap_last > 0.88, gap_last
    # the SR path really ran on bf16 state
    assert state.opt_state.nu[
        "fc"
    ]["kernel"].dtype == jax.numpy.bfloat16


def test_checkpoint_save_restore_roundtrip(synthetic_path, tmp_path):
    state, model, tx, _ = _train(synthetic_path, num_epochs=2)
    mngr = ckpt_lib.CheckpointManager(str(tmp_path / "td"))
    mngr.save(int(state.step), ckpt_lib.state_to_tree(state))
    assert mngr.latest_step() == int(state.step)

    restored_tree = mngr.restore_latest(
        ckpt_lib.abstract_like(jax.device_get(ckpt_lib.state_to_tree(state)))
    )
    restored = ckpt_lib.tree_to_state(restored_tree, tx)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mngr.close()


def test_export_serve_matches_predict(synthetic_path, tmp_path):
    from learnablepoolingmethods_tpu.data import tfrecord_io
    from learnablepoolingmethods_tpu.export_model import export_model, load_exported_model

    state, model, _, _ = _train(synthetic_path, num_epochs=2)
    fcfg = FeatureConfig(
        feature_names=("mean_rgb", "mean_audio"), feature_sizes=(16, 4)
    )
    export_dir = str(tmp_path / "export")
    export_model(
        export_dir, "LogisticModel", MCFG, fcfg,
        jax.device_get(state.params), jax.device_get(state.batch_stats), top_k=5,
    )

    _, params, bs, _, _, serve = load_exported_model(export_dir)
    recs = list(tfrecord_io.read_tfrecords(synthetic_path))[:3]
    idx, vals = serve(recs)
    assert idx.shape == (3, 5) and vals.shape == (3, 5)

    # must equal direct predict on the same features
    reader = YT8MAggregatedFeatureReader(num_classes=32, feature_sizes=(16, 4))
    feats = np.stack([r["features"] for r in list(reader.read_file(synthetic_path))[:3]])
    predict = step_lib.make_predict_step(model, MCFG, False, top_k=5)
    v2, i2 = predict(jax.device_get(state.params), jax.device_get(state.batch_stats), feats)
    np.testing.assert_array_equal(idx, np.asarray(i2))
    np.testing.assert_allclose(vals, np.asarray(v2), rtol=1e-6)


def test_export_with_stablehlo(synthetic_path, tmp_path):
    """Best-effort jax.export artifact: serialize + deserialize + call."""
    from learnablepoolingmethods_tpu.export_model import export_model
    import os

    state, model, _, _ = _train(synthetic_path, num_epochs=1)
    fcfg = FeatureConfig(feature_names=("mean_rgb", "mean_audio"), feature_sizes=(16, 4))
    export_dir = str(tmp_path / "hlo_export")
    export_model(
        export_dir, "LogisticModel", MCFG, fcfg,
        jax.device_get(state.params), jax.device_get(state.batch_stats),
        top_k=5, with_stablehlo=True,
    )
    hlo_path = os.path.join(export_dir, "stablehlo.bin")
    err_path = os.path.join(export_dir, "stablehlo_error.txt")
    assert os.path.exists(hlo_path) or os.path.exists(err_path)
    if os.path.exists(hlo_path):
        from jax import export as jax_export

        exported = jax_export.deserialize(open(hlo_path, "rb").read())
        feats = np.zeros((1, 20), np.float32)
        vals, idxs = exported.call(
            jax.device_get(state.params), jax.device_get(state.batch_stats), feats
        )
        assert np.asarray(vals).shape == (1, 5)


def test_frame_level_training_converges(tmp_path):
    """A frame aggregator (DBoF, config 3) learns a frame-level synthetic
    task end-to-end: loss drops and batch GAP improves."""
    from learnablepoolingmethods_tpu.data.readers import YT8MFrameFeatureReader

    path = str(tmp_path / "fsyn.tfrecord")
    fixtures.make_learnable_synthetic_frame_level(
        path, num_videos=128, num_classes=16, rgb_size=10, audio_size=2,
        max_frames=8,
    )
    mcfg = ModelConfig(
        vocab_size=16, iterations=6, dbof_cluster_size=32, dbof_hidden_size=16,
    )
    tcfg = TrainingConfig(batch_size=32, base_learning_rate=0.02, num_epochs=25)
    reader = YT8MFrameFeatureReader(16, (10, 2), ("rgb", "audio"), 8)
    model = create_model("DbofModel", mcfg)
    tx = optimizers.create_optimizer(tcfg)
    batches = pipeline.batch_iterator(
        reader, path, 32, num_epochs=25, shuffle=True, seed=1
    )
    first = next(batches)
    params, bs = step_lib.init_model_variables(model, first, frame_features=True)
    state = TrainState.create(params, bs, tx)
    train_step = jax.jit(
        step_lib.make_train_step(
            model, losses.CrossEntropyLoss(), tcfg, mcfg, True
        ),
        donate_argnums=0,
    )
    rng = jax.random.key(0)
    logs = []
    batch = first
    while True:
        db = {k: v for k, v in batch.items() if k != "video_id"}
        state, m = train_step(state, db, rng)
        logs.append((float(m["loss"]), np.asarray(m["predictions"]), batch["labels"]))
        try:
            batch = next(batches)
        except StopIteration:
            break
    first_loss, first_preds, first_labels = logs[0]
    last_loss, last_preds, last_labels = logs[-1]
    assert last_loss < first_loss * 0.7, (first_loss, last_loss)
    gap_first = eval_util.calculate_gap(first_preds, first_labels)
    gap_last = eval_util.calculate_gap(last_preds, last_labels)
    assert gap_last > gap_first
    assert gap_last > 0.7, gap_last
