"""API-level coverage for eval.py#evaluate_checkpoint / #evaluation_loop
(VERDICT round-1 item 7): the default reference-parity path, --fast_eval,
--fast_forward, and --use_grain must all agree on the same checkpoint.

This module owns the absl flag namespace for the eval CLI — it must be the
only test module importing learnablepoolingmethods_tpu.eval (train/inference
define overlapping flags; the CLI subprocess tests cover those).
"""

import os

import numpy as np
import pytest

from learnablepoolingmethods_tpu import eval as eval_cli
from learnablepoolingmethods_tpu.core import checkpoints as ckpt_lib
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.data.fixtures import write_frame_level_fixture
from learnablepoolingmethods_tpu.models import create_model

FLAGS = eval_cli.FLAGS

# the NetVLAD fast path requires the Willow split-modality layout (rgb 1024 +
# audio tail), so the fixture uses 1024+2 feature dims with tiny clusters
V, D_RGB, D_AUDIO, MAXF = 16, 1024, 2, 8
N_RECORDS = 20


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    """Fixture records + a saved checkpoint + parsed flags."""
    root = tmp_path_factory.mktemp("evalapi")
    data = os.path.join(str(root), "val0.tfrecord")
    write_frame_level_fixture(
        data, N_RECORDS, num_classes=V, rgb_size=D_RGB, audio_size=D_AUDIO,
        max_frames=MAXF, seed=3,
    )

    FLAGS(["eval_api_test"])  # mark parsed with defaults
    FLAGS.eval_data_pattern = data
    FLAGS.train_dir = os.path.join(str(root), "td")
    FLAGS.run_once = True
    FLAGS.batch_size = 8
    FLAGS.model = "NetVLADModelLF"
    FLAGS.frame_features = True
    FLAGS.feature_names = "rgb,audio"
    FLAGS.feature_sizes = f"{D_RGB},{D_AUDIO}"
    FLAGS.max_frames = MAXF
    FLAGS.num_classes = V
    FLAGS.netvlad_cluster_size = 4
    FLAGS.netvlad_hidden_size = 8
    FLAGS.iterations = 4
    FLAGS.top_k = 5

    from learnablepoolingmethods_tpu import flags as lpm_flags

    mcfg = lpm_flags.model_config_from_flags()
    model = create_model("NetVLADModelLF", mcfg)
    rng = np.random.default_rng(0)
    batch = {
        "features": rng.integers(
            0, 256, size=(2, MAXF, D_RGB + D_AUDIO), dtype=np.uint8
        ),
        "num_frames": np.array([MAXF, 3], np.int32),
    }
    params, bs = step_lib.init_model_variables(model, batch, frame_features=True)
    mngr = ckpt_lib.CheckpointManager(FLAGS.train_dir)
    mngr.save(7, {"params": params, "batch_stats": bs})
    mngr.close()
    return root


def _run_eval(**overrides):
    saved = {k: getattr(FLAGS, k) for k in overrides}
    for k, v in overrides.items():
        setattr(FLAGS, k, v)
    try:
        return eval_cli.evaluation_loop()
    finally:
        for k, v in saved.items():
            setattr(FLAGS, k, v)


def test_default_vs_fast_eval_agree(eval_setup):
    """--fast_eval (on-device partials + vectorized GAP) must match the
    reference-semantics host accumulator to 5 decimals (PARITY.md claim,
    previously manual-evidence only)."""
    info_ref = _run_eval(fast_eval=False)
    info_fast = _run_eval(fast_eval=True)
    assert info_ref is not None and info_fast is not None
    for k in ("avg_hit_at_one", "avg_perr", "gap", "avg_loss"):
        np.testing.assert_allclose(
            info_ref[k], info_fast[k], atol=1e-5, err_msg=k
        )
    assert info_ref["aps"] is not None and info_fast["aps"] is None


def test_fast_forward_netvlad(eval_setup):
    """--fast_forward (BN-folded bf16 fused forward): the host accumulator
    and the device-partials paths run the SAME forward with the same
    per-batch keys, so their epoch metrics must agree to 5 decimals."""
    info_host = _run_eval(fast_forward=True, fast_eval=False)
    info_dev = _run_eval(fast_forward=True, fast_eval=True)
    for k in ("avg_hit_at_one", "avg_perr", "gap", "avg_loss"):
        np.testing.assert_allclose(
            info_host[k], info_dev[k], atol=1e-5, err_msg=k
        )
        assert np.isfinite(info_host[k])
    assert 0.0 <= info_host["gap"] <= 1.0


def test_use_grain_matches_python_reader(eval_setup):
    """--use_grain wires the grain DataLoader through the same eval; the
    record set is identical so the epoch metrics must agree exactly."""
    info_py = _run_eval(fast_eval=False)
    info_grain = _run_eval(fast_eval=False, use_grain=True)
    for k in ("avg_hit_at_one", "avg_perr", "gap", "avg_loss"):
        np.testing.assert_allclose(
            info_py[k], info_grain[k], atol=1e-6, err_msg=k
        )


def test_fast_forward_dbof(eval_setup, tmp_path):
    """--fast_forward dispatches DbofModel through ops/fast_dbof.py; host
    accumulator vs device partials on the same fused forward agree."""
    from learnablepoolingmethods_tpu import flags as lpm_flags

    saved = {
        k: getattr(FLAGS, k)
        for k in ("model", "train_dir", "dbof_cluster_size", "dbof_hidden_size")
    }
    FLAGS.model = "DbofModel"
    FLAGS.train_dir = str(tmp_path / "td_dbof")
    FLAGS.dbof_cluster_size = 8
    FLAGS.dbof_hidden_size = 8
    try:
        mcfg = lpm_flags.model_config_from_flags()
        model = create_model("DbofModel", mcfg)
        rng = np.random.default_rng(1)
        batch = {
            "features": rng.integers(
                0, 256, size=(2, MAXF, D_RGB + D_AUDIO), dtype=np.uint8
            ),
            "num_frames": np.array([MAXF, 5], np.int32),
        }
        params, bs = step_lib.init_model_variables(model, batch, frame_features=True)
        mngr = ckpt_lib.CheckpointManager(FLAGS.train_dir)
        mngr.save(1, {"params": params, "batch_stats": bs})
        mngr.close()

        info_host = _run_eval(fast_forward=True, fast_eval=False)
        info_dev = _run_eval(fast_forward=True, fast_eval=True)
        for k in ("avg_hit_at_one", "avg_perr", "gap", "avg_loss"):
            np.testing.assert_allclose(
                info_host[k], info_dev[k], atol=1e-5, err_msg=k
            )
    finally:
        for k, v in saved.items():
            setattr(FLAGS, k, v)


def test_fast_forward_transformer(eval_setup, tmp_path):
    """--fast_forward dispatches TransformerEncoderModel through
    ops/fast_transformer.py; since the model samples nothing, the fused
    forward's epoch metrics must also match the DEFAULT flax path, not just
    the device-partials variant of itself."""
    from learnablepoolingmethods_tpu import flags as lpm_flags

    keys = ("model", "train_dir", "attention_hidden_size", "attention_heads",
            "transformer_layers", "transformer_ff_size")
    saved = {k: getattr(FLAGS, k) for k in keys}
    FLAGS.model = "TransformerEncoderModel"
    FLAGS.train_dir = str(tmp_path / "td_tf")
    FLAGS.attention_hidden_size = 8
    FLAGS.attention_heads = 2
    FLAGS.transformer_layers = 1
    FLAGS.transformer_ff_size = 12
    try:
        mcfg = lpm_flags.model_config_from_flags()
        model = create_model("TransformerEncoderModel", mcfg)
        rng = np.random.default_rng(2)
        batch = {
            "features": rng.integers(
                0, 256, size=(2, MAXF, D_RGB + D_AUDIO), dtype=np.uint8
            ),
            "num_frames": np.array([MAXF, 4], np.int32),
        }
        params, bs = step_lib.init_model_variables(model, batch, frame_features=True)
        mngr = ckpt_lib.CheckpointManager(FLAGS.train_dir)
        mngr.save(1, {"params": params, "batch_stats": bs})
        mngr.close()

        info_flax = _run_eval(fast_forward=False, fast_eval=False)
        info_fast = _run_eval(fast_forward=True, fast_eval=False)
        info_dev = _run_eval(fast_forward=True, fast_eval=True)
        for k in ("avg_hit_at_one", "avg_perr", "gap"):
            np.testing.assert_allclose(
                info_fast[k], info_flax[k], atol=1e-3, err_msg=k  # bf16 path
            )
            np.testing.assert_allclose(
                info_fast[k], info_dev[k], atol=1e-5, err_msg=k
            )
    finally:
        for k, v in saved.items():
            setattr(FLAGS, k, v)


def test_fast_forward_int8_hidden(eval_setup):
    """--int8_hidden (weight-only int8 hidden FC): runs the same fused
    forward with the quantized FC; epoch metrics stay within the
    quantization envelope of the bf16 fast path, and the flag is rejected
    without --fast_forward / on other models."""
    info_bf16 = _run_eval(fast_forward=True, fast_eval=False)
    info_i8 = _run_eval(fast_forward=True, fast_eval=False, int8_hidden=True)
    for k in ("avg_hit_at_one", "avg_perr", "gap"):
        assert np.isfinite(info_i8[k]), k
        np.testing.assert_allclose(info_i8[k], info_bf16[k], atol=2e-2, err_msg=k)

    with pytest.raises(ValueError, match="int8_hidden requires"):
        _run_eval(fast_forward=False, int8_hidden=True)
