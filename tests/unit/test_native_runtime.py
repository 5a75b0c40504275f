"""Native C++ StableHLO executor (native/stablehlo_runner.cc) tests.

The executor is the rebuild's native serving runtime (SURVEY.md L7: the
reference served SavedModels through TensorFlow's C++ runtime) — an
exported artifact's StableHLO module compiled and run by the XLA PJRT CPU
client with no Python/JAX in the execution path.  The oracle is the jit'd
predict step the module was exported from: same weights, same inputs, the
two stacks must agree exactly on indices and to f32 tolerance on values.
"""

import numpy as np
import pytest

from learnablepoolingmethods_tpu.core import native_runtime as nr

pytestmark = pytest.mark.skipif(
    not nr.is_available(),
    reason=f"native StableHLO runtime unavailable: {nr.load_error()}",
)

V = 24
TOP_K = 5


def test_selftest():
    """Embedded add-module through the full C++ path (compile + execute)."""
    nr.selftest()


def test_compiled_module_runs_jax_export():
    import jax
    from jax import export as jax_export

    fn = jax.jit(lambda a, b: (a @ b, (a * 2.0).sum(axis=1)))
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.ones((4, 2), np.float32)
    exported = jax_export.export(fn)(
        jax.ShapeDtypeStruct(a.shape, a.dtype), jax.ShapeDtypeStruct(b.shape, b.dtype)
    )
    cm = nr.CompiledModule(exported.mlir_module())
    got_mm, got_sum = cm.execute([a, b], [((3, 2), "float32"), ((3,), "float32")])
    np.testing.assert_allclose(got_mm, a @ b, rtol=1e-6)
    np.testing.assert_allclose(got_sum, (a * 2.0).sum(axis=1), rtol=1e-6)
    cm.close()


def test_execute_error_reports_not_crashes():
    with pytest.raises(RuntimeError, match="parse failed"):
        nr.CompiledModule("this is not mlir")


def _export_and_load(tmp_path, model_name, mcfg, fcfg, batch):
    import jax

    from learnablepoolingmethods_tpu import export_model as em
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.models import create_model

    model = create_model(model_name, mcfg)
    params, batch_stats = step_lib.init_model_variables(
        model, batch, fcfg.frame_features, seed=0
    )
    export_dir = str(tmp_path / f"export_{model_name}")
    em.export_model(
        export_dir, model_name, mcfg, fcfg, params, batch_stats,
        top_k=TOP_K, with_stablehlo=True,
        stablehlo_batch_size=batch["features"].shape[0],
    )
    import os

    assert os.path.exists(os.path.join(export_dir, em._MLIR_FILE))
    assert os.path.exists(os.path.join(export_dir, em._NATIVE_SPEC_FILE))
    predict = jax.jit(
        step_lib.make_predict_step(model, mcfg, fcfg.frame_features, top_k=TOP_K)
    )
    return export_dir, predict, params, batch_stats


def test_video_level_native_matches_jax(tmp_path):
    """LogisticModel artifact: native run ≡ the jit'd predict step."""
    from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig

    rng = np.random.default_rng(0)
    mcfg = ModelConfig(vocab_size=V)
    fcfg = FeatureConfig.from_flag_strings(
        "mean_rgb,mean_audio", "16,4", frame_features=False,
    )
    feats = rng.normal(size=(8, 20)).astype(np.float32)
    batch = {"features": feats}
    export_dir, predict, params, batch_stats = _export_and_load(
        tmp_path, "LogisticModel", mcfg, fcfg, batch
    )

    exe = nr.NativeExecutable.from_export_dir(export_dir)
    got_vals, got_idx = exe.run(feats)
    want_vals, want_idx = predict(params, batch_stats, feats)
    np.testing.assert_array_equal(got_idx, np.asarray(want_idx))
    np.testing.assert_allclose(got_vals, np.asarray(want_vals), atol=1e-6)


def test_frame_level_native_matches_jax(tmp_path):
    """DbofModel artifact (deterministic window sampling): native ≡ jax,
    including the uint8 dequantize stage and num_frames masking."""
    from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig

    rng = np.random.default_rng(1)
    maxf = 6
    mcfg = ModelConfig(
        vocab_size=V, iterations=maxf, sample_random_frames=False,
        dbof_cluster_size=16, dbof_hidden_size=8, moe_num_mixtures=2,
    )
    fcfg = FeatureConfig.from_flag_strings(
        "rgb,audio", "12,4", frame_features=True, max_frames=maxf,
    )
    feats = rng.integers(0, 256, size=(4, maxf, 16), dtype=np.uint8)
    nf = np.array([6, 3, 1, 5], np.int32)
    batch = {"features": feats, "num_frames": nf}
    export_dir, predict, params, batch_stats = _export_and_load(
        tmp_path, "DbofModel", mcfg, fcfg, batch
    )

    exe = nr.NativeExecutable.from_export_dir(export_dir)
    got_vals, got_idx = exe.run(feats, nf)
    want_vals, want_idx = predict(params, batch_stats, feats, nf)
    np.testing.assert_array_equal(got_idx, np.asarray(want_idx))
    np.testing.assert_allclose(got_vals, np.asarray(want_vals), atol=1e-6)

    # wrong batch size → clean error, not a crash
    with pytest.raises(ValueError, match="pad the batch"):
        exe.run(feats[:2], nf[:2])


def test_flagship_netvlad_native_matches_jax(tmp_path):
    """NetVLADModelLF (the flagship, BASELINE config 4) exports to StableHLO
    and runs natively: the flax graph is pure jnp (the Pallas kernels live
    only in the separate fast paths), so the whole Willow chain — dequant →
    ℓ2 → input BN → dual NetVLAD → hidden FC → gating → MoE → top-k —
    executes on the PJRT CPU runtime."""
    from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig

    rng = np.random.default_rng(2)
    maxf = 5
    mcfg = ModelConfig(
        vocab_size=V, iterations=maxf, sample_random_frames=False,
        netvlad_cluster_size=8, netvlad_hidden_size=16, moe_num_mixtures=2,
    )
    fcfg = FeatureConfig.from_flag_strings(
        "rgb,audio", "12,4", frame_features=True, max_frames=maxf,
    )
    feats = rng.integers(0, 256, size=(3, maxf, 16), dtype=np.uint8)
    nf = np.array([5, 2, 4], np.int32)
    batch = {"features": feats, "num_frames": nf}
    export_dir, predict, params, batch_stats = _export_and_load(
        tmp_path, "NetVLADModelLF", mcfg, fcfg, batch
    )

    exe = nr.NativeExecutable.from_export_dir(export_dir)
    got_vals, got_idx = exe.run(feats, nf)
    want_vals, want_idx = predict(params, batch_stats, feats, nf)
    np.testing.assert_array_equal(got_idx, np.asarray(want_idx))
    np.testing.assert_allclose(got_vals, np.asarray(want_vals), atol=1e-6)
