"""ops/fast_dispatch registry — the single model-name → fast-path mapping
shared by eval.py (--fast_forward), inference.py (--fast_infer), and
export_model.py (prefer_fast/--fast_serve).  Per-path numerics are covered
by test_fast_infer/test_fast_lf/test_fast_transformer; this file pins the
registry contract the three CLIs rely on."""

import numpy as np
import pytest

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.ops.fast_dispatch import (
    fast_path_models,
    get_fast_path,
)

EXPECTED = {
    "NetVLADModelLF",
    "DbofModel",
    "TransformerEncoderModel",
    "AttentionNetVLADModel",
    "NetFVModelLF",
    "NetRVLADModelLF",
    "SoftDbofModelLF",
    "NeXtVLADModel",
}


def test_registry_covers_every_fast_model():
    assert set(fast_path_models()) == EXPECTED
    for name in EXPECTED:
        path = get_fast_path(name)
        assert path is not None and callable(path.prepare) and callable(path.build)
    assert get_fast_path("LogisticModel") is None
    assert get_fast_path("LstmModel") is None


def test_giant_fc_models_support_int8():
    """int8 is exactly the giant-hidden-FC set (where HBM-weight-bound
    stages exist for it to pay)."""
    giant = {"NetVLADModelLF", "AttentionNetVLADModel",
             "NetFVModelLF", "NetRVLADModelLF"}
    for name in EXPECTED:
        assert get_fast_path(name).supports_int8 == (name in giant), name


def test_non_netvlad_prepare_rejects_int8():
    """int8_hidden on a model without the int8 FC must raise loudly from
    prepare (the CLIs surface it; export converts it to its documented
    fallback/raise behavior)."""
    mcfg = ModelConfig(
        vocab_size=8, dbof_cluster_size=8, dbof_hidden_size=8, iterations=4
    )
    model = create_model("DbofModel", mcfg)
    feats = np.zeros((1, 4, 1152), np.uint8)
    params, bs = step_lib.init_model_variables(
        model, {"features": feats, "num_frames": np.ones((1,), np.int32)}, True
    )
    path = get_fast_path("DbofModel")
    with pytest.raises(ValueError, match="int8_hidden is only supported"):
        path.prepare({"params": params, "batch_stats": bs}, mcfg, int8_hidden=True)


def test_netvlad_build_and_prepare_roundtrip():
    """The registry's prepare/build wrappers forward kwargs faithfully:
    int8 prepare emits the quantized tree and build's jnp route runs it."""
    import jax
    import jax.numpy as jnp

    mcfg = ModelConfig(
        vocab_size=8, netvlad_cluster_size=4, netvlad_hidden_size=8,
        iterations=4, presampled=False,
    )
    model = create_model("NetVLADModelLF", mcfg)
    rng = np.random.default_rng(0)
    feats = rng.integers(0, 256, size=(2, 4, 1152), dtype=np.uint8)
    nf = np.asarray([3, 4], np.int32)
    params, bs = step_lib.init_model_variables(
        model, {"features": feats, "num_frames": nf}, True
    )
    path = get_fast_path("NetVLADModelLF")
    fp = path.prepare(
        {"params": params, "batch_stats": bs}, mcfg, int8_hidden=True
    )
    assert fp["w_rgb_q"].dtype == jnp.int8
    fn = path.build(mcfg, top_k=3, use_pallas=False)
    vals, idxs = fn(fp, jnp.asarray(feats), jnp.asarray(nf), jax.random.key(0))
    assert vals.shape == (2, 3) and idxs.shape == (2, 3)
    assert np.isfinite(np.asarray(vals)).all()


def test_int8_capable_models_static_list_matches_registry():
    """int8_capable_models() is deliberately static (flag validation must
    not import the kernel modules) — pin it to the registry's truth."""
    from learnablepoolingmethods_tpu.ops.fast_dispatch import (
        int8_capable_models,
    )

    assert set(int8_capable_models()) == {
        n for n in fast_path_models() if get_fast_path(n).supports_int8
    }
