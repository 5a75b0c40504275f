"""Every registered model: init/apply in train+eval mode, valid prediction dict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.models import create_model, find_class_by_name, list_models

TINY = ModelConfig(
    vocab_size=20, iterations=6, dbof_cluster_size=32, dbof_hidden_size=16,
    netvlad_cluster_size=8, netvlad_hidden_size=16, fv_cluster_size=4,
    fv_hidden_size=16, dbow_cluster_size=16, rvlad_cluster_size=8,
    lstm_cells=12, lstm_layers=2, gru_cells=12, gru_layers=2,
    attention_heads=2, attention_hidden_size=16, transformer_layers=1,
    transformer_ff_size=32, attention_cluster_size=4,
)
VIDEO_MODELS = {"LogisticModel", "MoeModel"}


@pytest.mark.parametrize("name", list_models())
def test_model_contract(name, rng):
    B, F, D = 3, 10, 48
    m = create_model(name, TINY)
    key = jax.random.key(0)
    if name in VIDEO_MODELS:
        inp = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
        kwargs = {}
    else:
        inp = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
        kwargs = {"num_frames": jnp.asarray([10, 4, 7])}

    variables = m.init({"params": key, "sampling": key, "dropout": key},
                       inp, training=True, **kwargs)
    out, _ = m.apply(variables, inp, training=True, **kwargs,
                     rngs={"sampling": key, "dropout": key}, mutable=["batch_stats"])
    p = out["predictions"]
    assert p.shape == (B, TINY.vocab_size)
    assert np.all(np.isfinite(np.asarray(p)))
    assert float(jnp.min(p)) >= 0.0 and float(jnp.max(p)) <= 1.0

    # eval mode: deterministic, no mutable state
    out_eval = m.apply(variables, inp, training=False, **kwargs)
    out_eval2 = m.apply(variables, inp, training=False, **kwargs)
    np.testing.assert_array_equal(
        np.asarray(out_eval["predictions"]), np.asarray(out_eval2["predictions"])
    )


def test_unknown_model_name_raises():
    with pytest.raises(ValueError, match="Unknown model"):
        find_class_by_name("NoSuchModel")


def test_models_are_jittable(rng):
    """jit-compile a frame model forward; assert no retrace on second call."""
    m = create_model("NetVLADModelLF", TINY)
    B, F, D = 2, 8, 48
    inp = jnp.asarray(rng.normal(size=(B, F, D)).astype(np.float32))
    nf = jnp.asarray([8, 3])
    key = jax.random.key(0)
    variables = m.init({"params": key, "sampling": key}, inp, num_frames=nf)

    @jax.jit
    def fwd(v, x, n):
        return m.apply(v, x, num_frames=n, training=False)["predictions"]

    p1 = fwd(variables, inp, nf)
    p2 = fwd(variables, inp + 0.1, nf)
    assert fwd._cache_size() == 1
    assert p1.shape == p2.shape == (B, TINY.vocab_size)


def test_netvlad_dimred_path(rng):
    """--netvlad_dimred inserts a learned bias-free projection before the
    pooling modules (ref: NetVLADModelLF dimred matmul)."""
    import jax

    from learnablepoolingmethods_tpu.config import ModelConfig
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.models import create_model

    cfg = ModelConfig(
        vocab_size=8, iterations=4, netvlad_cluster_size=4,
        netvlad_hidden_size=8, netvlad_dimred=10,
    )
    model = create_model("NetVLADModelLF", cfg)
    feats = rng.integers(0, 256, size=(2, 6, 24), dtype=np.uint8)
    nf = np.array([6, 3], np.int32)
    params, bs = step_lib.init_model_variables(
        model, {"features": feats, "num_frames": nf}, frame_features=True
    )
    assert params["dimred"].shape == (24, 10)
    x = step_lib.preprocess_input(jnp.asarray(feats))
    out = model.apply(
        {"params": params, "batch_stats": bs}, x,
        num_frames=jnp.asarray(nf), training=False,
    )["predictions"]
    assert out.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_moe_l2_separate_penalty(rng):
    """--moe_l2 drives the MoE head kernels independently of l2_penalty."""
    from learnablepoolingmethods_tpu.config import ModelConfig
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.models import create_model
    import jax

    cfg = ModelConfig(vocab_size=8)
    model = create_model("MoeModel", cfg)
    x = rng.normal(size=(2, 12)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    base = float(step_lib.regularization_loss(params, 1.0, moe_l2=1.0))
    doubled = float(step_lib.regularization_loss(params, 1.0, moe_l2=2.0))
    np.testing.assert_allclose(doubled, 2 * base, rtol=1e-6)
    zero = float(step_lib.regularization_loss(params, 1.0, moe_l2=0.0))
    assert zero == 0.0  # MoeModel has only head kernels


@pytest.mark.parametrize(
    "name", ["TransformerEncoderModel", "AttentionPoolingModel", "AttentionNetVLADModel"]
)
def test_attention_models_ignore_padded_frames(name, rng):
    """Config-5 masking property: content of frames >= num_frames must not
    change predictions (the attention mask + masked pooling cover them)."""
    import jax

    from learnablepoolingmethods_tpu.core import step as step_lib

    model = create_model(name, TINY)
    nf = np.array([5, 3], np.int32)
    feats_a = rng.normal(size=(2, 8, 12)).astype(np.float32)
    feats_b = feats_a.copy()
    for i, n in enumerate(nf):
        feats_b[i, n:] = rng.normal(size=(8 - n, 12)).astype(np.float32) * 5

    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        jnp.asarray(feats_a), num_frames=jnp.asarray(nf), training=True,
    )

    def run(x):
        return np.asarray(
            model.apply(
                variables, jnp.asarray(x), num_frames=jnp.asarray(nf),
                training=False,
            )["predictions"]
        )

    np.testing.assert_allclose(run(feats_a), run(feats_b), atol=1e-5)


def test_gather_frames_u8_exact_vs_take_along_axis():
    """The int8 one-hot matmul gather must equal XLA's gather bit-for-bit
    over the full uint8 range (models/model_utils.py#gather_frames_u8)."""
    import numpy as np
    import jax.numpy as jnp
    from learnablepoolingmethods_tpu.models.model_utils import gather_frames_u8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, size=(5, 13, 256), dtype=np.uint8))
    idx = jnp.asarray(rng.integers(0, 13, size=(5, 9)).astype(np.int32))
    got = gather_frames_u8(x, idx)
    want = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    assert got.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sample_random_frames_onehot_exact_vs_gather():
    """The one-hot-matmul sampler must equal a take_along_axis gather
    bit-for-bit for float inputs (single 1.0*v product, f32 accumulation)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from learnablepoolingmethods_tpu.models import model_utils

    rng = np.random.default_rng(1)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(0, 3, (4, 11, 32)), dtype)
        nf = jnp.asarray([3, 11, 7, 1], jnp.int32)
        key = jax.random.key(2)
        got = model_utils.sample_random_frames(x, nf, 9, key)
        # reproduce the index computation, then gather
        u = jax.random.uniform(key, (4, 9), dtype=jnp.float32)
        idx = jnp.minimum((u * nf.astype(jnp.float32)[:, None]).astype(jnp.int32), 10)
        want = jnp.take_along_axis(x, idx[:, :, None], axis=1)
        assert got.dtype == dtype
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )


def test_samplers_agree_when_num_frames_exceeds_padding():
    """sample_random_frames and sample_frame_features document the SAME
    index distribution; with identical rng they must pick identical frames,
    including when num_frames > F (both clamp the count to the padded
    length before the multiply — the advisor-flagged divergence)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from learnablepoolingmethods_tpu.models import model_utils

    rng = np.random.default_rng(7)
    feats_u8 = rng.integers(0, 256, size=(4, 10, 16), dtype=np.uint8)
    # one video exceeds padding (num_frames > F), one equals it, two within
    nf = jnp.asarray([25, 10, 3, 1], jnp.int32)
    key = jax.random.key(11)
    picked_u8 = model_utils.sample_frame_features(
        jnp.asarray(feats_u8), nf, 6, key
    )
    picked_f32 = model_utils.sample_random_frames(
        jnp.asarray(feats_u8, jnp.float32), nf, 6, key
    )
    np.testing.assert_array_equal(
        np.asarray(picked_u8, np.float32), np.asarray(picked_f32)
    )
    # and the num_frames>F video must be uniform over [0, F), not piled on
    # the last frame: with count clamped to 10 and u<0.9 for some draw,
    # index < 9 must occur (probability of failure with the old bug: 0 —
    # every index was min(floor(u*25), 9) = 9 for u >= 0.36).
    u = jax.random.uniform(key, (4, 6), dtype=jnp.float32)
    idx = np.minimum((np.asarray(u[0]) * 10).astype(np.int32), 9)
    got_rows = np.asarray(picked_u8[0], np.float32)
    want_rows = feats_u8[0, idx].astype(np.float32)
    np.testing.assert_array_equal(got_rows, want_rows)
