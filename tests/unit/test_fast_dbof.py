"""Fast DBoF path parity vs the flax model (fp32, presampled)."""

import jax
import jax.numpy as jnp
import numpy as np

from learnablepoolingmethods_tpu.config import ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model
from learnablepoolingmethods_tpu.ops.fast_dbof import (
    build_fast_dbof_inference,
    prepare_fast_dbof_params,
)

CFG = ModelConfig(
    vocab_size=20, iterations=6, dbof_cluster_size=32, dbof_hidden_size=16,
    presampled=True,
)


def test_fast_dbof_matches_model(rng):
    b, f, d = 3, 6, 24
    feats_u8 = rng.integers(0, 256, size=(b, f, d), dtype=np.uint8)
    nf = np.full(b, f, np.int32)
    model = create_model("DbofModel", CFG)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, num_frames=jnp.asarray(nf), training=True,
    )
    # perturb BN stats so folding is non-trivial
    bs = jax.tree.map(
        lambda a: a + 0.03 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}

    want = model.apply(variables, x, num_frames=jnp.asarray(nf), training=False)[
        "predictions"
    ]
    fp = prepare_fast_dbof_params(variables, CFG, compute_dtype=jnp.float32)
    fast = build_fast_dbof_inference(CFG, compute_dtype=jnp.float32, return_probs=True)
    got = fast(fp, jnp.asarray(feats_u8), jnp.asarray(nf), jax.random.key(0),
               presampled=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fast_dbof_average_pooling(rng):
    import dataclasses

    cfg = dataclasses.replace(CFG, dbof_pooling_method="average")
    b, f, d = 2, 5, 24
    feats_u8 = rng.integers(0, 256, size=(b, f, d), dtype=np.uint8)
    nf = np.full(b, f, np.int32)
    model = create_model("DbofModel", cfg)
    x = step_lib.preprocess_input(jnp.asarray(feats_u8))
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, num_frames=jnp.asarray(nf), training=True,
    )
    want = model.apply(variables, x, num_frames=jnp.asarray(nf), training=False)[
        "predictions"
    ]
    fp = prepare_fast_dbof_params(variables, cfg, compute_dtype=jnp.float32)
    fast = build_fast_dbof_inference(cfg, compute_dtype=jnp.float32, return_probs=True)
    got = fast(fp, jnp.asarray(feats_u8), jnp.asarray(nf), jax.random.key(0),
               presampled=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
