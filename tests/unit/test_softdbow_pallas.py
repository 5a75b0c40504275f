"""softdbow_fused interpret-mode parity vs the jnp twin (and the twin vs a
hand-rolled numpy histogram)."""

import jax.numpy as jnp
import numpy as np

from learnablepoolingmethods_tpu.ops.softdbow_pallas import (
    softdbow_fused,
    softdbow_reference,
)


def _inputs(f):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (3, f, 16)), jnp.float32)
    c = jnp.asarray(rng.normal(0, 0.25, (16, 24)), jnp.float32)
    scale = jnp.asarray(rng.normal(1, 0.1, (24,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (24,)), jnp.float32)
    return x, c, scale, bias


def test_fused_matches_reference_split_accumulation():
    # F=16 engages split=2 (16 % 2 == 0 AND 8 % 8 == 0): exercises the
    # grid-revisit zero-init/accumulate path of the kernel
    from learnablepoolingmethods_tpu.ops import softdbow_pallas as sp

    f = 16
    assert f % sp._F_SPLIT == 0 and (f // sp._F_SPLIT) % 8 == 0
    x, c, scale, bias = _inputs(f)
    got = softdbow_fused(x, c, scale, bias, interpret=True)
    want = softdbow_reference(x, c, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_matches_reference_odd_frames():
    x, c, scale, bias = _inputs(7)  # falls back to a single F block
    got = softdbow_fused(x, c, scale, bias, interpret=True)
    want = softdbow_reference(x, c, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_reference_matches_numpy():
    x, c, scale, bias = _inputs(6)
    logits = np.einsum("bfd,dk->bfk", np.asarray(x), np.asarray(c))
    logits = logits * np.asarray(scale) + np.asarray(bias)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    a = e / e.sum(-1, keepdims=True)
    want = a.sum(1)
    got = softdbow_reference(x, c, scale, bias)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
