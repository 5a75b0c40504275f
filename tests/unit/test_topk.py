"""top_k_grouped must be bit-identical to jax.lax.top_k (values AND
indices), including tie ordering.  The hot paths now call top_k_exact,
which delegates to lax.top_k outright (the grouped split measured SLOWER
in-program — ops/topk.py module docstring records the reversal); the
grouped variant stays tested so the recorded negative keeps its exactness
proof."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from learnablepoolingmethods_tpu.ops.topk import top_k_exact, top_k_grouped


def _check(scores, k):
    ve, ie = top_k_grouped(jnp.asarray(scores), k)
    vr, ir = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(ve), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(ir))


@pytest.mark.parametrize("v", [3862, 4096, 130, 257])
def test_matches_lax_topk_random(v):
    rng = np.random.default_rng(0)
    _check(rng.random((17, v)).astype(np.float32), 20)


def test_matches_on_tie_heavy_quantized_scores():
    # ties are the risk: quantize scores to 16 levels so most entries collide
    rng = np.random.default_rng(1)
    scores = (rng.random((31, 3862)) * 16).astype(np.int32).astype(np.float32) / 16.0
    _check(scores, 20)


def test_matches_with_neg_inf_rows():
    rng = np.random.default_rng(2)
    scores = rng.random((8, 1000)).astype(np.float32)
    scores[:, 30:] = -np.inf  # fewer finite entries than some group spans
    _check(scores, 20)
    scores[2, :] = -np.inf  # a fully masked row
    _check(scores, 20)


def test_fallback_paths():
    rng = np.random.default_rng(3)
    # k > group width -> falls back to lax.top_k
    _check(rng.random((4, 3862)).astype(np.float32), 256)
    # narrow rows where the split wouldn't pay off
    _check(rng.random((4, 64)).astype(np.float32), 5)
    # 1-D input passes through
    v, i = top_k_grouped(jnp.asarray(rng.random(100).astype(np.float32)), 5)
    assert v.shape == (5,)


def test_constant_scores_prefer_lowest_indices():
    scores = np.zeros((3, 3862), np.float32)
    _check(scores, 20)
    ve, ie = top_k_grouped(jnp.asarray(scores), 20)
    np.testing.assert_array_equal(np.asarray(ie), np.tile(np.arange(20), (3, 1)))


def test_top_k_exact_is_lax_topk():
    rng = np.random.default_rng(4)
    scores = rng.random((5, 3862)).astype(np.float32)
    ve, ie = top_k_exact(jnp.asarray(scores), 20)
    vr, ir = jax.lax.top_k(jnp.asarray(scores), 20)
    np.testing.assert_array_equal(np.asarray(ve), np.asarray(vr))
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(ir))
