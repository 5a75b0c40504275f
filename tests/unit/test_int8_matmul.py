"""Weight-only int8 hidden-FC path (ops/int8_matmul.py).

- quantizer roundtrip error bound: |dequant(w) − w| ≤ s/2 per element.
- matmul_wi8 ≡ explicit dequantized matmul (bf16-operand tolerance).
- end-to-end accuracy gate: GAP@20 on a synthetic multi-label set with the
  int8 hidden FC stays within the north-star 1e-3 budget of the bf16 path
  (the ranking-metric analog of the parity drill, TF-free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from learnablepoolingmethods_tpu.ops.int8_matmul import (
    matmul_wi8,
    quantize_weight_int8,
)


def test_quantizer_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8192, 64)).astype(np.float32) * rng.uniform(
        0.01, 3.0, size=(1, 64)
    )
    w_i8, s = quantize_weight_int8(w)
    assert w_i8.dtype == np.int8 and s.shape == (64,)
    deq = w_i8.astype(np.float32) * s[None, :]
    err = np.abs(deq - w)
    assert np.all(err <= s[None, :] * 0.5 + 1e-7)
    # extremes hit the full int8 range
    assert np.max(np.abs(w_i8)) == 127


def test_quantizer_zero_column():
    w = np.zeros((256, 8), np.float32)
    w[:, 0] = 1.0  # one live column so the matmul is non-degenerate
    w_i8, s = quantize_weight_int8(w)
    assert np.all(w_i8[:, 1:] == 0) and np.all(s[1:] == 0.0)
    y = np.asarray(matmul_wi8(jnp.ones((2, 256)), jnp.asarray(w_i8), jnp.asarray(s)))
    assert np.all(y[:, 1:] == 0.0) and np.all(y[:, 0] != 0.0)


def test_matmul_matches_dequantized_reference():
    rng = np.random.default_rng(1)
    b, k, n = 16, 4096, 256
    x = rng.normal(size=(b, k)).astype(np.float32)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    w_i8, s = quantize_weight_int8(w)
    got = np.asarray(matmul_wi8(jnp.asarray(x), jnp.asarray(w_i8), jnp.asarray(s)))
    truth = (
        x.astype(np.float32) @ (w_i8.astype(np.float32) * s[None, :])
    )
    denom = np.maximum(np.abs(truth), 1.0)
    # only bf16 operand rounding separates the two
    assert np.max(np.abs(got - truth) / denom) < 3e-2


def _gap_at_20(probs, labels):
    from learnablepoolingmethods_tpu.metrics.eval_util import EvaluationMetrics

    m = EvaluationMetrics(labels.shape[1], 20)
    m.accumulate(probs, labels, np.zeros(probs.shape[0]))
    return m.get()["gap"]


def test_int8_hidden_gap_within_budget():
    """Ranking-accuracy gate: an MoE-style head on VLAD-like unit-norm
    features, hidden FC computed bf16 vs int8-weight-only → |ΔGAP| ≤ 1e-3
    (the north-star GAP budget, BASELINE.json#metric)."""
    rng = np.random.default_rng(2)
    n_vid, k, h, v = 400, 8192, 64, 200
    feats = rng.normal(size=(n_vid, k)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    w = rng.normal(size=(k, h)).astype(np.float32) * 0.02
    w_out = rng.normal(size=(h, v)).astype(np.float32) * 0.3
    # labels correlated with the fp32 scores so GAP is in a realistic range
    logits = (feats @ w) @ w_out
    labels = (logits > np.quantile(logits, 0.99, axis=1, keepdims=True)).astype(
        np.float32
    )

    def head(hidden):
        return np.asarray(jax.nn.sigmoid(jnp.asarray(hidden) @ jnp.asarray(w_out)))

    h_bf16 = np.asarray(
        jnp.matmul(
            jnp.asarray(feats).astype(jnp.bfloat16),
            jnp.asarray(w).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    w_i8, s = quantize_weight_int8(w)
    h_i8 = np.asarray(matmul_wi8(jnp.asarray(feats), jnp.asarray(w_i8), jnp.asarray(s)))

    gap_bf16 = _gap_at_20(head(h_bf16), labels)
    gap_i8 = _gap_at_20(head(h_i8), labels)
    assert gap_bf16 > 0.3  # non-vacuous ranking signal
    assert abs(gap_i8 - gap_bf16) <= 1e-3, (gap_bf16, gap_i8)
