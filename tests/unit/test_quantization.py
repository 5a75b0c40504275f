"""Dequantize bit-exactness (SURVEY.md §7 'hard parts': GAP parity depends on it)."""

import jax.numpy as jnp
import numpy as np

from learnablepoolingmethods_tpu.utils import dequantize, dequantize_np, quantize_np


def test_dequantize_affine_constants():
    # utils.py#Dequantize: scalar = 4/255, bias = 4/512 - 2.
    q = np.array([0, 255, 128], dtype=np.uint8)
    out = dequantize_np(q)
    scalar = 4.0 / 255.0
    bias = 4.0 / 512.0 - 2.0
    np.testing.assert_allclose(out, q.astype(np.float32) * scalar + bias, rtol=0, atol=0)


def test_dequantize_jax_matches_numpy_bitexact(rng):
    q = rng.integers(0, 256, size=(7, 300, 64), dtype=np.uint8)
    out_np = dequantize_np(q)
    out_jax = np.asarray(dequantize(jnp.asarray(q)))
    np.testing.assert_array_equal(out_np, out_jax)


def test_dequantize_matches_tf_golden(rng):
    """Golden test vs a TF2 transcription of the reference affine."""
    import tensorflow as tf

    q = rng.integers(0, 256, size=(4, 128), dtype=np.uint8)

    def tf_dequantize(feat_vector, max_q=2.0, min_q=-2.0):
        assert max_q > min_q
        quantized_range = max_q - min_q
        scalar = quantized_range / 255.0
        bias = (quantized_range / 512.0) + min_q
        return tf.cast(feat_vector, tf.float32) * scalar + bias

    golden = tf_dequantize(tf.constant(q)).numpy()
    np.testing.assert_allclose(dequantize_np(q), golden, rtol=0, atol=1e-7)


def test_quantize_roundtrip(rng):
    x = rng.uniform(-2.0, 2.0, size=(5, 32)).astype(np.float32)
    q = quantize_np(x)
    x2 = dequantize_np(q)
    # One quantization step is 4/255 ≈ 0.0157; round-trip error ≤ step.
    assert np.max(np.abs(x - x2)) <= 4.0 / 255.0


def test_quantize_saturates():
    x = np.array([-10.0, 10.0], dtype=np.float32)
    q = quantize_np(x)
    assert q[0] == 0 and q[1] == 255
