"""Normalization primitives.

``l2_normalize`` reproduces ``tf.nn.l2_normalize`` semantics
(x / sqrt(max(Σx², ε)), ε = 1e-12) — used by the input stage
(ref: train.py#build_graph l2-normalize of model_input) and by every
LOUPE-family module's intra-/global normalization.  Computed in fp32
regardless of input dtype so bf16 activations don't lose the norm.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def l2_normalize(x, axis=-1, epsilon: float = 1e-12):
    x32 = x.astype(jnp.float32)
    square_sum = jnp.sum(jnp.square(x32), axis=axis, keepdims=True)
    inv_norm = lax.rsqrt(jnp.maximum(square_sum, epsilon))
    return (x32 * inv_norm).astype(x.dtype)
