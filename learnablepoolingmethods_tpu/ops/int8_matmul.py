"""Weight-only int8 matmul for the giant hidden FC (XLA convert-dot, TPU).

The 278528×1024 hidden FC of the Willow config sits at the bf16 HBM floor
(BASELINE.md: the weight is ~2/3 of the stage's traffic, and at B≤256 the
stage is purely HBM-bound).  Storing the weight int8 and dequantizing on
the way into the MXU cuts the weight stream in half.

**Measured (real v5e, B=256, [256,262144]×[262144,1024], one window):**

    bf16 XLA matmul           2.92 ms
    hand Pallas kernel        2.10 ms   (K-blocked grid, VMEM dequant)
    XLA `w_i8.astype(bf16)`   1.04 ms   ← shipped

XLA fuses the s8→bf16 convert into the dot's operand stream (no bf16 copy
of the weight ever hits HBM) and pipelines the HBM reads far better than
the Mosaic grid did — the same lesson as the SR-Adam kernel
(memory/tpu-perf-findings: XLA beats Pallas for streaming-shaped work;
save Pallas for fusions XLA cannot express).  The hand kernel was measured
at ~54% of ideal overlap and removed.

Scheme: per-output-column symmetric quantization —

    s[n]   = max_k |w[k, n]| / 127
    w_i8   = round(w / s)                (int8)
    y      = (x · bf16(w_i8)) ⊙ s       (one dot + one [B,N] multiply)

int8 → bf16 is exact (integers ≤127), so the only added error vs a bf16
weight is the quantization of w itself (~1% relative on the FC output for
Gaussian-shaped weights, vs ~0.1% for bf16 rounding).  End-to-end effect
on ranking metrics is gated in tests/unit/test_int8_matmul.py (|ΔGAP| ≤
the north-star 1e-3 budget) and measured in BASELINE.md.

This is an opt-in inference feature (``--int8_hidden``): +14% end-to-end
at B=256 where the FC is HBM-bound; ~neutral at B=512 where the stage is
already MXU-compute-bound (cutting bytes can't help — measured, see
BASELINE.md row).

(ref: the hidden FC in frame_level_models.py#NetVLADModelLF — the
rebuild's fast path keeps it split per modality, ops/fast_infer.py.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quantize_weight_int8(w):
    """Host-side per-output-column symmetric quantization.

    w [K, N] (numpy or jax, any float dtype) → (w_i8 [K, N] int8,
    scales [N] f32).
    """
    w = np.asarray(w, np.float32)
    amax = np.max(np.abs(w), axis=0)  # [N]
    scales = (amax / 127.0).astype(np.float32)
    safe = np.where(scales == 0.0, 1.0, scales)
    w_i8 = np.clip(np.rint(w / safe[None, :]), -127, 127).astype(np.int8)
    return w_i8, scales


def matmul_wi8(x, w_i8, scales):
    """y [B, N] f32 = x · dequant(w_i8, scales).

    The convert sits INSIDE the jit so XLA fuses it into the dot operand
    stream — do not materialize ``w_i8.astype(bf16)`` outside a jit.
    """
    y = jnp.matmul(
        x.astype(jnp.bfloat16),
        w_i8.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return y * scales.astype(jnp.float32)
