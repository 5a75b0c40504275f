"""Isolated hidden-FC measurement: bf16 weight vs int8 weight-only path.

The Willow hidden FC [B, 262144]x[262144, 1024] is HBM-bound at small B
(BASELINE.md: the weight is ~2/3 of the stage's bytes).  Weight-only int8
halves the weight stream; XLA fuses the s8->bf16 convert into the dot's
operand read (ops/int8_matmul.py docstring has the kernel-vs-XLA history).
Measures both paths on the real chip with the dep-chained methodology
(tools/prof_peak.py).  Run with --batch to sweep the B where it pays.
"""

import argparse
import sys

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from learnablepoolingmethods_tpu.ops.int8_matmul import (
    matmul_wi8,
    quantize_weight_int8,
)


from _bench_util import log, timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    b, k, n = args.batch, 262144, 1024
    rng = np.random.default_rng(0)
    x_h = rng.random((b, k), np.float32) - 0.5
    x_h /= np.linalg.norm(x_h, axis=1, keepdims=True)
    w_h = (rng.random((k, n), np.float32) - 0.5) * 0.07
    log("host data generated")
    w_i8_h, s_h = quantize_weight_int8(w_h)
    log("quantized")

    x = jax.device_put(jnp.asarray(x_h, jnp.bfloat16))
    w = jax.device_put(jnp.asarray(w_h, jnp.bfloat16))
    w_i8 = jax.device_put(jnp.asarray(w_i8_h))
    s = jax.device_put(jnp.asarray(s_h))
    jax.block_until_ready((x, w, w_i8, s))
    log("device transfer done")

    mm_bf16 = jax.jit(
        lambda dep, x, w: jnp.matmul(x, w, preferred_element_type=jnp.float32)
        + dep
    )
    t = timeit(lambda dep: mm_bf16(dep, x, w))
    bytes_bf16 = (b * k + k * n) * 2 + b * n * 4
    print(
        f"bf16   [{b},{k}]x[{k},{n}]: {t*1e3:.2f} ms  "
        f"{bytes_bf16/t/1e9:.0f} GB/s eff"
    )

    mm_i8 = jax.jit(lambda dep, x, wq, sq: matmul_wi8(x, wq, sq) + dep)
    ti = timeit(lambda dep: mm_i8(dep, x, w_i8, s))
    bytes_i8 = b * k * 2 + k * n * 1 + b * n * 4
    print(
        f"int8 (XLA convert-dot): {ti*1e3:.2f} ms  "
        f"{bytes_i8/ti/1e9:.0f} GB/s eff  ({t/ti:.2f}x vs bf16)"
    )

    # numeric sanity on-chip
    y_ref = np.asarray(mm_bf16(jnp.zeros((), jnp.float32), x, w))
    y_i8 = np.asarray(matmul_wi8(x, w_i8, s))
    denom = np.maximum(np.abs(y_ref), 1e-3)
    print(
        "max rel err int8 vs bf16-weight:",
        float(np.max(np.abs(y_i8 - y_ref) / denom)),
    )


if __name__ == "__main__":
    main()
