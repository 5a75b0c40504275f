"""Fused NetFV (Net Fisher Vector) kernel — Pallas/Mosaic, TPU.

Second fused aggregation op (ref math: video_pooling_modules.py#NetFV.forward,
documented SURVEY.md §2.2).  Per video, in one VMEM pass:

    a     = softmax(X·C · scale + bias)                [F, K]
    a_sum = Σ_F a                                      [1, K]
    fv1   = Xᵀa                                        [D, K]
    fv2   = (X²)ᵀa                                     [D, K]
    fv2   = (a_sum·C₂² + fv2 − 2·fv1⊙C₂) / σ⁴ − a_sum
    fv1   = (fv1 − a_sum⊙C₂) / σ²
    both: intra-ℓ2 over D, then global ℓ2 of the flattened vector

σ² arrives pre-squared-plus-floor (``covar = covar_weights² + 1e-6``), as in
the flax module.  Outputs two [B, D, K] tensors; the caller's d-major flatten
+ concat matches the reference's [B, 2·D·K] descriptor.

Inference-path kernel (BN folded); training uses models/modules.py#NetFV.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _netfv_kernel(x_ref, c_ref, scale_ref, bias_ref, c2_ref, covar_ref,
                  fv1_ref, fv2_ref):
    x = x_ref[0]  # [F, D]
    logits = (
        jnp.dot(x, c_ref[...], preferred_element_type=jnp.float32) * scale_ref[...]
        + bias_ref[...]
    )
    a = jax.nn.softmax(logits, axis=-1)  # [F, K]
    a_sum = jnp.sum(a, axis=0, keepdims=True)  # [1, K]

    # MXU operands in x's dtype (bf16 in production runs at 4x the fp32 MXU
    # rate; accumulation stays fp32). x*x is exact in bf16 up to rounding of
    # the product — the same rounding the flax path's bf16 einsum makes.
    ax = a.astype(x.dtype)
    contract = (((0,), (0,)), ((), ()))
    fv1 = jax.lax.dot_general(x, ax, contract, preferred_element_type=jnp.float32)
    fv2 = jax.lax.dot_general(x * x, ax, contract, preferred_element_type=jnp.float32)

    c2 = c2_ref[...]
    covar = covar_ref[...]
    fv2 = (a_sum * (c2 * c2) + fv2 - 2.0 * fv1 * c2) / (covar * covar) - a_sum
    fv1 = (fv1 - a_sum * c2) / covar

    def normalize(v):
        col = jnp.sum(v * v, axis=0, keepdims=True)
        v = v * jax.lax.rsqrt(jnp.maximum(col, 1e-12))
        tot = jnp.sum(v * v)
        return v * jax.lax.rsqrt(jnp.maximum(tot, 1e-12))

    fv1_ref[0] = normalize(fv1).astype(fv1_ref.dtype)
    fv2_ref[0] = normalize(fv2).astype(fv2_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def netfv_fused(
    x,                 # [B, F, D]
    cluster_weights,   # [D, K]
    assign_scale,      # [K]
    assign_bias,       # [K]
    cluster_weights2,  # [D, K] (or [1, D, K])
    covar,             # [D, K] pre-squared + floored variance
    *,
    interpret: bool = False,
):
    """Fused NetFV: returns (fv1, fv2), each [B, D, K]."""
    b, f, d = x.shape
    k = cluster_weights.shape[-1]
    c2 = cluster_weights2.reshape(d, k).astype(jnp.float32)
    scale = assign_scale.reshape(1, k).astype(jnp.float32)
    bias = assign_bias.reshape(1, k).astype(jnp.float32)

    fv1, fv2 = pl.pallas_call(
        _netfv_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d, k), x.dtype),
            jax.ShapeDtypeStruct((b, d, k), x.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * 2 * f * d * k * 3,
            bytes_accessed=b * (f * d * 2 + 2 * d * k * 2) + 4 * d * k * 4,
            transcendentals=b * f * k,
        ),
        interpret=interpret,
    )(
        x,
        cluster_weights.astype(x.dtype),
        scale,
        bias,
        c2,
        covar.reshape(d, k).astype(jnp.float32),
    )
    return fv1, fv2


def netfv_reference(x, cluster_weights, assign_scale, assign_bias,
                    cluster_weights2, covar):
    """Pure-jnp twin of :func:`netfv_fused` (parity oracle)."""
    b, f, d = x.shape
    k = cluster_weights.shape[-1]
    xf = x.astype(jnp.float32)
    c2 = cluster_weights2.reshape(1, d, k).astype(jnp.float32)
    cov = covar.reshape(1, d, k).astype(jnp.float32)
    logits = (
        jnp.einsum("bfd,dk->bfk", xf, cluster_weights.astype(jnp.float32))
        * assign_scale.reshape(1, 1, k)
        + assign_bias.reshape(1, 1, k)
    )
    a = jax.nn.softmax(logits, axis=-1)
    a_sum = jnp.sum(a, axis=1, keepdims=True)  # [B, 1, K]
    fv1 = jnp.einsum("bfk,bfd->bdk", a, xf)
    fv2 = jnp.einsum("bfk,bfd->bdk", a, xf * xf)
    fv2 = (a_sum * (c2 * c2) + fv2 - 2.0 * fv1 * c2) / (cov * cov) - a_sum
    fv1 = (fv1 - a_sum * c2) / cov

    def normalize(v):
        col = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=1, keepdims=True), 1e-12))
        v = v / col
        tot = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=(1, 2), keepdims=True), 1e-12))
        return v / tot

    return normalize(fv1).astype(x.dtype), normalize(fv2).astype(x.dtype)
