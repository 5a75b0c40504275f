"""Fused NetVLAD aggregation kernel (Pallas / Mosaic, TPU).

The hot op of the flagship model (SURVEY.md §3.5 "PALLAS FUSION TARGET #1"):

    logits = X·C · scale + bias          [F, K]   (BN affine folded)
    A      = softmax(logits)             [F, K]
    a_sum  = Σ_F A                       [1, K]
    vlad   = XᵀA − a_sum ⊙ C₂            [D, K]
    vlad   = intra-ℓ2(vlad, axis=D)
    vlad   = vlad / ‖vlad‖_F             (global ℓ2 of the flattened vector)

One grid program per video computes the whole chain in VMEM — the fp32
[B, D, K] residual tensor that XLA materializes in HBM (512 MB at B=512)
never leaves the chip's VMEM here.  Output is [B, D, K] bf16; the caller's
``reshape(B, D·K)`` is a free bitcast and matches the reference's
d-major flatten (index d·K + k).

Inference-path kernel: BN runs in folded (inference) affine form.  Training
uses the jnp module (models/modules.py#NetVLAD) — autodiff + batch stats.
Parity: tests/unit/test_netvlad_pallas.py checks kernel ≡ jnp reference to
fp32 tolerance on CPU (interpret mode) and the module path on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _netvlad_kernel(x_ref, c_ref, scale_ref, bias_ref, c2_ref, out_ref):
    """One video: x [F, D] bf16 → out [D, K] bf16."""
    x = x_ref[0]  # [F, D] (block has a leading size-1 batch dim)
    c = c_ref[...]  # [D, K]

    logits = (
        jnp.dot(x, c, preferred_element_type=jnp.float32) * scale_ref[...]
        + bias_ref[...]
    )  # [F, K] f32
    a = jax.nn.softmax(logits, axis=-1)  # [F, K]

    a_sum = jnp.sum(a, axis=0, keepdims=True)  # [1, K]

    # vlad[d, k] = Σ_f x[f, d]·a[f, k]  — contract over F on the MXU
    vlad = jax.lax.dot_general(
        x.astype(jnp.float32),
        a,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [D, K]
    vlad = vlad - a_sum * c2_ref[...]

    # intra-normalize per cluster (over D), then global ℓ2
    col_sq = jnp.sum(vlad * vlad, axis=0, keepdims=True)  # [1, K]
    vlad = vlad * jax.lax.rsqrt(jnp.maximum(col_sq, 1e-12))
    tot_sq = jnp.sum(vlad * vlad)
    vlad = vlad * jax.lax.rsqrt(jnp.maximum(tot_sq, 1e-12))

    out_ref[0] = vlad.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def netvlad_fused(
    x: jnp.ndarray,          # [B, F, D] (bf16 recommended)
    cluster_weights,         # [D, K]
    assign_scale,            # [K] folded BN γ/σ (or ones)
    assign_bias,             # [K] folded BN β−μγ/σ (or cluster biases)
    cluster_weights2,        # [D, K]  (reference keeps [1, D, K]; squeeze)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused NetVLAD: returns [B, D, K]; reshape to [B, D·K] is free."""
    b, f, d = x.shape
    k = cluster_weights.shape[-1]
    c2 = cluster_weights2.reshape(d, k)

    scale = assign_scale.reshape(1, k).astype(jnp.float32)
    bias = assign_bias.reshape(1, k).astype(jnp.float32)

    flops_per = 2 * f * d * k * 2  # assignment + aggregation matmuls
    out = pl.pallas_call(
        _netvlad_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, d, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per,
            bytes_accessed=b * (f * d * 2 + d * k * 2) + 2 * d * k * 4,
            transcendentals=b * f * k,
        ),
        interpret=interpret,
    )(
        x,
        cluster_weights.astype(x.dtype),
        scale,
        bias,
        c2.astype(jnp.float32),
    )
    return out


def netvlad_reference(
    x, cluster_weights, assign_scale, assign_bias, cluster_weights2
):
    """Pure-jnp twin of :func:`netvlad_fused` (the parity oracle)."""
    b, f, d = x.shape
    k = cluster_weights.shape[-1]
    logits = (
        jnp.einsum(
            "bfd,dk->bfk", x.astype(jnp.float32), cluster_weights.astype(jnp.float32)
        )
        * assign_scale.reshape(1, 1, k)
        + assign_bias.reshape(1, 1, k)
    )
    a = jax.nn.softmax(logits, axis=-1)
    a_sum = jnp.sum(a, axis=1, keepdims=True)  # [B,1,K]
    vlad = jnp.einsum("bfk,bfd->bdk", a, x.astype(jnp.float32))
    vlad = vlad - a_sum * cluster_weights2.reshape(1, d, k)
    col = jnp.sqrt(jnp.maximum(jnp.sum(vlad**2, axis=1, keepdims=True), 1e-12))
    vlad = vlad / col
    tot = jnp.sqrt(
        jnp.maximum(jnp.sum(vlad**2, axis=(1, 2), keepdims=True), 1e-12)
    )
    vlad = vlad / tot
    return vlad.astype(x.dtype)


def fold_assignment_bn(gamma, beta, mean, var, epsilon: float = 1e-3):
    """Inference-mode BN affine for the assignment logits:
    scale = γ/√(σ²+ε);  bias = β − μ·scale."""
    scale = gamma / jnp.sqrt(var + epsilon)
    bias = beta - mean * scale
    return scale, bias
