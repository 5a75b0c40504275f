"""Custom-VJP fused NetVLAD aggregation for TRAINING.

The training hot spot of the Willow model is the aggregation block between
the (BN'd) assignment logits and the flat descriptor:

    A   = softmax(L)            [B, F, K]
    S   = Σ_F A                 [B, 1, K]          (a_sum)
    V₁  = XᵀA − S⊙C₂            [B, D, K]
    V₂  = V₁ / ‖V₁‖_col         (intra-norm over D, per cluster)
    V₃  = V₂ / ‖V₂‖_F           (global ℓ2)

Under autodiff, XLA materializes several [B, D, K] fp32 intermediates in HBM
for the backward.  This op fuses forward AND backward into Pallas kernels
with flash-attention-style recompute: residuals are only (X, L); the
backward kernel recomputes A and V in VMEM and emits (dX, dL, dC₂).

Backward math (per video, derived from the chain above):

    g      = ‖V₂‖_F ;  c_k = ‖V₁‖_col
    dV₂    = (dV₃ − V₃ · Σ(V₃⊙dV₃)) / g            (global-norm VJP)
    dV₁    = (dV₂ − V₂ · Σ_D(V₂⊙dV₂)_col) / c      (column-norm VJP)
    dC₂   += −Σ_B dV₁ ⊙ S                          (accumulated over batch)
    dS_k   = −Σ_D dV₁[:,k] ⊙ C₂[:,k]
    dA     = X·dV₁  + dS (broadcast over F)        [F, K]
    dL     = A ⊙ (dA − Σ_K(A⊙dA) per row)          (softmax VJP)
    dX     = A·dV₁ᵀ                                [F, D]

Gradients w.r.t. the upstream BN/cluster weights flow through dL and dX via
the surrounding jnp graph, so BN's cross-batch statistics stay in XLA where
they belong.  Parity: tests/unit/test_netvlad_train.py checks value AND all
gradients against the jnp composition in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _fwd_kernel(x_ref, l_ref, c2_ref, out_ref):
    x = x_ref[0]                      # [F, D] (bf16 or f32)
    logits = l_ref[0]                 # [F, K] f32
    a = jax.nn.softmax(logits, axis=-1)
    s = jnp.sum(a, axis=0, keepdims=True)          # [1, K]
    # MXU operands in x's dtype (bf16 in production — fp32-operand dots run
    # the MXU at 1/4 rate and made this kernel the training hot spot; fp32
    # ACCUMULATION is kept either way, matching the unfused einsum's
    # preferred_element_type and the flax path's bf16 operands)
    v1 = jax.lax.dot_general(
        x, a.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) - s * c2_ref[...]
    col = jnp.sum(v1 * v1, axis=0, keepdims=True)
    v2 = v1 * jax.lax.rsqrt(jnp.maximum(col, _EPS))
    tot = jnp.sum(v2 * v2)
    out_ref[0] = (v2 * jax.lax.rsqrt(jnp.maximum(tot, _EPS))).astype(out_ref.dtype)


def _bwd_kernel(x_ref, l_ref, c2_ref, dv3_ref, dx_ref, dl_ref, dc2_ref):
    x = x_ref[0]                      # [F, D] — keep native dtype: all uses
    #                                   are MXU dots (bf16 runs 4x fp32 rate)
    logits = l_ref[0]                 # [F, K]
    c2 = c2_ref[...]                  # [D, K]
    dv3 = dv3_ref[0].astype(jnp.float32)  # [D, K]

    # --- recompute forward in VMEM ---
    a = jax.nn.softmax(logits, axis=-1)            # [F, K]
    s = jnp.sum(a, axis=0, keepdims=True)          # [1, K]
    v1 = jax.lax.dot_general(
        x, a.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) - s * c2
    col = jnp.maximum(jnp.sum(v1 * v1, axis=0, keepdims=True), _EPS)
    inv_c = jax.lax.rsqrt(col)
    v2 = v1 * inv_c
    tot = jnp.maximum(jnp.sum(v2 * v2), _EPS)
    inv_g = jax.lax.rsqrt(tot)
    v3 = v2 * inv_g

    # --- normalization VJPs ---
    dv2 = (dv3 - v3 * jnp.sum(v3 * dv3)) * inv_g
    dv1 = (dv2 - v2 * jnp.sum(v2 * dv2, axis=0, keepdims=True)) * inv_c

    # --- aggregation VJPs ---
    # accumulate dC2 over the batch grid (output block constant)
    @pl.when(pl.program_id(0) == 0)
    def _():
        dc2_ref[...] = jnp.zeros_like(dc2_ref)

    dc2_ref[...] += -dv1 * s

    ds = -jnp.sum(dv1 * c2, axis=0, keepdims=True)  # [1, K]
    dv1_c = dv1.astype(x.dtype)  # one rounding (~2^-9 rel) on the cotangent
    da = jnp.dot(x, dv1_c, preferred_element_type=jnp.float32) + ds  # [F, K]
    dl = a * (da - jnp.sum(a * da, axis=-1, keepdims=True))        # softmax VJP
    dx = jax.lax.dot_general(
        a.astype(x.dtype), dv1_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [F, D] = A · dV₁ᵀ

    dx_ref[0] = dx.astype(dx_ref.dtype)
    dl_ref[0] = dl.astype(dl_ref.dtype)


def _forward_impl(x, a_logits, c2, interpret):
    b, f, d = x.shape
    k = a_logits.shape[-1]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        # descriptor in x's dtype: the caller casts to compute dtype right
        # after anyway (modules.py#NetVLAD), so emitting bf16 here halves the
        # kernel's output write AND removes that 400 MB XLA cast pass — with
        # bit-identical end-to-end values (same rounding point)
        out_shape=jax.ShapeDtypeStruct((b, d, k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * 2 * f * d * k,
            bytes_accessed=b * (f * d * 2 + f * k * 4 + d * k * 4),
            transcendentals=b * f * k,
        ),
        interpret=interpret,
    )(x, a_logits.astype(jnp.float32), c2.astype(jnp.float32))


def _backward_impl(x, a_logits, c2, dv3, interpret):
    b, f, d = x.shape
    k = a_logits.shape[-1]
    dx, dl, dc2 = pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, f, d), x.dtype),
            jax.ShapeDtypeStruct((b, f, k), jnp.float32),
            jax.ShapeDtypeStruct((d, k), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * 2 * f * d * k * 3,
            bytes_accessed=b * (f * d * 4 + f * k * 8 + d * k * 8),
            transcendentals=b * f * k,
        ),
        interpret=interpret,
    )(x, a_logits.astype(jnp.float32), c2.astype(jnp.float32), dv3)
    return dx, dl, dc2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def netvlad_aggregate(x, a_logits, c2, interpret=False):
    """Fused softmax→aggregate→normalize with a hand-written backward.

    x [B,F,D] frames; a_logits [B,F,K] post-BN assignment logits;
    c2 [D,K] cluster centers.  Returns normalized vlad [B, D, K] in x's
    dtype (bf16 in production — the caller casts to compute dtype right
    after, so emitting bf16 moves that rounding into the kernel and halves
    the descriptor's HBM traffic; fp32 in the fp32-input parity tests).
    """
    return _forward_impl(x, a_logits, c2, interpret)


def _vjp_fwd(x, a_logits, c2, interpret):
    out = _forward_impl(x, a_logits, c2, interpret)
    return out, (x, a_logits, c2)


def _vjp_bwd(interpret, residuals, dv3):
    x, a_logits, c2 = residuals
    # dv3 stays in its native (typically bf16) dtype — the kernel upcasts in
    # VMEM, so the cotangent crosses HBM at half width
    dx, dl, dc2 = _backward_impl(x, a_logits, c2, dv3, interpret)
    return dx, dl, dc2


netvlad_aggregate.defvjp(_vjp_fwd, _vjp_bwd)


def netvlad_aggregate_reference(x, a_logits, c2):
    """jnp twin (differentiable) — the parity oracle for value AND grads."""
    a = jax.nn.softmax(a_logits.astype(jnp.float32), axis=-1)
    s = jnp.sum(a, axis=1, keepdims=True)                     # [B, 1, K]
    v1 = jnp.einsum("bfk,bfd->bdk", a, x.astype(jnp.float32))
    v1 = v1 - s * c2.astype(jnp.float32)[None]
    col = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, axis=1, keepdims=True), _EPS))
    v2 = v1 / col
    tot = jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, axis=(1, 2), keepdims=True), _EPS))
    return v2 / tot
