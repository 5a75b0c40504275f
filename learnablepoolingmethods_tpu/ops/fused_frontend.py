"""Fully-fused inference front-end: uint8 frames → both NetVLAD descriptors.

One Pallas kernel per video performs, entirely in VMEM:

    1. uint8 → float dequantize (scalar affine, utils.py#Dequantize constants)
    2. per-frame ℓ2 normalization over the full 1152-d vector
       (ref: train.py#build_graph l2_normalize — the norm couples rgb+audio,
       which is why this kernel consumes the unsplit feature tensor)
    3. folded input BatchNorm (per-channel affine)
    4. frame sampling-with-replacement as a ONE-HOT MATMUL on the MXU:
       X_s = P·X with P[s, f] = 1{idx[s] = f}.  An HBM row-gather costs
       ~6 ms/512 videos through XLA's gather; the [S,F]×[F,D] matmul costs
       ~0.2 GFLOP/video of essentially-free MXU time and keeps everything
       resident in VMEM.
    5. NetVLAD for the rgb slice (K) and the audio slice (K/2): assignment
       softmax (folded BN), residual aggregation, intra-ℓ2 + global ℓ2
       (math identical to ops/netvlad_pallas.py).

HBM traffic per video: 0.35 MB uint8 in, 0.55 MB bf16 descriptors out — the
fp32 [B,D,K] residual tensors never exist in HBM.

Inference-path kernel; sampled indices are computed by the caller
(``sample_indices``) so the PRNG matches the unfused path exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEQ_SCALE = 4.0 / 255.0
DEQ_BIAS = 4.0 / 512.0 - 2.0


def sample_indices(rng, num_frames, max_frames: int, num_samples: int):
    """floor(U·num_frames) sampling indices — same distribution as
    model_utils.sample_random_frames (ref: model_utils.py#SampleRandomFrames)."""
    b = num_frames.shape[0]
    nf = jnp.minimum(jnp.asarray(num_frames, jnp.int32), max_frames)
    u = jax.random.uniform(rng, (b, num_samples), dtype=jnp.float32)
    return jnp.minimum((u * nf[:, None].astype(jnp.float32)).astype(jnp.int32),
                       max_frames - 1)


def _make_kernel(d_rgb: int, k_rgb: int, d_aud: int, k_aud: int):
    def kernel(*refs):
        x_ref = refs[0]
        rest = refs[1:]
        (
            idx_ref,      # [1, 1, S] int32
            in_scale_ref,  # [1, DT] f32 folded input-BN scale
            in_bias_ref,   # [1, DT] f32 folded input-BN bias
            c_rgb_ref,    # [d_rgb, k_rgb] bf16
            s_rgb_ref,    # [1, k_rgb] f32
            b_rgb_ref,    # [1, k_rgb] f32
            c2_rgb_ref,   # [d_rgb, k_rgb] f32
            c_aud_ref,    # [d_aud, k_aud] bf16
            s_aud_ref,    # [1, k_aud] f32
            b_aud_ref,    # [1, k_aud] f32
            c2_aud_ref,   # [d_aud, k_aud] f32
            out_rgb_ref,  # [1, d_rgb, k_rgb] bf16
            out_aud_ref,  # [1, d_aud, k_aud] bf16
        ) = rest
        f, dt = x_ref.shape[1], x_ref.shape[2]
        s = idx_ref.shape[-1]

        def pipeline_block(s0, sz):
            """dequant + per-frame ℓ2 + folded BN + one-hot matmul for frame
            rows [s0, s0+sz).  (A num_frames-guarded per-128-row-block skip
            variant measured SLOWER on-chip — lax.cond region overhead beats
            the ≤2 skippable blocks at F=300; BASELINE.md round-3 row.)"""
            xq = x_ref[0, s0 : s0 + sz, :]  # [sz, DT] uint8
            # (Mosaic has no direct uint8→f32 cast; hop through int32)
            xf = xq.astype(jnp.int32).astype(jnp.float32) * DEQ_SCALE + DEQ_BIAS
            row_sq = jnp.sum(xf * xf, axis=1, keepdims=True)
            xf = xf * jax.lax.rsqrt(jnp.maximum(row_sq, 1e-12))
            xf = xf * in_scale_ref[...] + in_bias_ref[...]
            xb = xf.astype(jnp.bfloat16)
            # sampling as a one-hot matmul: P [S, sz] @ X [sz, DT]
            frame_ids = (
                jax.lax.broadcasted_iota(jnp.int32, (s, sz), 1) + s0
            )
            p = (frame_ids == idx_ref[0, 0][:, None]).astype(jnp.bfloat16)
            return jnp.dot(p, xb, preferred_element_type=jnp.float32)

        xs = pipeline_block(0, f).astype(
            jnp.bfloat16
        )  # [S, DT] (MXU accumulators are 32-bit)

        def netvlad(x_mod, c_ref, sc_ref, bi_ref, c2_ref, out_ref):
            logits = (
                jnp.dot(x_mod, c_ref[...], preferred_element_type=jnp.float32)
                * sc_ref[...]
                + bi_ref[...]
            )
            a = jax.nn.softmax(logits, axis=-1)  # [S, K]
            a_sum = jnp.sum(a, axis=0, keepdims=True)
            vlad = jax.lax.dot_general(
                x_mod.astype(jnp.float32), a,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [D, K]
            vlad = vlad - a_sum * c2_ref[...]
            col = jnp.sum(vlad * vlad, axis=0, keepdims=True)
            vlad = vlad * jax.lax.rsqrt(jnp.maximum(col, 1e-12))
            tot = jnp.sum(vlad * vlad)
            out_ref[0] = (vlad * jax.lax.rsqrt(jnp.maximum(tot, 1e-12))).astype(
                out_ref.dtype
            )

        netvlad(xs[:, :d_rgb], c_rgb_ref, s_rgb_ref, b_rgb_ref, c2_rgb_ref, out_rgb_ref)
        netvlad(xs[:, d_rgb:], c_aud_ref, s_aud_ref, b_aud_ref, c2_aud_ref, out_aud_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def netvlad_frontend_fused(
    x_u8,       # [B, F, DT] uint8
    idx,        # [B, S] int32 sampled frame indices
    in_scale,   # [DT] folded input-BN scale
    in_bias,    # [DT] folded input-BN bias
    c_rgb, s_rgb, b_rgb, c2_rgb,   # rgb NetVLAD consts
    c_aud, s_aud, b_aud, c2_aud,   # audio NetVLAD consts
    *,
    interpret: bool = False,
):
    """Returns (vlad_rgb [B, d_rgb, k_rgb], vlad_aud [B, d_aud, k_aud]) bf16."""
    b, f, dt = x_u8.shape
    s = idx.shape[1]
    d_rgb, k_rgb = c_rgb.shape
    d_aud, k_aud = c_aud.shape
    assert d_rgb + d_aud == dt, (d_rgb, d_aud, dt)

    kernel = _make_kernel(d_rgb, k_rgb, d_aud, k_aud)
    row = lambda a: a.reshape(1, -1).astype(jnp.float32)

    out_rgb, out_aud = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, dt), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dt), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dt), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_rgb, k_rgb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_rgb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_rgb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_rgb, k_rgb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_aud, k_aud), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_aud), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_aud), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_aud, k_aud), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d_rgb, k_rgb), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_aud, k_aud), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d_rgb, k_rgb), jnp.bfloat16),
            jax.ShapeDtypeStruct((b, d_aud, k_aud), jnp.bfloat16),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * 2 * s * (f * dt + d_rgb * k_rgb * 2 + d_aud * k_aud * 2),
            bytes_accessed=b * (f * dt + (d_rgb * k_rgb + d_aud * k_aud) * 2),
            transcendentals=b * s * (k_rgb + k_aud),
        ),
        interpret=interpret,
    )(
        x_u8,
        idx.reshape(b, 1, s),
        row(in_scale),
        row(in_bias),
        c_rgb.astype(jnp.bfloat16),
        row(s_rgb),
        row(b_rgb),
        c2_rgb.astype(jnp.float32),
        c_aud.astype(jnp.bfloat16),
        row(s_aud),
        row(b_aud),
        c2_aud.astype(jnp.float32),
    )
    return out_rgb, out_aud


def netvlad_frontend_reference(
    x_u8, idx, in_scale, in_bias,
    c_rgb, s_rgb, b_rgb, c2_rgb,
    c_aud, s_aud, b_aud, c2_aud,
):
    """jnp twin (gather-based) of the fused front-end — the parity oracle."""
    from learnablepoolingmethods_tpu.ops.netvlad_pallas import netvlad_reference
    from learnablepoolingmethods_tpu.ops.normalize import l2_normalize

    d_rgb = c_rgb.shape[0]
    xf = x_u8.astype(jnp.float32) * DEQ_SCALE + DEQ_BIAS
    xf = l2_normalize(xf, axis=-1)
    xf = xf * in_scale.reshape(1, 1, -1) + in_bias.reshape(1, 1, -1)
    xs = jnp.take_along_axis(xf, idx[:, :, None], axis=1)
    xs = xs.astype(jnp.bfloat16)
    vlad_rgb = netvlad_reference(xs[:, :, :d_rgb], c_rgb, s_rgb, b_rgb, c2_rgb)
    vlad_aud = netvlad_reference(xs[:, :, d_rgb:], c_aud, s_aud, b_aud, c2_aud)
    return vlad_rgb, vlad_aud
