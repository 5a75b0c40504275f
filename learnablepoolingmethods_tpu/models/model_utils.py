"""Frame sampling and pooling helpers (ref: model_utils.py).

All functions are shape-static and jit-safe: sampling produces a fixed
``num_samples``-length frame axis via gather, never a dynamic shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_random_frames(model_input, num_frames, num_samples: int, rng):
    """Uniform-with-replacement frame sampling (ref: model_utils.py#SampleRandomFrames).

    frame_index = floor(U[0,1) * num_frames) per sample — identical index
    distribution to the reference.

    Args:
      model_input: [B, F, D] frame features.
      num_frames: [B] valid-frame counts (int).
      num_samples: static sample count (--iterations).
      rng: PRNG key.
    Returns: [B, num_samples, D]
    """
    batch_size = model_input.shape[0]
    f = model_input.shape[1]
    u = jax.random.uniform(rng, (batch_size, num_samples), dtype=jnp.float32)
    # clamp counts to the padded length BEFORE the multiply so the index
    # distribution stays uniform over [0, F) when num_frames > F — the same
    # clamp sample_frame_features applies (the two samplers share a
    # distribution by contract).
    nf = jnp.minimum(jnp.asarray(num_frames, jnp.int32), f)
    nf = nf.astype(jnp.float32).reshape(batch_size, 1)
    frame_index = (u * nf).astype(jnp.int32)
    # guard: num_frames may legally equal the padded length; keep in-bounds.
    frame_index = jnp.minimum(frame_index, f - 1)
    # one-hot matmul instead of take_along_axis: XLA's HBM row-gather is the
    # slowest op in the step at scale (19.9 ms on [2048,300,1152] uint8 —
    # float rows are wider still); the MXU permutation is EXACT for floats
    # (each output sums exactly one 1.0·v product) PROVIDED the operands are
    # not truncated first: the TPU default matmul precision rounds f32
    # operands to bf16, so f32 inputs need Precision.HIGHEST to keep the
    # selected rows bit-exact.  bf16/int operands are exact at any precision.
    precision = (
        jax.lax.Precision.HIGHEST
        if model_input.dtype == jnp.float32
        else None
    )
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (batch_size, num_samples, f), 2)
        == frame_index[:, :, None]
    ).astype(model_input.dtype)
    picked = jax.lax.dot_general(
        onehot, model_input, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return picked.astype(model_input.dtype)


def gather_frames_u8(features, frame_index):
    """Exact uint8 frame gather as a batched int8 one-hot matmul.

    XLA's HBM row-gather is slow on TPU (measured 19.9 ms for
    ``take_along_axis`` on [2048, 300, 1152] uint8); the MXU does the same
    permutation as ``P_i8 · (x−128)_i8 → int32 (+128)`` in 8.1 ms.  Exact:
    the one-hot rows select single entries and int8×int8→int32 arithmetic
    is integer-exact (the uint8 range is re-centered through the signed
    domain and shifted back).

    features [B, F, D] uint8; frame_index [B, S] int32 → [B, S, D] uint8.
    """
    b, f, _ = features.shape
    s = frame_index.shape[1]
    frame_ids = jax.lax.broadcasted_iota(jnp.int32, (b, s, f), 2)
    onehot = (frame_ids == frame_index[:, :, None]).astype(jnp.int8)
    centered = jax.lax.bitcast_convert_type(
        features ^ jnp.uint8(0x80), jnp.int8
    )
    picked = jax.lax.dot_general(
        onehot, centered, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    return (picked + 128).astype(jnp.uint8)


def sample_frame_features(features, num_frames, num_samples: int, rng):
    """floor(U·num_frames) iid frame sampling applied to a raw feature
    tensor, choosing the fast uint8 one-hot-matmul gather when possible.

    The single implementation behind the train step's ``--presample_frames``
    path and every fast-inference sampler (core/step.py, ops/fast_infer.py,
    ops/fast_dbof.py, ops/fast_lf.py) — same index distribution as
    :func:`sample_random_frames`.
    """
    b, f = features.shape[0], features.shape[1]
    nf = jnp.minimum(jnp.asarray(num_frames, jnp.int32), f)
    u = jax.random.uniform(rng, (b, num_samples), dtype=jnp.float32)
    idx = jnp.minimum(
        (u * nf[:, None].astype(jnp.float32)).astype(jnp.int32), f - 1
    )
    if features.dtype == jnp.uint8:
        return gather_frames_u8(features, idx)
    return jnp.take_along_axis(features, idx[:, :, None], axis=1)


def sample_random_sequence(model_input, num_frames, num_samples: int, rng):
    """Random contiguous window (ref: model_utils.py#SampleRandomSequence)."""
    batch_size = model_input.shape[0]
    offset = jnp.arange(num_samples, dtype=jnp.int32)[None, :]
    nf = jnp.asarray(num_frames, jnp.int32).reshape(batch_size, 1)
    max_start = jnp.maximum(nf - num_samples, 0)
    u = jax.random.uniform(rng, (batch_size, 1), dtype=jnp.float32)
    start = (u * (max_start.astype(jnp.float32) + 1.0)).astype(jnp.int32)
    frame_index = jnp.minimum(start + offset, nf - 1)
    frame_index = jnp.clip(frame_index, 0, model_input.shape[1] - 1)
    return jnp.take_along_axis(model_input, frame_index[:, :, None], axis=1)


def frame_pooling(frames, method: str):
    """Pool over the frame axis (ref: model_utils.py#FramePooling).

    frames: [B, F, D]; method in {"average", "max"}.
    """
    if method == "average":
        return jnp.mean(frames, axis=1)
    if method == "max":
        return jnp.max(frames, axis=1)
    raise ValueError(f"Unrecognized pooling method: {method}")


def frame_mask(num_frames, max_frames: int, dtype=jnp.float32):
    """[B, F] validity mask from per-video frame counts."""
    positions = jnp.arange(max_frames)[None, :]
    return (positions < jnp.asarray(num_frames).reshape(-1, 1)).astype(dtype)
