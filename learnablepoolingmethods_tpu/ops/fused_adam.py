"""Fused Adam with stochastically-rounded bf16 state — the HBM-floor update.

The reference applies Adam through TF's fused training ops
(ref: train.py#build_graph optimizer.apply_gradients); the rebuild's optax
chain (clip → adam → fp32-master) is HBM-bound at ~20 bytes/param/step —
measured 12.9 ms for the Willow model's 307M params on the v5e.  This
implementation holds the update to the memory floor of its operands

    read  g + p + m + ν  (all bf16)   8 B/param
    write p + m + ν                   6 B/param

plus one fused gradient-norm read for the per-leaf clip
(ref: utils.py#clip_gradient_norms) — measured **9.7 ms**, 1.33× optax.
It is pure XLA: the whole chain is one multi-output elementwise fusion (a
hand-written Pallas kernel was measured SLOWER — 15.7 ms — because Mosaic
would not overlap the tile DMAs with the VPU math the way XLA's fusion
does), so it works on CPU, under GSPMD sharding (model-axis-sharded params
shard the update with zero extra code), and in every test harness.

Two precision moves make the bf16 state safe:

- **Params** are stored bf16 and written with *stochastic rounding* — the
  rounding error is zero-mean, which is the role the fp32 master copy
  played, without its 8 B/param of traffic.  fp32 param leaves are updated
  exactly (no rounding at all), so ``param_dtype=float32`` degenerates to
  textbook Adam.
- **Second moment ν** in bf16 with deterministic rounding is numerically
  broken at β₂ = 0.999: the (1−β₂)·g² increment falls below one bf16 ulp of
  ν near steady state and the EMA stalls (the round-1 finding that forced
  fp32 ν).  With stochastic rounding E[ν] follows the exact EMA: SR-ν tracks it to
  <1% where deterministic bf16 ν drifts >5% within 300 constant-gradient
  steps (stalling or overshooting depending on which sub-ulp term rounds
  away) — tests/unit/test_fused_adam.py, cross-checked on the real chip.

Stochastic rounding is implemented directly on the float bit pattern: add a
uniform 16-bit dither below the bf16 mantissa, truncate.  Unbiased across
binade boundaries (the f32 lattice is uniform within each bf16 interval)
and exact-preserving (values already representable in bf16 never move).
Dither bits come from the ``rbg`` PRNG (XLA's RngBitGenerator), which XLA
fuses into the elementwise consumer — the bits never exist in HBM.

Determinism: bits are keyed by (seed, step, leaf-index), so data-parallel
replicas compute identical updates and stay in sync.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class FusedAdamState(NamedTuple):
    count: jnp.ndarray   # int32 step counter
    m: Any               # first moment: bf16 for bf16 params, else fp32
    nu: Any              # second moment: bf16 (stochastically rounded) / fp32


_BF16_MAX = float(jnp.finfo(jnp.bfloat16).max)  # 3.3895e38, bits 0x7F7F0000


def stochastic_round_bf16(x32: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """Unbiased f32 → bf16 rounding: add a uniform dither in [0, 2^16) to the
    bit pattern, truncate the low 16 bits.  ``bits`` is uint32; only its low
    16 bits are used.

    The bit-pattern add is only valid for finite values below bf16_max:
    dithering inside the top binade can carry into the inf exponent, and
    dithering an inf/nan pattern produces garbage bits.  Those inputs take
    the deterministic ``astype`` path instead (inf stays inf, nan stays nan,
    near-max saturates by round-to-nearest) — they are outside the SR
    lattice anyway, so no bias is introduced.
    """
    x32 = x32.astype(jnp.float32)
    u = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    u = (u + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    dithered = jax.lax.bitcast_convert_type(u, jnp.float32).astype(jnp.bfloat16)
    safe = jnp.isfinite(x32) & (jnp.abs(x32) < jnp.float32(_BF16_MAX))
    return jnp.where(safe, dithered, x32.astype(jnp.bfloat16))


class FusedAdam:
    """Adam + per-leaf norm clip at the bf16 traffic floor.

    Not an optax transformation on purpose: optax's (updates, apply) split
    would force an extra delta tree through HBM.  ``TrainState`` detects the
    ``fused_apply`` method and calls it directly.
    """

    def __init__(self, lr_schedule, b1=0.9, b2=0.999, eps=1e-8,
                 clip_norm=None, stochastic=True, seed=0):
        self.lr_schedule = lr_schedule
        self.b1, self.b2, self.eps = float(b1), float(b2), float(eps)
        self.clip_norm = clip_norm
        self.stochastic = stochastic
        self.seed = int(seed)

    @staticmethod
    def _state_dtype(p):
        return jnp.bfloat16 if p.dtype == jnp.bfloat16 else jnp.float32

    def init(self, params):
        moment = lambda p: jnp.zeros(p.shape, self._state_dtype(p))
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(moment, params),
            nu=jax.tree.map(moment, params),
        )

    def fused_apply(self, grads, state, params):
        t = state.count + 1
        tf = t.astype(jnp.float32)
        lr = jnp.asarray(self.lr_schedule(state.count), jnp.float32)
        c1 = 1.0 / (1.0 - jnp.float32(self.b1) ** tf)
        c2 = 1.0 / (1.0 - jnp.float32(self.b2) ** tf)
        base_key = jax.random.fold_in(
            jax.random.key(self.seed, impl="rbg"), state.count
        )

        g_leaves, treedef = jax.tree_util.tree_flatten(grads)
        p_leaves = treedef.flatten_up_to(params)
        m_leaves = treedef.flatten_up_to(state.m)
        v_leaves = treedef.flatten_up_to(state.nu)

        new_p, new_m, new_v = [], [], []
        for i, (g, p, m, v) in enumerate(
            zip(g_leaves, p_leaves, m_leaves, v_leaves)
        ):
            g32 = g.astype(jnp.float32)
            if self.clip_norm is not None and self.clip_norm > 0:
                norm = jnp.sqrt(jnp.sum(jnp.square(g32)))
                g32 = g32 * jnp.minimum(
                    1.0, self.clip_norm / jnp.maximum(norm, 1e-20)
                )
            m32 = self.b1 * m.astype(jnp.float32) + (1 - self.b1) * g32
            v32 = self.b2 * v.astype(jnp.float32) + (1 - self.b2) * g32 * g32
            p32 = p.astype(jnp.float32) - lr * (m32 * c1) / (
                jnp.sqrt(v32 * c2) + self.eps
            )
            if p.dtype == jnp.bfloat16 and self.stochastic:
                bits = jax.random.bits(
                    jax.random.fold_in(base_key, i), shape=p.shape,
                    dtype=jnp.uint32,
                )
                new_p.append(stochastic_round_bf16(p32, bits))
                new_m.append(m32.astype(jnp.bfloat16))
                new_v.append(stochastic_round_bf16(v32, bits >> jnp.uint32(16)))
            else:
                sd = self._state_dtype(p)
                new_p.append(p32.astype(p.dtype))
                new_m.append(m32.astype(sd))
                new_v.append(v32.astype(sd))

        unflatten = jax.tree_util.tree_unflatten
        return unflatten(treedef, new_p), FusedAdamState(
            count=t,
            m=unflatten(treedef, new_m),
            nu=unflatten(treedef, new_v),
        )


def adam_reference_step(g, p, m, v, lr, t, b1=0.9, b2=0.999, eps=1e-8,
                        clip_norm=None):
    """fp32 jnp twin of one leaf update — the parity oracle (bias corrections
    in f32, matching fused_apply's scalar path)."""
    scale = 1.0
    if clip_norm is not None and clip_norm > 0:
        norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
        scale = jnp.minimum(1.0, clip_norm / jnp.maximum(norm, 1e-20))
    g32 = g.astype(jnp.float32) * scale
    b1 = jnp.float32(b1)
    b2 = jnp.float32(b2)
    m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
    v32 = b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32
    c1 = 1.0 / (1.0 - b1 ** jnp.float32(t))
    c2 = 1.0 / (1.0 - b2 ** jnp.float32(t))
    p32 = p.astype(jnp.float32) - jnp.float32(lr) * (m32 * c1) / (
        jnp.sqrt(v32 * c2) + jnp.float32(eps)
    )
    return p32, m32, v32
