"""Exact top-k for wide score rows (ref: inference.py#inference top_k /
eval_util.py#top_k_by_class semantics — exact values, ties broken by lower
index, identical to ``jax.lax.top_k``).

``top_k_exact`` is the semantic seam every hot tail calls (fast_infer /
fast_dbof tails, metrics partials, predict step).  It now simply delegates
to ``jax.lax.top_k``: the two-stage grouped split below (local top-k per
128-wide group → narrow reduce) measured 2.6× faster in an ISOLATED
microbench (0.34 ms vs 0.88 ms at B=512, V=3862, k=20), but IN-PROGRAM —
same process, back-to-back jits of the full NetVLAD-256 inference chain —
the plain ``lax.top_k`` tail costs 0.12 ms where the grouped one costs
0.33–0.42 ms.  The isolated 0.88 ms figure was an artifact of measuring the
op behind its own dispatch; the grouped variant was the round-1→round-3
bench decline (80.7k → 77.8k videos/s, BASELINE.md round-4 bisect row).

``top_k_grouped`` is kept (tested bit-exact in tests/unit/test_topk.py) as
the record of that negative result and for shapes where a candidate-pool
split may still pay (V ≫ 10⁴); nothing in the hot paths uses it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GROUP = 128


def top_k_exact(scores: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k with ``jax.lax.top_k`` semantics (values, indices)."""
    values, indices = jax.lax.top_k(scores, k)
    return values, indices


def top_k_grouped(scores: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage grouped top-k — bit-identical to ``lax.top_k`` on 2-D
    inputs, measured SLOWER in-program at YT-8M shapes (module docstring).

    Tie semantics are preserved exactly: stage-1 orders ties by lower index
    within each group, and the candidate array is laid out group-major, so
    the stage-2 stable selection sees candidates in global index order — the
    same "lowest index wins" rule ``lax.top_k`` applies.
    """
    if scores.ndim != 2:
        return jax.lax.top_k(scores, k)
    b, v = scores.shape
    k = min(k, v)
    groups = -(-v // _GROUP)
    # The split only pays off when the candidate pool is much narrower than
    # the row (and stage-1 top-k must fit its group).
    if k > _GROUP or groups * k * 2 >= v:
        return jax.lax.top_k(scores, k)

    pad = groups * _GROUP - v
    padded = jnp.pad(
        scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
    ).reshape(b, groups, _GROUP)
    local_vals, local_idx = jax.lax.top_k(padded, k)        # [B, G, k]
    base = (jnp.arange(groups, dtype=local_idx.dtype) * _GROUP)[None, :, None]
    cand_vals = local_vals.reshape(b, groups * k)
    cand_idx = (local_idx + base).reshape(b, groups * k)
    values, pick = jax.lax.top_k(cand_vals, k)
    indices = jnp.take_along_axis(cand_idx, pick, axis=1)
    return values, indices
