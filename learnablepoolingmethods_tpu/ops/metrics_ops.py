"""On-device evaluation partials (SURVEY.md L6/§5.5).

The reference computes every metric in host NumPy per batch
(ref: eval_util.py#EvaluationMetrics.accumulate) — a D2H + Python bottleneck.
Here the per-batch heavy lifting (top-k selection, Hit@1, PERR row stats)
runs inside jit on the TPU; the host only pools tiny [B, k] arrays and
finalizes once per epoch (metrics/eval_util.py#StreamingGAP).

Under a data mesh these ops run sharded — each chip reduces its shard and the
host concatenates per-shard partials (batch-axis concat ≡ reference's global
accumulate).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from learnablepoolingmethods_tpu.ops.topk import top_k_exact


# PERR is exact as long as no video carries more labels than this bound
# (the YT-8M vocabulary assigns ≲20 labels/video; the reference computes the
# same statistic with a full per-row sort).
PERR_MAX_LABELS = 256


class BatchMetricPartials(NamedTuple):
    topk_scores: jnp.ndarray   # [B, k] float32
    topk_labels: jnp.ndarray   # [B, k] float32 (gathered groundtruth)
    num_positives: jnp.ndarray  # scalar float32 (weighted)
    hit_at_one_sum: jnp.ndarray  # scalar float32 (weighted sum over batch)
    perr_sum: jnp.ndarray      # scalar float32 (weighted sum over batch)
    weight_sum: jnp.ndarray    # scalar float32


def batch_topk_partials(
    predictions: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    top_k: int = 20,
) -> BatchMetricPartials:
    """Compute per-batch metric partials on device.

    predictions [B, V] probabilities; labels [B, V] multi-hot; weights [B]
    1/0 mask for end-of-data padding rows.
    """
    predictions = predictions.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    b, v = predictions.shape
    if weights is None:
        weights = jnp.ones((b,), jnp.float32)
    weights = weights.astype(jnp.float32)

    k = min(top_k, v)
    topk_scores, topk_idx = top_k_exact(predictions, k)
    topk_labels = jnp.take_along_axis(labels, topk_idx, axis=1)
    # padded rows: push scores to -inf-equivalent and zero their labels so the
    # pooled sort puts them last and they never count as positives.
    topk_scores = jnp.where(weights[:, None] > 0, topk_scores, -jnp.inf)
    topk_labels = topk_labels * weights[:, None]

    num_positives = jnp.sum(labels * weights[:, None])

    # Hit@1 (ref: eval_util.py#calculate_hit_at_one)
    top1 = jnp.argmax(predictions, axis=1)
    hit = jnp.take_along_axis(labels, top1[:, None], axis=1)[:, 0]
    hit_sum = jnp.sum(hit * weights)

    # PERR (ref: eval_util.py#calculate_precision_at_equal_recall_rate):
    # top-|labels| predictions per row; count true labels among them where
    # the score is > 0; normalize by |labels|; zero-label rows contribute 0.
    # A bounded top-k (not a full [B, V] argsort) suffices: rows never carry
    # more than PERR_MAX_LABELS positives (YT-8M videos have ≲20 labels), and
    # lax.top_k breaks ties by lower index exactly like a stable argsort.
    n_l = jnp.sum(labels, axis=1)  # [B]
    k_perr = min(v, PERR_MAX_LABELS)
    perr_scores, perr_idx = jax.lax.top_k(predictions, k_perr)
    sorted_labels = jnp.take_along_axis(labels, perr_idx, axis=1)
    rank = jnp.arange(k_perr)[None, :]
    n_l_capped = jnp.minimum(n_l, float(k_perr))
    in_top = (rank < n_l_capped[:, None]).astype(jnp.float32)
    hits_in_top = jnp.sum(sorted_labels * (perr_scores > 0) * in_top, axis=1)
    perr_row = jnp.where(n_l > 0, hits_in_top / jnp.maximum(n_l, 1.0), 0.0)
    perr_sum = jnp.sum(perr_row * weights)

    return BatchMetricPartials(
        topk_scores=topk_scores,
        topk_labels=topk_labels,
        num_positives=num_positives,
        hit_at_one_sum=hit_sum,
        perr_sum=perr_sum,
        weight_sum=jnp.sum(weights),
    )
