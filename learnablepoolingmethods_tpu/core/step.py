"""jit'd train / eval / predict steps (ref: train.py#build_graph + eval.py).

One fused XLA program per step: on-device uint8 dequantize → ℓ2-normalize →
model forward (→ backward) → per-leaf grad clip → optimizer update.  Under a
data mesh, inputs arrive batch-sharded and parameters replicated; XLA inserts
the gradient all-reduce over ICI (SURVEY.md §2.4) — there is no explicit
pmap/psum code to maintain.

Reference parity notes:
- input stage: ``tf.nn.l2_normalize(model_input_raw, last_dim)``
  (ref: train.py#build_graph) reproduced after on-device dequantize.
- regularization: final_loss = label_loss + penalty · reg_loss where
  reg_loss = Σ ½‖W‖² · l2_penalty over the HEAD kernels only by default
  (``_HEAD_KERNEL_NAMES`` — the scope the reference's slim
  l2_regularizer(1e-8) collections actually cover; ``--l2_reg_all_kernels``
  widens it to every kernel-like param) plus any model-returned
  "regularization_loss".
- losses are weighted-averaged with the batch padding mask; on full batches
  this is exactly the reference's reduce_mean.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from learnablepoolingmethods_tpu.config import ModelConfig, TrainingConfig
from learnablepoolingmethods_tpu.core.train_state import TrainState
from learnablepoolingmethods_tpu.losses import BaseLoss
from learnablepoolingmethods_tpu.ops import metrics_ops
from learnablepoolingmethods_tpu.ops.normalize import l2_normalize
from learnablepoolingmethods_tpu.ops.topk import top_k_exact
from learnablepoolingmethods_tpu.utils.quantization import dequantize


def preprocess_input(features: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Device-side input stage: (uint8 → dequantize) → ℓ2-normalize last dim."""
    if features.dtype == jnp.uint8:
        x = dequantize(features, dtype=dtype)
    else:
        x = features.astype(dtype)
    return l2_normalize(x, axis=-1)


_HEAD_KERNEL_NAMES = ("gates_kernel", "experts_kernel")


def _is_head_kernel(path) -> bool:
    """Matches the params the reference attaches slim.l2_regularizer to:
    the MoE gates/experts FC kernels and the Logistic/FrameLevelLogistic
    ``fc`` kernel — and nothing else (cluster/hidden/gating weights are
    created via tf.get_variable without a regularizer)."""
    keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    if keys and keys[-1] in _HEAD_KERNEL_NAMES:
        return True
    return len(keys) >= 2 and keys[-1] == "kernel" and keys[-2] == "fc"


def regularization_loss(
    params,
    l2_penalty: float,
    all_kernels: bool = False,
    moe_l2: Optional[float] = None,
) -> jnp.ndarray:
    """Slim-style L2: penalty · ½·Σ‖w‖².

    Reference behavior (default): only classifier-head FC kernels carry the
    regularizer (ref: video_level_models.py#LogisticModel/#MoeModel
    weights_regularizer=slim.l2_regularizer).  The MoE head uses its own
    ``--moe_l2`` penalty (defaults equal to ``l2_penalty``).
    ``all_kernels=True`` (``--l2_reg_all_kernels``) extends ``l2_penalty``
    to every matrix param — a rebuild-only option, not reference parity.
    """
    moe_l2 = l2_penalty if moe_l2 is None else moe_l2
    if l2_penalty <= 0 and moe_l2 <= 0:
        return jnp.zeros((), jnp.float32)
    sq = 0.0
    for path, p in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if p.ndim < 2:
            continue
        if keys[-1] in _HEAD_KERNEL_NAMES:
            sq = sq + moe_l2 * jnp.sum(jnp.square(p.astype(jnp.float32)))
        elif all_kernels or _is_head_kernel(path):
            sq = sq + l2_penalty * jnp.sum(jnp.square(p.astype(jnp.float32)))
    return 0.5 * sq


def weighted_mean(per_example: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    w = weights.astype(jnp.float32)
    return jnp.sum(per_example.astype(jnp.float32) * w) / jnp.maximum(
        jnp.sum(w), 1.0
    )


def make_train_step(
    model,
    loss_obj: BaseLoss,
    tcfg: TrainingConfig,
    mcfg: ModelConfig,
    frame_features: bool,
) -> Callable:
    """Build the fused train step: (state, batch, rng) → (state, metrics).

    With ``tcfg.grad_accum_steps > 1`` the batch is split into that many
    microbatches whose backward passes run sequentially inside the same jit
    (unrolled — scan-over-pallas is off-limits through the remote compiler):
    peak activation memory scales with batch_size/accum while the optimizer
    still sees one averaged gradient, so effective batches past the B=4096
    single-pass activation OOM fit (remat measured a loss — BASELINE.md).
    BatchNorm statistics and frame sampling are per-microbatch (the standard
    accumulation semantics; batch_stats chain through the microbatches).
    """
    compute_dtype = jnp.dtype(mcfg.compute_dtype)

    presample = bool(getattr(tcfg, "presample_frames", False)) and frame_features
    accum = max(1, int(getattr(tcfg, "grad_accum_steps", 1)))

    def train_step(state: TrainState, batch, rng):
        num_frames = batch.get("num_frames") if frame_features else None
        step_rng = jax.random.fold_in(rng, state.step)
        sampling_rng, dropout_rng = jax.random.split(step_rng)
        features = batch["features"]
        if presample and accum == 1:
            # gather the sampled frames in uint8 BEFORE dequantize+ℓ2-norm
            # (1 byte/row instead of 2, and only sampled rows get the float
            # input stage; exact — ℓ2-normalize is row-wise and the model's
            # BN runs after sampling).  Same floor(U·nf) index distribution
            # as model_utils.sample_random_frames; the model is built with
            # presampled=True and skips its internal sampling.
            from learnablepoolingmethods_tpu.models.model_utils import (
                sample_frame_features,
            )

            features = sample_frame_features(
                features, num_frames, mcfg.iterations, sampling_rng
            )
        weights = batch.get("weights")
        if weights is None:
            weights = jnp.ones((features.shape[0],), jnp.float32)

        def forward(params, batch_stats, x, srng, drng, num_frames):
            variables = {"params": params, "batch_stats": batch_stats}
            kwargs = {"num_frames": num_frames} if num_frames is not None else {}
            return model.apply(
                variables,
                x,
                training=True,
                rngs={"sampling": srng, "dropout": drng},
                mutable=["batch_stats"],
                **kwargs,
            )

        if tcfg.use_remat:
            # rematerialize the forward in the backward pass — trades the
            # NetVLAD/DBoF activation HBM footprint for recompute FLOPs
            # (SURVEY.md §7 hard parts: the Willow config is memory-heavy).
            forward = jax.checkpoint(forward)

        if accum == 1:
            x = preprocess_input(features, compute_dtype)

            def loss_fn(params):
                out, mutated = forward(
                    params, state.batch_stats, x, sampling_rng, dropout_rng,
                    num_frames,
                )
                predictions = out["predictions"]
                per_ex = loss_obj.calculate_per_example_loss(
                    predictions, batch["labels"].astype(jnp.float32)
                )
                label_loss = weighted_mean(per_ex, weights)
                reg = regularization_loss(
                    params,
                    mcfg.l2_penalty,
                    all_kernels=mcfg.l2_reg_all_kernels,
                    moe_l2=mcfg.moe_l2,
                )
                reg = reg + out.get("regularization_loss", 0.0)
                total = label_loss + tcfg.regularization_penalty * reg
                return total, (label_loss, reg, predictions, mutated["batch_stats"])

            (total, (label_loss, reg, predictions, new_bs)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            )
        else:
            batch_size = features.shape[0]
            if batch_size % accum:
                raise ValueError(
                    f"batch_size={batch_size} not divisible by "
                    f"grad_accum_steps={accum}"
                )
            mb = batch_size // accum
            labels_f32 = batch["labels"].astype(jnp.float32)
            w_total = jnp.maximum(jnp.sum(weights.astype(jnp.float32)), 1.0)

            def microbatch_loss(params, bs, feats, labels, ws, w_frac,
                                srng, drng, nfs):
                # loss_i = Σ_mb(w·ℓ)/W_total + (W_mb/W_total)·penalty·reg_m:
                # summed over microbatches this is EXACTLY the full-batch
                # weighted-mean label loss (plus the weighted model-internal
                # reg, which depends on activations so it must stay in-loop);
                # the params-only L2 term is hoisted OUTSIDE the loop so its
                # gradient is applied exactly once — identical to the
                # single-pass step for ANY weight sum, and the giant head
                # kernels are read once, not accum times.
                if presample:
                    # per-microbatch, NOT whole-batch: the uint8 one-hot
                    # gather materializes temps the size of its input, and a
                    # full-batch gather was the single largest OOM buffer at
                    # B=4096 accum=2 (1.34 GB u8 copy, measured)
                    from learnablepoolingmethods_tpu.models.model_utils import (
                        sample_frame_features,
                    )

                    feats = sample_frame_features(
                        feats, nfs, mcfg.iterations, srng
                    )
                x = preprocess_input(feats, compute_dtype)
                out, mutated = forward(params, bs, x, srng, drng, nfs)
                predictions = out["predictions"]
                per_ex = loss_obj.calculate_per_example_loss(predictions, labels)
                label_part = (
                    jnp.sum(per_ex.astype(jnp.float32) * ws.astype(jnp.float32))
                    / w_total
                )
                reg_m = out.get("regularization_loss", 0.0)
                total = label_part + w_frac * tcfg.regularization_penalty * reg_m
                return total, (label_part, reg_m, predictions,
                               mutated["batch_stats"])

            grad_fn = jax.value_and_grad(microbatch_loss, has_aux=True)
            bs = state.batch_stats
            grads_f32 = None
            grads_dtypes = None
            label_loss = jnp.zeros((), jnp.float32)
            reg = jnp.zeros((), jnp.float32)
            preds_parts = []
            for i in range(accum):
                sl = slice(i * mb, (i + 1) * mb)
                feats_i = features[sl]
                if grads_f32 is not None:
                    # force microbatch i to wait for ALL of microbatch i-1's
                    # backward: one optimization_barrier HLO over the input
                    # AND the whole accumulated gradient tree ties them
                    # together.  Depending on a single grad leaf is NOT
                    # enough — XLA computes that leaf early in the backward
                    # and overlaps the rest with the next forward, keeping
                    # multiple microbatches' activations live (measured:
                    # B=8192/accum=4 used ~2 microbatches' temps and OOMed
                    # by 10 GB with the single-leaf dependency).
                    feats_i, grads_f32 = jax.lax.optimization_barrier(
                        (feats_i, grads_f32)
                    )
                ws_i = weights[sl]
                w_frac = jnp.sum(ws_i.astype(jnp.float32)) / w_total
                nfs_i = num_frames[sl] if num_frames is not None else None
                (_, (label_i, reg_i, preds_i, bs)), g_i = grad_fn(
                    state.params,
                    bs,
                    feats_i,
                    labels_f32[sl],
                    ws_i,
                    w_frac,
                    jax.random.fold_in(sampling_rng, i),
                    jax.random.fold_in(dropout_rng, i),
                    nfs_i,
                )
                if grads_f32 is None:
                    grads_dtypes = jax.tree.map(lambda g: g.dtype, g_i)
                    grads_f32 = jax.tree.map(
                        lambda g: g.astype(jnp.float32), g_i
                    )
                else:
                    grads_f32 = jax.tree.map(
                        lambda a, g: a + g.astype(jnp.float32), grads_f32, g_i
                    )
                label_loss = label_loss + label_i
                reg = reg + w_frac * reg_i
                preds_parts.append(preds_i)
            # params-only L2, computed and differentiated exactly once
            reg_p, reg_p_grads = jax.value_and_grad(
                lambda p: regularization_loss(
                    p,
                    mcfg.l2_penalty,
                    all_kernels=mcfg.l2_reg_all_kernels,
                    moe_l2=mcfg.moe_l2,
                )
            )(state.params)
            grads_f32 = jax.tree.map(
                lambda a, g: a
                + tcfg.regularization_penalty * g.astype(jnp.float32),
                grads_f32,
                reg_p_grads,
            )
            reg = reg + reg_p
            # cast back to the dtype a single-pass backward would produce so
            # the optimizer (incl. fused SR-Adam) sees identical inputs
            grads = jax.tree.map(
                lambda g, dt: g.astype(dt), grads_f32, grads_dtypes
            )
            predictions = jnp.concatenate(preds_parts, axis=0)
            total = label_loss + tcfg.regularization_penalty * reg
            new_bs = bs

        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = {
            "loss": total,
            "label_loss": label_loss,
            "reg_loss": reg,
            "predictions": predictions,
        }
        return new_state, metrics

    return train_step


def make_eval_step(
    model,
    loss_obj: BaseLoss,
    mcfg: ModelConfig,
    frame_features: bool,
    top_k: int = 20,
) -> Callable:
    """Build the eval step: (params, batch_stats, batch) → metrics partials.

    Returns predictions (for the reference-parity host accumulator) AND the
    on-device partials (fast path) from one fused program.
    """
    compute_dtype = jnp.dtype(mcfg.compute_dtype)

    def eval_step(params, batch_stats, batch, rng=None):
        x = preprocess_input(batch["features"], compute_dtype)
        num_frames = batch.get("num_frames") if frame_features else None
        weights = batch.get("weights")
        if weights is None:
            weights = jnp.ones((x.shape[0],), jnp.float32)
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = {"num_frames": num_frames} if num_frames is not None else {}
        if rng is not None:
            kwargs["rngs"] = {"sampling": rng}  # fresh frame sampling per batch
        out = model.apply(variables, x, training=False, **kwargs)
        predictions = out["predictions"]
        labels = batch["labels"].astype(jnp.float32)
        per_ex = loss_obj.calculate_per_example_loss(predictions, labels)
        loss = weighted_mean(per_ex, weights)
        partials = metrics_ops.batch_topk_partials(
            predictions, labels, weights, top_k=top_k
        )
        return {"predictions": predictions, "loss": loss, "partials": partials}

    return eval_step


def make_predict_step(model, mcfg: ModelConfig, frame_features: bool, top_k: int = 20):
    """Inference step (ref: inference.py#inference hot loop): forward +
    on-device top-k → (values [B,k], class indices [B,k])."""
    compute_dtype = jnp.dtype(mcfg.compute_dtype)

    def predict_step(params, batch_stats, features, num_frames=None, rng=None):
        x = preprocess_input(features, compute_dtype)
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = (
            {"num_frames": num_frames}
            if (frame_features and num_frames is not None)
            else {}
        )
        if rng is not None:
            # fresh frame-sampling randomness per batch (the reference samples
            # new random frames every batch; a fixed fallback key would
            # correlate sampling across the whole run — advisor finding)
            kwargs["rngs"] = {"sampling": rng}
        out = model.apply(variables, x, training=False, **kwargs)
        predictions = out["predictions"].astype(jnp.float32)
        values, indices = top_k_exact(predictions, min(top_k, predictions.shape[-1]))
        return values, indices

    return predict_step


def init_model_variables(model, example_batch, frame_features: bool, seed: int = 0):
    """Initialize params/batch_stats from one example batch (host or device)."""
    x = preprocess_input(jnp.asarray(example_batch["features"]))
    kwargs = {}
    if frame_features and "num_frames" in example_batch:
        kwargs["num_frames"] = jnp.asarray(example_batch["num_frames"])
    key = jax.random.key(seed)
    variables = model.init(
        {"params": key, "sampling": key, "dropout": key},
        x,
        training=True,
        **kwargs,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return params, batch_stats
