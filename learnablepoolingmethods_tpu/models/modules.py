"""Learnable pooling module library (L4 — the repo's scientific core).

TPU-first reimplementations of the LOUPE-family aggregation blocks
(ref: modules.py#BaseModule + video_pooling_modules.py — NetVLAD / NetRVLAD /
NetFV / SoftDBoW; math documented in SURVEY.md §3.5).  Differences from the
reference are architectural, not semantic:

- Modules take the natural ``[B, F, D]`` frame tensor (the reference flattens
  to ``[B·F, D]`` and back); XLA sees identical contractions but the batched
  layout maps directly onto MXU-tiled ``dot_general``s.
- All matmuls carry ``preferred_element_type=float32`` so bf16 inputs
  accumulate in fp32 on the MXU.
- The assignment softmax + residual aggregation also exist as a fused Pallas
  kernel (``ops/netvlad_pallas.py``) used on the inference hot path; these
  flax modules are the autodiff-friendly reference path and the parity
  oracle for that kernel.

Every module returns a flat per-video descriptor:
  NetVLAD/NetRVLAD: [B, D·K]   NetFV: [B, 2·D·K]   SoftDBoW: [B, K]
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from learnablepoolingmethods_tpu.ops.normalize import l2_normalize


def _normal_init(stddev):
    return nn.initializers.normal(stddev=stddev)


# TF slim.batch_norm defaults (decay=0.999, epsilon=0.001) — kept for parity.
BN_MOMENTUM = 0.999
BN_EPSILON = 1e-3


class BaseModule(nn.Module):
    """Pooling-module contract (ref: modules.py#BaseModule.forward)."""

    def __call__(self, frames, training: bool = False):
        raise NotImplementedError()


class NetVLAD(BaseModule):
    """NetVLAD aggregation (ref: video_pooling_modules.py#NetVLAD.forward).

    A = softmax(BN(X · C))                [B, F, K] soft assignment
    a_sum = Σ_F A                         [B, 1, K]
    vlad = Aᵀ·X − a_sum ⊙ C₂              [B, D, K] residual aggregation
    intra-ℓ2 over D, flatten, global ℓ2   [B, D·K]
    """

    feature_size: int
    max_frames: int
    cluster_size: int
    add_batch_norm: bool = True
    # Use the custom-VJP fused aggregation kernel (ops/netvlad_train.py) for
    # everything after the assignment BN — forward AND backward run in VMEM
    # with recompute instead of materializing [B,D,K] autodiff intermediates.
    fused_aggregation: bool = False
    fused_interpret: bool = False  # interpret-mode kernels (CPU tests)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, training: bool = False):
        d, k = self.feature_size, self.cluster_size
        x = frames.astype(self.dtype)  # [B, F, D]

        cluster_weights = self.param(
            "cluster_weights", _normal_init(1.0 / jnp.sqrt(d)), (d, k), self.param_dtype
        )
        activation = jnp.einsum(
            "bfd,dk->bfk", x, cluster_weights.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.add_batch_norm:
            activation = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="cluster_bn",
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
            )(activation)
        else:
            cluster_biases = self.param(
                "cluster_biases", _normal_init(1.0 / jnp.sqrt(d)), (k,), self.param_dtype
            )
            activation = activation + cluster_biases

        cluster_weights2 = self.param(
            "cluster_weights2", _normal_init(1.0 / jnp.sqrt(d)), (1, d, k), self.param_dtype
        )

        if self.fused_aggregation:
            from learnablepoolingmethods_tpu.ops.netvlad_train import (
                netvlad_aggregate,
            )

            vlad = netvlad_aggregate(
                x,
                activation,  # post-BN assignment logits
                cluster_weights2.reshape(d, k),
                self.fused_interpret,
            )
            return vlad.reshape(-1, d * k).astype(self.dtype)

        activation = nn.softmax(activation, axis=-1)  # [B, F, K]

        a_sum = jnp.sum(activation, axis=1, keepdims=True)  # [B, 1, K]
        a = a_sum * cluster_weights2.astype(activation.dtype)  # [B, D, K]

        vlad = jnp.einsum(
            "bfk,bfd->bdk", activation, x, preferred_element_type=jnp.float32
        )  # [B, D, K]
        vlad = vlad - a
        vlad = l2_normalize(vlad, axis=1)  # intra-norm over D per cluster
        vlad = vlad.reshape(-1, d * k)     # row-major [B, D·K]: index d·K + k
        vlad = l2_normalize(vlad, axis=1)
        return vlad.astype(self.dtype)


class NetRVLAD(BaseModule):
    """Residual-less NetVLAD (ref: video_pooling_modules.py#NetRVLAD) —
    identical to NetVLAD but skips the learned-center subtraction."""

    feature_size: int
    max_frames: int
    cluster_size: int
    add_batch_norm: bool = True
    fused_aggregation: bool = False  # netvlad_aggregate with C₂ = 0
    fused_interpret: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, training: bool = False):
        d, k = self.feature_size, self.cluster_size
        x = frames.astype(self.dtype)

        cluster_weights = self.param(
            "cluster_weights", _normal_init(1.0 / jnp.sqrt(d)), (d, k), self.param_dtype
        )
        activation = jnp.einsum(
            "bfd,dk->bfk", x, cluster_weights.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.add_batch_norm:
            activation = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="cluster_bn",
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
            )(activation)
        else:
            cluster_biases = self.param(
                "cluster_biases", _normal_init(1.0 / jnp.sqrt(d)), (k,), self.param_dtype
            )
            activation = activation + cluster_biases

        if self.fused_aggregation:
            from learnablepoolingmethods_tpu.ops.netvlad_train import (
                netvlad_aggregate,
            )

            # RVLAD ≡ NetVLAD aggregation with zero centers (no residual)
            vlad = netvlad_aggregate(
                x,
                activation,
                jnp.zeros((d, k), jnp.float32),
                self.fused_interpret,
            )
            return vlad.reshape(-1, d * k).astype(self.dtype)

        activation = nn.softmax(activation, axis=-1)

        vlad = jnp.einsum(
            "bfk,bfd->bdk", activation, x, preferred_element_type=jnp.float32
        )
        vlad = l2_normalize(vlad, axis=1)
        vlad = vlad.reshape(-1, d * k)
        vlad = l2_normalize(vlad, axis=1)
        return vlad.astype(self.dtype)


class NetFV(BaseModule):
    """Net Fisher Vector (ref: video_pooling_modules.py#NetFV.forward).

    First-order (mean residual / σ) and second-order (variance) statistics per
    cluster, each intra- and globally ℓ2-normalized, concatenated [B, 2·D·K].
    """

    feature_size: int
    max_frames: int
    cluster_size: int
    add_batch_norm: bool = True
    couple_weights: bool = False
    coupling_factor: float = 0.01
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, training: bool = False):
        d, k = self.feature_size, self.cluster_size
        x = frames.astype(self.dtype)

        cluster_weights = self.param(
            "cluster_weights", _normal_init(1.0 / jnp.sqrt(d)), (d, k), self.param_dtype
        )
        covar_weights_raw = self.param(
            "covar_weights",
            nn.initializers.normal(stddev=1.0 / jnp.sqrt(d)),
            (d, k),
            self.param_dtype,
        )
        if self.couple_weights:
            covar = self.coupling_factor * cluster_weights
        else:
            covar = covar_weights_raw
        # reference squares then adds a variance floor
        covar = jnp.square(covar).astype(jnp.float32) + 1e-6

        activation = jnp.einsum(
            "bfd,dk->bfk", x, cluster_weights.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.add_batch_norm:
            activation = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="cluster_bn",
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
            )(activation)
        else:
            cluster_biases = self.param(
                "cluster_biases", _normal_init(1.0 / jnp.sqrt(d)), (k,), self.param_dtype
            )
            activation = activation + cluster_biases
        activation = nn.softmax(activation, axis=-1)  # [B, F, K]

        a_sum = jnp.sum(activation, axis=1, keepdims=True)  # [B, 1, K]
        cluster_weights2 = self.param(
            "cluster_weights2", _normal_init(1.0 / jnp.sqrt(d)), (1, d, k), self.param_dtype
        )
        cw2 = cluster_weights2.astype(jnp.float32)
        a = a_sum * cw2  # [B, D, K]

        fv1 = jnp.einsum(
            "bfk,bfd->bdk", activation, x, preferred_element_type=jnp.float32
        )  # Σ_f a_fk x_fd

        # second-order: Σ_f a_fk x²_fd  − 2 c ⊙ fv1 + c² ⊙ a_sum  all over σ²
        fv2 = jnp.einsum(
            "bfk,bfd->bdk", activation, jnp.square(x), preferred_element_type=jnp.float32
        )
        a2 = a_sum * jnp.square(cw2)
        b2 = fv1 * cw2
        fv2 = a2 + fv2 - 2.0 * b2
        fv2 = fv2 / jnp.square(covar)
        fv2 = fv2 - a_sum
        fv2 = l2_normalize(fv2, axis=1)
        fv2 = fv2.reshape(-1, d * k)
        fv2 = l2_normalize(fv2, axis=1)

        fv1 = fv1 - a
        fv1 = fv1 / covar
        fv1 = l2_normalize(fv1, axis=1)
        fv1 = fv1.reshape(-1, d * k)
        fv1 = l2_normalize(fv1, axis=1)

        return jnp.concatenate([fv1, fv2], axis=1).astype(self.dtype)


class SoftDBoW(BaseModule):
    """Soft bag-of-words histogram (ref: video_pooling_modules.py#SoftDBoW):
    ℓ2-normalized column-sum of the soft-assignment matrix → [B, K]."""

    feature_size: int
    max_frames: int
    cluster_size: int
    add_batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, training: bool = False):
        d, k = self.feature_size, self.cluster_size
        x = frames.astype(self.dtype)
        cluster_weights = self.param(
            "cluster_weights", _normal_init(1.0 / jnp.sqrt(d)), (d, k), self.param_dtype
        )
        activation = jnp.einsum(
            "bfd,dk->bfk", x, cluster_weights.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        if self.add_batch_norm:
            activation = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="cluster_bn",
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
            )(activation)
        else:
            cluster_biases = self.param(
                "cluster_biases", _normal_init(1.0 / jnp.sqrt(d)), (k,), self.param_dtype
            )
            activation = activation + cluster_biases
        activation = nn.softmax(activation, axis=-1)
        bow = jnp.sum(activation, axis=1)  # [B, K]
        bow = l2_normalize(bow, axis=1)
        return bow.astype(self.dtype)


class ContextGating(nn.Module):
    """Context gating x ⊙ σ(Wx (+b | BN)) (ref: NetVLADModelLF gating block;
    Miech et al. 2017).  The BN-folded fused inference path lives in
    ops/fast_infer.py; this flax module is the training/parity path."""

    add_batch_norm: bool = True
    remove_diag: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        dim = x.shape[-1]
        gating_weights = self.param(
            "gating_weights", _normal_init(1.0 / jnp.sqrt(dim)), (dim, dim), self.param_dtype
        )
        w = gating_weights.astype(self.dtype)
        if self.remove_diag:
            w = w - jnp.diag(jnp.diag(w))
        gates = jnp.matmul(x.astype(self.dtype), w, preferred_element_type=jnp.float32)
        if self.add_batch_norm:
            gates = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="gating_bn",
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
            )(gates)
        else:
            gating_biases = self.param(
                "gating_biases", _normal_init(1.0 / jnp.sqrt(dim)), (dim,), self.param_dtype
            )
            gates = gates + gating_biases
        gates = nn.sigmoid(gates)
        return (x * gates.astype(x.dtype)).astype(self.dtype)


class NeXtVLAD(BaseModule):
    """NeXtVLAD aggregation (rebuild bonus; Lin et al., arXiv:1811.05014 —
    the 2018 YT-8M challenge's parameter-efficient NetVLAD successor; listed
    in PAPERS.md as the quality upper reference).

    x̃ = X·W_e                      [B, F, λD]        (expansion, λ=2)
    α = σ(x̃·W_g)                   [B, F, G]         (group attention)
    a = softmax(x̃·W_a → [·, G·K])  [B, F, G, K]      (assignment)
    x̂ = reshape(x̃, [B, F, G, D′])  D′ = λD/G         (grouping)
    v[k, d′] = Σ_{f,g} α·a·(x̂ − c[k, d′])            (residual aggregation)
    intra-ℓ2 over d′, flatten [B, K·D′], BN.

    The aggregation is einsum-shaped for the MXU: one [B·F, λD] expansion
    matmul, two small projection matmuls, and a [G·F → K] contraction.
    """

    feature_size: int
    max_frames: int
    cluster_size: int
    groups: int = 8
    expansion: int = 2
    add_batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames, training: bool = False):
        b, f, d = frames.shape
        g, k = self.groups, self.cluster_size
        lam_d = self.expansion * self.feature_size
        if g < 1:
            raise ValueError(f"NeXtVLAD groups must be >= 1, got {g}")
        if lam_d % g:
            raise ValueError(
                f"NeXtVLAD groups ({g}) must divide expansion·D ({lam_d})"
            )
        dp = lam_d // g
        x = frames.astype(self.dtype)

        w_e = self.param(
            "expansion_weights",
            _normal_init(1.0 / jnp.sqrt(self.feature_size)),
            (self.feature_size, lam_d),
            self.param_dtype,
        )
        xt = jnp.einsum(
            "bfd,de->bfe", x, w_e.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )  # [B, F, λD]

        w_g = self.param(
            "group_attention_weights",
            _normal_init(1.0 / jnp.sqrt(lam_d)),
            (lam_d, g),
            self.param_dtype,
        )
        alpha = nn.sigmoid(
            jnp.einsum(
                "bfe,eg->bfg", xt.astype(self.dtype), w_g.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
        )  # [B, F, G]

        w_a = self.param(
            "cluster_weights",
            _normal_init(1.0 / jnp.sqrt(lam_d)),
            (lam_d, g * k),
            self.param_dtype,
        )
        logits = jnp.einsum(
            "bfe,ec->bfc", xt.astype(self.dtype), w_a.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(b, f, g, k)
        if self.add_batch_norm:
            logits = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="cluster_bn",
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
            )(logits.reshape(b, f, g * k)).reshape(b, f, g, k)
        assign = nn.softmax(logits, axis=-1) * alpha[..., None]  # [B, F, G, K]

        c2 = self.param(
            "cluster_weights2",
            _normal_init(1.0 / jnp.sqrt(self.feature_size)),
            (k, dp),
            self.param_dtype,
        )
        xg = xt.reshape(b, f, g, dp).astype(jnp.float32)
        # Σ_{f,g} a·x̂  and  (Σ_{f,g} a)·c  — the usual VLAD split
        agg = jnp.einsum("bfgk,bfgd->bkd", assign, xg)
        a_sum = jnp.sum(assign, axis=(1, 2))  # [B, K]
        vlad = agg - a_sum[:, :, None] * c2.astype(jnp.float32)[None]
        vlad = l2_normalize(vlad, axis=-1)  # intra-normalize over d′
        vlad = vlad.reshape(b, k * dp)
        if self.add_batch_norm:
            vlad = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="vlad_bn",
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
            )(vlad)
        return vlad.astype(self.dtype)
