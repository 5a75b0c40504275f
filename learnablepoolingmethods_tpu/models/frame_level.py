"""Frame-level model zoo (ref: frame_level_models.py).

Every model consumes ``model_input`` [B, F, D] (ℓ2-normalized, dequantized
frame features, F = max_frames) plus ``num_frames`` [B], aggregates the frame
bag into one vector, and hands it to the video-level classifier selected by
``cfg.video_level_classifier_model`` (ref: the ``--video_level_classifier_model``
flag → getattr(video_level_models, ...) composition).

Frame sampling uses the flax RNG collection "sampling"; if absent (pure
inference), a fixed key keeps the computation deterministic.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from learnablepoolingmethods_tpu.models import model_utils
from learnablepoolingmethods_tpu.models.base import BaseModel, create_model, register_model
from learnablepoolingmethods_tpu.models.modules import (
    BN_EPSILON,
    BN_MOMENTUM,
    ContextGating,
    NetFV,
    NetRVLAD,
    NetVLAD,
    NeXtVLAD,
    SoftDBoW,
)


def _normal_init(stddev):
    return nn.initializers.normal(stddev=stddev)


class _FrameModelBase(BaseModel):
    """Shared plumbing for frame-level models."""

    def _sampling_rng(self):
        if self.has_rng("sampling"):
            return self.make_rng("sampling")
        return jax.random.key(0)

    def _sample_frames(self, model_input, num_frames, iterations: int):
        """(ref: DbofModel/NetVLADModelLF frame sampling preamble)."""
        if self.cfg.presampled:
            return model_input
        num_frames = jnp.minimum(
            jnp.asarray(num_frames, jnp.int32), model_input.shape[1]
        )
        if self.cfg.sample_random_frames:
            return model_utils.sample_random_frames(
                model_input, num_frames, iterations, self._sampling_rng()
            )
        return model_utils.sample_random_sequence(
            model_input, num_frames, iterations, self._sampling_rng()
        )

    def _input_bn(self, frames, training):
        return nn.BatchNorm(
            use_running_average=not training,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON,
            name="input_bn",
            dtype=jnp.float32,
            param_dtype=jnp.dtype(self.cfg.param_dtype),
        )(frames)

    def _classify(self, activation, training):
        head = create_model(self.cfg.video_level_classifier_model, self.cfg)
        return head(activation, training=training)

    def _lf_tail(
        self,
        pooled,
        cluster_size: int,
        hidden_size: int,
        add_batch_norm: bool,
        relu: bool,
        training: bool,
    ):
        """Hidden FC → (BN | bias) → relu6? → context gating? → classifier.

        (ref: NetVLADModelLF tail, shared verbatim by NetFV/NetRVLAD/SoftDBoW
        LF models in the LOUPE lineage.)
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)

        hidden1_weights = self.param(
            "hidden1_weights",
            _normal_init(1.0 / jnp.sqrt(cluster_size)),
            (pooled.shape[-1], hidden_size),
            pdtype,
        )
        activation = jnp.matmul(
            pooled.astype(dtype),
            hidden1_weights.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        if add_batch_norm and relu:
            activation = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="hidden1_bn",
                dtype=jnp.float32,
                param_dtype=pdtype,
            )(activation)
        else:
            hidden1_biases = self.param(
                "hidden1_biases", _normal_init(0.01), (hidden_size,), pdtype
            )
            activation = activation + hidden1_biases
        if relu:
            activation = jnp.clip(activation, 0.0, 6.0)  # relu6
        if cfg.gating:
            activation = ContextGating(
                add_batch_norm=add_batch_norm,
                remove_diag=cfg.gating_remove_diag,
                dtype=dtype,
                param_dtype=pdtype,
                name="gating",
            )(activation, training=training)
        return self._classify(activation.astype(dtype), training)


@register_model
class FrameLevelLogisticModel(_FrameModelBase):
    """Mean-over-valid-frames → logistic
    (ref: frame_level_models.py#FrameLevelLogisticModel — sums the zero-padded
    frame axis and divides by num_frames).

    The reference zero-pads AFTER dequantize, so padded rows contribute
    nothing to the sum.  Our pipeline pads in uint8 space, and
    dequantize(0) → −1.992 followed by ℓ2-normalize yields nonzero constant
    rows; they must be masked out here to reproduce the reference sum.
    """

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        nf = jnp.maximum(jnp.asarray(num_frames, jnp.float32), 1.0).reshape(-1, 1)
        mask = model_utils.frame_mask(num_frames, model_input.shape[1])
        avg_pooled = (
            jnp.sum(model_input.astype(jnp.float32) * mask[:, :, None], axis=1) / nf
        )
        logits = nn.Dense(
            cfg.vocab_size,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=dtype,
            param_dtype=jnp.dtype(cfg.param_dtype),
            name="fc",
        )(avg_pooled.astype(dtype))
        return {"predictions": nn.sigmoid(logits.astype(jnp.float32))}


@register_model
class DbofModel(_FrameModelBase):
    """Deep Bag-of-Frames (ref: frame_level_models.py#DbofModel).

    BASELINE config 3: sample ``--iterations`` frames → input BN → cluster
    projection [D → dbof_cluster_size] + BN + relu6 → max-pool over frames →
    hidden FC + BN + relu6 → video-level classifier.  Both projections are
    single MXU matmuls; XLA fuses BN+relu6 into their epilogues.
    """

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        add_bn = cfg.dbof_add_batch_norm

        frames = self._sample_frames(model_input, num_frames, cfg.iterations)
        feature_size = frames.shape[-1]
        if add_bn:
            frames = self._input_bn(frames, training)

        cluster_weights = self.param(
            "cluster_weights",
            _normal_init(1.0 / jnp.sqrt(feature_size)),
            (feature_size, cfg.dbof_cluster_size),
            pdtype,
        )
        activation = jnp.einsum(
            "bfd,dk->bfk",
            frames.astype(dtype),
            cluster_weights.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        if add_bn:
            activation = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="cluster_bn",
                dtype=jnp.float32,
                param_dtype=pdtype,
            )(activation)
        else:
            cluster_biases = self.param(
                "cluster_biases",
                _normal_init(1.0 / jnp.sqrt(feature_size)),
                (cfg.dbof_cluster_size,),
                pdtype,
            )
            activation = activation + cluster_biases
        activation = jnp.clip(activation, 0.0, 6.0)

        pooled = model_utils.frame_pooling(activation, cfg.dbof_pooling_method)

        hidden1_weights = self.param(
            "hidden1_weights",
            _normal_init(1.0 / jnp.sqrt(cfg.dbof_cluster_size)),
            (cfg.dbof_cluster_size, cfg.dbof_hidden_size),
            pdtype,
        )
        activation = jnp.matmul(
            pooled.astype(dtype),
            hidden1_weights.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        if add_bn:
            activation = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="hidden1_bn",
                dtype=jnp.float32,
                param_dtype=pdtype,
            )(activation)
        else:
            hidden1_biases = self.param(
                "hidden1_biases", _normal_init(0.01), (cfg.dbof_hidden_size,), pdtype
            )
            activation = activation + hidden1_biases
        activation = jnp.clip(activation, 0.0, 6.0)

        return self._classify(activation.astype(dtype), training)


@register_model
class LstmModel(_FrameModelBase):
    """Stacked LSTM over the frame sequence, final top-layer state → head
    (ref: frame_level_models.py#LstmModel — BasicLSTMCell(lstm_cells) ×
    lstm_layers, dynamic_rnn with sequence_length).

    TPU note: recurrence is a `lax.scan` (via nn.RNN) — static 300-step loop,
    no dynamic shapes; ``seq_lengths`` gives the reference's
    sequence_length-aware final state.
    """

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        cfg = self.cfg
        x = model_input.astype(jnp.float32)
        seq_lengths = jnp.minimum(jnp.asarray(num_frames, jnp.int32), x.shape[1])
        carry = None
        for layer in range(cfg.lstm_layers):
            rnn = nn.RNN(
                nn.OptimizedLSTMCell(features=cfg.lstm_cells),
                return_carry=True,
                name=f"lstm_{layer}",
            )
            carry, x = rnn(x, seq_lengths=seq_lengths)
        final_state = carry[1]  # h of the top layer (ref: state[-1].h)
        return self._classify(final_state, training)


@register_model
class GruModel(_FrameModelBase):
    """Stacked GRU pooling (ref: frame_level_models.py#GruModel lineage)."""

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        cfg = self.cfg
        x = model_input.astype(jnp.float32)
        seq_lengths = jnp.minimum(jnp.asarray(num_frames, jnp.int32), x.shape[1])
        carry = None
        for layer in range(cfg.gru_layers):
            rnn = nn.RNN(
                nn.GRUCell(features=cfg.gru_cells),
                return_carry=True,
                name=f"gru_{layer}",
            )
            carry, x = rnn(x, seq_lengths=seq_lengths)
        return self._classify(carry, training)


class _LoupeLFBase(_FrameModelBase):
    """Template shared by the NetVLAD/NetFV/NetRVLAD/SoftDBoW "LF" models:
    sample → input BN → per-modality pooling (audio clusters = rgb/2) →
    concat → shared tail (hidden FC, gating, classifier)."""

    def _pool_module(self, feature_size, max_frames, cluster_size):
        raise NotImplementedError

    def _cluster_size(self) -> int:
        raise NotImplementedError

    def _hidden_size(self) -> int:
        raise NotImplementedError

    def _relu(self) -> bool:
        raise NotImplementedError

    def _add_bn(self) -> bool:
        return self.cfg.netvlad_add_batch_norm

    def _lf_forward(self, model_input, num_frames, training):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        frames = self._sample_frames(model_input, num_frames, cfg.iterations)
        max_frames = frames.shape[1]
        feature_size = frames.shape[2]
        add_bn = self._add_bn()
        if add_bn:
            frames = self._input_bn(frames, training)

        if cfg.netvlad_dimred > 0:
            # learned input dim-reduction (ref: NetVLADModelLF --netvlad_dimred
            # — a bias-free matmul on the flattened frames; [M]-confidence
            # placement: after input BN, before the modality pooling; with a
            # reduced width there is no rgb/audio split anymore).
            dimred = self.param(
                "dimred",
                _normal_init(1.0 / jnp.sqrt(feature_size)),
                (feature_size, cfg.netvlad_dimred),
                jnp.dtype(cfg.param_dtype),
            )
            frames = jnp.matmul(
                frames.astype(dtype),
                dimred.astype(dtype),
                preferred_element_type=jnp.float32,
            )
            feature_size = cfg.netvlad_dimred

        cluster_size = self._cluster_size()
        if feature_size > 128:
            rgb_dim = min(1024, feature_size)
            video_mod = self._pool_module(rgb_dim, max_frames, cluster_size)
            pooled_video = video_mod(frames[:, :, :rgb_dim].astype(dtype), training=training)
            if feature_size > rgb_dim:
                audio_mod = self._pool_module(
                    feature_size - rgb_dim, max_frames, max(cluster_size // 2, 1)
                )
                pooled_audio = audio_mod(
                    frames[:, :, rgb_dim:].astype(dtype), training=training
                )
                pooled = jnp.concatenate([pooled_video, pooled_audio], axis=1)
            else:
                pooled = pooled_video
        else:
            mod = self._pool_module(feature_size, max_frames, cluster_size)
            pooled = mod(frames.astype(dtype), training=training)

        return self._lf_tail(
            pooled,
            cluster_size=cluster_size,
            hidden_size=self._hidden_size(),
            add_batch_norm=add_bn,
            relu=self._relu(),
            training=training,
        )


@register_model
class NetVLADModelLF(_LoupeLFBase):
    """Gated NetVLAD, late feature fusion
    (ref: frame_level_models.py#NetVLADModelLF).

    BASELINE config 4 "Willow": cluster_size=256 (audio 128), hidden 1024,
    BN on, relu off, context gating on, MoE head.  The NetVLAD blocks are the
    Pallas-fusion target (ops/netvlad_pallas.py) on the inference path.
    """

    def _pool_module(self, feature_size, max_frames, cluster_size):
        cfg = self.cfg
        return NetVLAD(
            feature_size=feature_size,
            max_frames=max_frames,
            cluster_size=cluster_size,
            add_batch_norm=cfg.netvlad_add_batch_norm,
            fused_aggregation=cfg.fused_train_aggregation,
            dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype),
        )

    def _cluster_size(self):
        return self.cfg.netvlad_cluster_size

    def _hidden_size(self):
        return self.cfg.netvlad_hidden_size

    def _relu(self):
        return self.cfg.netvlad_relu

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        return self._lf_forward(model_input, num_frames, training)


@register_model
class NetRVLADModelLF(_LoupeLFBase):
    """NetVLAD without center subtraction (ref: NetRVLAD 'residual-less')."""

    def _pool_module(self, feature_size, max_frames, cluster_size):
        cfg = self.cfg
        return NetRVLAD(
            feature_size=feature_size,
            max_frames=max_frames,
            cluster_size=cluster_size,
            add_batch_norm=cfg.netvlad_add_batch_norm,
            fused_aggregation=cfg.fused_train_aggregation,
            dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype),
        )

    def _cluster_size(self):
        return self.cfg.rvlad_cluster_size

    def _hidden_size(self):
        return self.cfg.netvlad_hidden_size

    def _relu(self):
        return self.cfg.netvlad_relu

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        return self._lf_forward(model_input, num_frames, training)


@register_model
class NetFVModelLF(_LoupeLFBase):
    """Net Fisher Vector model (ref: frame_level_models.py#NetFVModelLF)."""

    def _pool_module(self, feature_size, max_frames, cluster_size):
        cfg = self.cfg
        return NetFV(
            feature_size=feature_size,
            max_frames=max_frames,
            cluster_size=cluster_size,
            add_batch_norm=cfg.netvlad_add_batch_norm,
            couple_weights=cfg.fv_couple_weights,
            coupling_factor=cfg.fv_coupling_factor,
            dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype),
        )

    def _cluster_size(self):
        return self.cfg.fv_cluster_size

    def _hidden_size(self):
        return self.cfg.fv_hidden_size

    def _relu(self):
        return self.cfg.fv_relu

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        return self._lf_forward(model_input, num_frames, training)


@register_model
class SoftDbofModelLF(_LoupeLFBase):
    """Soft bag-of-words model (ref: frame_level_models.py#SoftDbofModelLF)."""

    def _pool_module(self, feature_size, max_frames, cluster_size):
        cfg = self.cfg
        return SoftDBoW(
            feature_size=feature_size,
            max_frames=max_frames,
            cluster_size=cluster_size,
            add_batch_norm=cfg.netvlad_add_batch_norm,
            dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype),
        )

    def _cluster_size(self):
        return self.cfg.dbow_cluster_size

    def _hidden_size(self):
        return self.cfg.netvlad_hidden_size

    def _relu(self):
        return self.cfg.netvlad_relu

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        return self._lf_forward(model_input, num_frames, training)


@register_model
class NeXtVLADModel(_LoupeLFBase):
    """NeXtVLAD pooling (rebuild bonus; Lin et al. arXiv:1811.05014 — the
    2018 YT-8M challenge winner's aggregator, listed as the quality upper
    reference in PAPERS.md/BASELINE.md).  Group-attention VLAD per modality
    behind the same gated-MoE tail as the LOUPE family."""

    def _pool_module(self, feature_size, max_frames, cluster_size):
        import logging

        cfg = self.cfg
        if cfg.nextvlad_groups < 1:
            raise ValueError(
                f"--nextvlad_groups must be >= 1, got {cfg.nextvlad_groups}"
            )
        groups = cfg.nextvlad_groups
        # G must divide λD; fall back to the largest divisor <= the request
        # (tiny test widths), and SAY so — silent architecture changes are
        # worse than a log line (review finding)
        while (cfg.nextvlad_expansion * feature_size) % groups:
            groups -= 1
        if groups != cfg.nextvlad_groups:
            logging.getLogger(__name__).warning(
                "NeXtVLAD: groups adjusted %d -> %d so it divides "
                "expansion*feature_size = %d",
                cfg.nextvlad_groups, groups,
                cfg.nextvlad_expansion * feature_size,
            )
        return NeXtVLAD(
            feature_size=feature_size,
            max_frames=max_frames,
            cluster_size=cluster_size,
            groups=groups,
            expansion=cfg.nextvlad_expansion,
            add_batch_norm=cfg.netvlad_add_batch_norm,
            dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype),
        )

    def _cluster_size(self):
        return self.cfg.nextvlad_cluster_size

    def _hidden_size(self):
        return self.cfg.nextvlad_hidden_size

    def _relu(self):
        return self.cfg.netvlad_relu

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        return self._lf_forward(model_input, num_frames, training)
