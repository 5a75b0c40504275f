"""Attention / transformer pooling (the repo's paper contribution).

(ref: attention_modules.py — MultiHeadAttention / TransformerEncoder blocks
and their frame_level_models.py wrappers; arXiv:1810.00530 "Learnable Pooling
Methods for Video Classification".  Exact reference class names are
[M]-confidence per SURVEY.md §2.2 — the capability set implemented here is:
multi-head self-attention over the ≤300-frame sequence, transformer-encoder
blocks (MHA + FFN + LN/residual), attention-weighted pooling, and
attention-enhanced NetVLAD, all feeding the shared gating+MoE tail.)

TPU notes: attention over ≤300 tokens is trivially single-chip (SURVEY.md
§5.7) — no ring/blockwise machinery.  Padding frames are excluded with an
additive mask; all shapes static.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from learnablepoolingmethods_tpu.models import model_utils
from learnablepoolingmethods_tpu.models.base import register_model
from learnablepoolingmethods_tpu.models.frame_level import _FrameModelBase
from learnablepoolingmethods_tpu.models.modules import NetVLAD


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder block: MHA + FFN with residuals."""

    num_heads: int
    ff_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, training: bool = False):
        d_model = x.shape[-1]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout_rate,
            deterministic=not training,
            name="mha",
        )(x, x, mask=mask)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x + attn)
        ff = nn.Dense(self.ff_size, dtype=self.dtype, name="ff1")(x)
        ff = nn.relu(ff)
        ff = nn.Dense(d_model, dtype=self.dtype, name="ff2")(ff)
        ff = nn.Dropout(rate=self.dropout_rate, deterministic=not training)(ff)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x + ff)
        return x


class TransformerEncoder(nn.Module):
    """Stack of encoder layers over the frame axis."""

    num_layers: int
    num_heads: int
    ff_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, training: bool = False):
        # pad_mask: [B, F] 1=valid → attention mask [B, 1, F, F]
        attn_mask = None
        if pad_mask is not None:
            attn_mask = pad_mask[:, None, None, :] * jnp.ones(
                (1, 1, x.shape[1], 1), pad_mask.dtype
            )
            attn_mask = attn_mask > 0
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                num_heads=self.num_heads,
                ff_size=self.ff_size,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, mask=attn_mask, training=training)
        return x


class AttentionPooling(nn.Module):
    """Learned-query attention pooling ("indirect clustering").

    ``num_queries`` learned vectors attend over the frame sequence; their
    attended values concatenate into one fixed descriptor [B, Q·D].
    """

    num_queries: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask=None, training: bool = False):
        b, _, d = x.shape
        queries = self.param(
            "queries", nn.initializers.normal(stddev=1.0 / jnp.sqrt(d)),
            (self.num_queries, d), jnp.float32,
        )
        q = jnp.broadcast_to(queries[None], (b, self.num_queries, d)).astype(x.dtype)
        attn_mask = None
        if pad_mask is not None:
            attn_mask = (pad_mask[:, None, None, :] > 0) & jnp.ones(
                (1, 1, self.num_queries, 1), bool
            )
        pooled = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, deterministic=True, name="pool_mha"
        )(q, x, mask=attn_mask)
        return pooled.reshape(b, self.num_queries * d)


@register_model
class TransformerEncoderModel(_FrameModelBase):
    """Transformer-encoder pooling (BASELINE config 5).

    input proj → N encoder blocks (masked) → masked mean pooling → shared
    tail (hidden FC + gating + video-level classifier).
    """

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        x = model_input.astype(dtype)
        f = x.shape[1]
        pad_mask = model_utils.frame_mask(num_frames, f, dtype=jnp.float32)

        d_model = cfg.attention_hidden_size
        x = nn.Dense(d_model, dtype=dtype, name="input_proj")(x)
        x = TransformerEncoder(
            num_layers=cfg.transformer_layers,
            num_heads=cfg.attention_heads,
            ff_size=cfg.transformer_ff_size,
            dropout_rate=cfg.attention_dropout,
            dtype=dtype,
            name="encoder",
        )(x, pad_mask=pad_mask, training=training)

        denom = jnp.maximum(jnp.sum(pad_mask, axis=1, keepdims=True), 1.0)
        pooled = jnp.sum(x.astype(jnp.float32) * pad_mask[:, :, None], axis=1) / denom

        return self._lf_tail(
            pooled.astype(dtype),
            cluster_size=d_model,
            hidden_size=cfg.attention_hidden_size,
            add_batch_norm=cfg.netvlad_add_batch_norm,
            relu=False,
            training=training,
        )


@register_model
class AttentionPoolingModel(_FrameModelBase):
    """Multi-head learned-query attention pooling over frames."""

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        x = model_input.astype(dtype)
        f = x.shape[1]
        pad_mask = model_utils.frame_mask(num_frames, f, dtype=jnp.float32)

        d_model = cfg.attention_hidden_size
        x = nn.Dense(d_model, dtype=dtype, name="input_proj")(x)
        pooled = AttentionPooling(
            num_queries=cfg.attention_cluster_size,
            num_heads=cfg.attention_heads,
            dtype=dtype,
            name="attn_pool",
        )(x, pad_mask=pad_mask, training=training)

        return self._lf_tail(
            pooled.astype(dtype),
            cluster_size=cfg.attention_cluster_size,
            hidden_size=cfg.attention_hidden_size,
            add_batch_norm=cfg.netvlad_add_batch_norm,
            relu=False,
            training=training,
        )


@register_model
class AttentionNetVLADModel(_FrameModelBase):
    """Transformer-contextualized NetVLAD (paper: encoder before clustering).

    Encoder blocks refine frame features, then NetVLAD aggregates the
    contextualized sequence; shared gated tail.
    """

    @nn.compact
    def __call__(self, model_input, num_frames=None, training: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        x = model_input.astype(dtype)
        f = x.shape[1]
        pad_mask = model_utils.frame_mask(num_frames, f, dtype=jnp.float32)

        d_model = cfg.attention_hidden_size
        x = nn.Dense(d_model, dtype=dtype, name="input_proj")(x)
        x = TransformerEncoder(
            num_layers=cfg.transformer_layers,
            num_heads=cfg.attention_heads,
            ff_size=cfg.transformer_ff_size,
            dropout_rate=cfg.attention_dropout,
            dtype=dtype,
            name="encoder",
        )(x, pad_mask=pad_mask, training=training)
        # zero out padding before clustering so pads don't pollute assignments
        x = x * pad_mask[:, :, None].astype(x.dtype)

        vlad = NetVLAD(
            feature_size=d_model,
            max_frames=f,
            cluster_size=cfg.netvlad_cluster_size,
            add_batch_norm=cfg.netvlad_add_batch_norm,
            dtype=dtype,
            param_dtype=jnp.dtype(cfg.param_dtype),
            name="vlad",
        )(x, training=training)

        return self._lf_tail(
            vlad,
            cluster_size=cfg.netvlad_cluster_size,
            hidden_size=cfg.netvlad_hidden_size,
            add_batch_norm=cfg.netvlad_add_batch_norm,
            relu=cfg.netvlad_relu,
            training=training,
        )
