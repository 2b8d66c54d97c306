"""Contextual Paraformer decoder (reference
funasr/models/contextual_paraformer/decoder.py:115
``ContextualParaformerDecoder``).

Structure vs the plain ParaformerSANMDecoder: the LAST attention layer
(``last_decoder``, reference :24 ``ContextualDecoderLayer``) exposes its
post-self-FSMN hidden (x_self_attn) and its raw cross-attention output
(x_src_attn, pre-residual); a bias cross-attention (``bias_decoder``,
reference :88 ``ContextualBiasDecoder``) attends x_self_attn into the
hotword memory; the two contexts concatenate at hidden width through a
1x1 conv (``bias_output``, Conv1d(2D->D, bias=False), reference :209,299)
and re-enter the residual stream before decoders3.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.paraformer.decoder import (
    CrossAttention,
    DecoderLayerSANM,
    FeedForwardDecoderSANM,
    FsmnSelfAttention,
)
from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.ops.masks import key_mask, sequence_mask
from funasr_tpu.ops.quant import QDense
from funasr_tpu.registry import tables

Dtype = Any


class ContextualDecoderLayer(nn.Module):
    """DecoderLayerSANM that also returns (x_self_attn, x_src_attn)
    (reference decoder.py:24,55-86)."""

    size: int
    n_head: int
    linear_units: int
    kernel_size: int = 11
    sanm_shift: int = 0
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, tgt_mask, memory, memory_mask,
                 deterministic: bool = True):
        residual = tgt
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(tgt)
        h = FeedForwardDecoderSANM(
            self.linear_units, self.size, self.dropout_rate,
            self.dtype, self.param_dtype, name="feed_forward",
        )(h, deterministic)

        h2 = LayerNormF32(self.dtype, self.param_dtype, name="norm2")(h)
        x = FsmnSelfAttention(
            self.size, self.kernel_size, self.sanm_shift, 0.0,
            self.dtype, self.param_dtype, name="self_attn",
        )(h2, tgt_mask, deterministic)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = residual + x
        x_self_attn = x

        residual = x
        h3 = LayerNormF32(self.dtype, self.param_dtype, name="norm3")(x)
        s = CrossAttention(
            self.n_head, self.size, 0.0, self.dtype, self.param_dtype,
            name="src_attn",
        )(h3, memory, memory_mask, deterministic)
        x_src_attn = s  # raw cross-attn output, pre-residual (reference :84)
        x = residual + nn.Dropout(self.dropout_rate)(
            s, deterministic=deterministic)
        return x, x_self_attn, x_src_attn


@tables.register("decoder_classes", "ContextualParaformerDecoder")
class ContextualParaformerSANMDecoder(nn.Module):
    """ParaformerSANMDecoder with the hotword-bias branch on the last
    attention layer (reference decoder.py:252 ``forward``)."""

    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    att_layer_num: int = 6
    kernel_size: int = 11
    sanm_shift: int = 0
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    use_output_layer: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        d = self.encoder_output_size
        self.embed = nn.Embed(self.vocab_size, d, name="embed",
                              param_dtype=self.param_dtype, dtype=self.dtype)
        if self.att_layer_num > 1:
            self.decoders = nn.scan(
                DecoderLayerSANM,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.att_layer_num - 1,
                in_axes=(nn.broadcast, nn.broadcast),
            )(
                d, self.attention_heads, self.linear_units, self.kernel_size,
                self.sanm_shift, self.dropout_rate,
                self.self_attention_dropout_rate,
                self.src_attention_dropout_rate,
                True, True, self.dtype, self.param_dtype, name="decoders",
            )
        else:  # the last (contextual) layer is the only attention layer
            self.decoders = None
        self.last_decoder = ContextualDecoderLayer(
            d, self.attention_heads, self.linear_units, self.kernel_size,
            self.sanm_shift, self.dropout_rate, self.dtype, self.param_dtype,
            name="last_decoder",
        )
        # ContextualBiasDecoder: norm3 + cross-attn into the hotword memory
        self.bias_norm = LayerNormF32(self.dtype, self.param_dtype,
                                      name="bias_norm")
        self.bias_decoder = CrossAttention(
            self.attention_heads, d, 0.0, self.dtype, self.param_dtype,
            name="bias_decoder",
        )
        # Conv1d(2D -> D, kernel 1, no bias) == Dense without bias
        self.bias_output = nn.Dense(d, use_bias=False, name="bias_output",
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        self.decoders3 = DecoderLayerSANM(
            d, self.attention_heads, self.linear_units, self.kernel_size,
            self.sanm_shift, self.dropout_rate,
            self.self_attention_dropout_rate, self.src_attention_dropout_rate,
            False, False, self.dtype, self.param_dtype, name="decoders3",
        )
        self.dropout = nn.Dropout(self.dropout_rate)
        self.after_norm = LayerNormF32(self.dtype, self.param_dtype,
                                       name="after_norm")
        if self.use_output_layer:
            self.output_layer = QDense(self.vocab_size, name="output_layer",
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype)

    def __call__(
        self,
        memory: jnp.ndarray,  # (B, T, D)
        memory_lengths: jnp.ndarray,
        semantic_embeds: jnp.ndarray,  # (B, U, D)
        token_lengths: jnp.ndarray,
        deterministic: bool = True,
        return_hidden: bool = False,
        contextual_info: Optional[jnp.ndarray] = None,  # (B, H, D)
        clas_scale: float = 1.0,
    ):
        B, U, _ = semantic_embeds.shape
        T = memory.shape[1]
        tgt_mask = sequence_mask(token_lengths, U,
                                 dtype=jnp.float32)[:, :, None]
        memory_mask = key_mask(memory_lengths, T, dtype=jnp.float32)

        x = semantic_embeds.astype(self.dtype)
        inputs = (tgt_mask, memory.astype(self.dtype), memory_mask)
        if self.decoders is not None:
            x, _ = self.decoders(x, inputs, deterministic)
        x, x_self, x_src = self.last_decoder(
            x, tgt_mask, memory.astype(self.dtype), memory_mask,
            deterministic)

        if contextual_info is not None:
            cx = self.bias_decoder(
                self.bias_norm(x_self), contextual_info.astype(self.dtype),
                None, deterministic)
            cx = self.dropout(cx, deterministic=deterministic)
            merged = self.bias_output(
                jnp.concatenate([x_src, cx * clas_scale], axis=-1))
            merged = self.dropout(merged, deterministic=deterministic)
            x = x_self + merged  # reference decoder.py:299-301

        x, _ = self.decoders3(x, inputs, deterministic)
        hidden = self.after_norm(x)
        if self.use_output_layer and not return_hidden:
            return self.output_layer(hidden)
        return hidden

    def project(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return self.output_layer(hidden)

    def embed_tokens(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed(ids)
