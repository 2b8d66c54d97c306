"""Autoregressive Transformer decoder (reference
funasr/models/transformer/decoder.py ``TransformerDecoder``).

embed + scaled positional encoding -> N x (causal self-attn, cross-attn,
FFN) pre-norm -> after_norm -> output projection.  ``__call__`` scores whole
padded target grids (teacher forcing and in-loop beam rescoring both reuse
it; the beam loop recomputes prefixes each step — simple, static shapes,
and at ASR target lengths the L^2 cost is negligible next to the encoder).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.models.sanm import LayerNormF32, PositionwiseFeedForward, masked_softmax
from funasr_tpu.ops.masks import key_mask, sequence_mask
from funasr_tpu.ops.posenc import transformer_encoding
from funasr_tpu.registry import tables

Dtype = Any


class MultiHeadAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, mask, deterministic: bool = True):
        B, Tq, _ = q_in.shape
        Tk = kv_in.shape[1]
        d_k = self.n_feat // self.n_head
        q = nn.Dense(self.n_feat, name="linear_q", dtype=self.dtype,
                     param_dtype=self.param_dtype)(q_in)
        k = nn.Dense(self.n_feat, name="linear_k", dtype=self.dtype,
                     param_dtype=self.param_dtype)(kv_in)
        v = nn.Dense(self.n_feat, name="linear_v", dtype=self.dtype,
                     param_dtype=self.param_dtype)(kv_in)
        H = self.n_head
        # merged (B*H) 3D matmuls (fewer TPU layout copies than 4D einsum)
        q2 = (q.reshape(B, Tq, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, Tq, d_k)) * (d_k ** -0.5)
        k2 = (k.reshape(B, Tk, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, Tk, d_k))
        v2 = (v.reshape(B, Tk, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, Tk, d_k))
        scores = jnp.einsum("bqd,bkd->bqk", q2, k2).reshape(B, H, Tq, Tk)
        attn = masked_softmax(scores, None if mask is None else mask)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bqk,bkd->bqd",
                         attn.reshape(B * H, Tq, Tk).astype(v2.dtype), v2)
        ctx = (ctx.reshape(B, H, Tq, d_k).transpose(0, 2, 1, 3)
               .reshape(B, Tq, self.n_feat))
        return nn.Dense(self.n_feat, name="linear_out", dtype=self.dtype,
                        param_dtype=self.param_dtype)(ctx)


class TransformerDecoderLayer(nn.Module):
    size: int
    n_head: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs, deterministic: bool = True):
        tgt_mask, memory, memory_mask = inputs  # (B,1,U,U), (B,T,D), (B,1,1,T)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(x)
        h = MultiHeadAttention(self.n_head, self.size,
                               self.self_attention_dropout_rate,
                               self.dtype, self.param_dtype, name="self_attn"
                               )(h, h, tgt_mask, deterministic)
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm2")(x)
        h = MultiHeadAttention(self.n_head, self.size,
                               self.src_attention_dropout_rate,
                               self.dtype, self.param_dtype, name="src_attn"
                               )(h, memory, memory_mask, deterministic)
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm3")(x)
        h = PositionwiseFeedForward(self.linear_units, self.size,
                                    self.dropout_rate, self.dtype,
                                    self.param_dtype, name="feed_forward"
                                    )(h, deterministic)
        return res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic), None


@tables.register("decoder_classes", "TransformerDecoder")
class TransformerDecoder(nn.Module):
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, memory_lengths, ys_in, ys_in_lengths,
                 deterministic: bool = True):
        """memory (B,T,D); ys_in (B,U) with sos prepended.
        Returns logits (B, U, V)."""
        B, U = ys_in.shape
        T = memory.shape[1]
        d = self.encoder_output_size
        x = nn.Embed(self.vocab_size, d, name="embed",
                     dtype=self.dtype, param_dtype=self.param_dtype)(ys_in)
        pe = transformer_encoding(U, d)
        x = x * (d ** 0.5) + pe[None].astype(x.dtype)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        # causal + pad mask: (B, 1, U, U)
        causal = jnp.tril(jnp.ones((U, U), jnp.float32))[None, None]
        pad = sequence_mask(ys_in_lengths, U, jnp.float32)[:, None, None, :]
        tgt_mask = causal * pad
        memory_mask = key_mask(memory_lengths, T, jnp.float32)[:, None, :, :]

        Stack = nn.scan(
            TransformerDecoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(
            d, self.attention_heads, self.linear_units, self.dropout_rate,
            self.self_attention_dropout_rate, self.src_attention_dropout_rate,
            self.dtype, self.param_dtype, name="decoders",
        )(x, (tgt_mask, memory.astype(self.dtype), memory_mask), deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        return nn.Dense(self.vocab_size, name="output_layer",
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)


class RWKVDecoderLayer(nn.Module):
    """Decoder layer with an RWKV time-mix in place of causal self-attention
    (reference funasr/models/conformer_rwkv/decoder.py:37 ``DecoderLayer``,
    which swaps MultiHeadedAttention for ``RWKV_TimeMix``).

    The WKV recurrence is causal by construction, so no subsequent mask is
    needed; padding tokens sit after the valid prefix and cannot leak
    backwards through the scan.  Cross-attention and the FFN are the
    standard transformer blocks.
    """

    size: int
    n_head: int
    linear_units: int
    dropout_rate: float = 0.1
    src_attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs, deterministic: bool = True):
        from funasr_tpu.models.rwkv import TimeMix

        tgt_mask, memory, memory_mask = inputs
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(x)
        h = TimeMix(self.size, param_dtype=self.param_dtype,
                    name="self_attn")(h).astype(x.dtype)
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm2")(x)
        h = MultiHeadAttention(self.n_head, self.size,
                               self.src_attention_dropout_rate,
                               self.dtype, self.param_dtype, name="src_attn"
                               )(h, memory, memory_mask, deterministic)
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm3")(x)
        h = PositionwiseFeedForward(self.linear_units, self.size,
                                    self.dropout_rate, self.dtype,
                                    self.param_dtype, name="feed_forward"
                                    )(h, deterministic)
        return res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic), None


@tables.register("decoder_classes", "TransformerRWKVDecoder")
class TransformerRWKVDecoder(nn.Module):
    """AR decoder whose self-attention is the RWKV WKV recurrence
    (reference funasr/models/conformer_rwkv/decoder.py:379
    ``TransformerRWKVDecoder``; select with ``decoder:
    TransformerRWKVDecoder`` in a hybrid config = the reference's
    conformer_rwkv model).  Same call contract as ``TransformerDecoder``."""

    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, memory_lengths, ys_in, ys_in_lengths,
                 deterministic: bool = True):
        B, U = ys_in.shape
        T = memory.shape[1]
        d = self.encoder_output_size
        x = nn.Embed(self.vocab_size, d, name="embed",
                     dtype=self.dtype, param_dtype=self.param_dtype)(ys_in)
        pe = transformer_encoding(U, d)
        x = x * (d ** 0.5) + pe[None].astype(x.dtype)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        memory_mask = key_mask(memory_lengths, T, jnp.float32)[:, None, :, :]
        Stack = nn.scan(
            RWKVDecoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(
            d, self.attention_heads, self.linear_units, self.dropout_rate,
            self.src_attention_dropout_rate,
            self.dtype, self.param_dtype, name="decoders",
        )(x, (None, memory.astype(self.dtype), memory_mask), deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        return nn.Dense(self.vocab_size, name="output_layer",
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)
