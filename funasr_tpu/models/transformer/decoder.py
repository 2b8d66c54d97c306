"""Autoregressive Transformer decoder (reference
funasr/models/transformer/decoder.py ``TransformerDecoder``).

embed + scaled positional encoding -> N x (causal self-attn, cross-attn,
FFN) pre-norm -> after_norm -> output projection.  ``__call__`` scores whole
padded target grids (teacher forcing); beam decoding scores incrementally
through the KV-cached step scorer over this module's param tree
(ops/cached_decoder.py — reference decoder.py:291 ``forward_one_step``
semantics, exact-parity tested).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.ops.quant import QDense
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
        q = QDense(self.n_feat, name="linear_q", dtype=self.dtype,
                     param_dtype=self.param_dtype)(q_in)
        k = QDense(self.n_feat, name="linear_k", dtype=self.dtype,
                     param_dtype=self.param_dtype)(kv_in)
        v = QDense(self.n_feat, name="linear_v", dtype=self.dtype,
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
        return QDense(self.n_feat, name="linear_out", dtype=self.dtype,
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
        return QDense(self.vocab_size, name="output_layer",
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
        return QDense(self.vocab_size, name="output_layer",
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)


class LightweightConvolution(nn.Module):
    """Lightweight (weight-shared, softmax-normalized) convolution
    (reference transformer/utils/lightconv.py:12, fairseq-style): Dense(2C)
    -> GLU -> depthwise conv whose per-head kernels are softmaxed (causal
    taps only when ``use_kernel_mask``) -> Dense.  ``freq2d`` adds the 2D
    variant's frequency-axis conv with a shared softmaxed kernel and a
    Dense(2C -> C) output (lightconv2d.py:12)."""

    wshare: int
    n_feat: int
    kernel_size: int
    use_kernel_mask: bool = True
    use_bias: bool = False
    dropout_rate: float = 0.0
    freq2d: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_mask=None, deterministic: bool = True):
        B, T, C = x.shape
        H, k = self.wshare, self.kernel_size
        h = QDense(2 * C, name="linear1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU

        w = self.param("weight", nn.initializers.uniform(1.0), (H, k),
                       self.param_dtype).astype(jnp.float32)
        if not deterministic and self.dropout_rate > 0.0:
            # reference lightconv.py:92: dropout on the kernel weights
            # BEFORE the masked softmax during training
            keep_p = 1.0 - self.dropout_rate
            drop = jax.random.bernoulli(self.make_rng("dropout"), keep_p,
                                        w.shape)
            w = jnp.where(drop, w / keep_p, 0.0)
        if self.use_kernel_mask:
            # keep taps 0..k//2 (past + current; conv pad k//2 => causal)
            keep = jnp.arange(k) < (k // 2 + 1)
            w = jnp.where(keep[None], w, -jnp.inf)
        w = jax.nn.softmax(w, axis=-1)
        # channel c uses head kernel c % H (torch view(-1, H, T) grouping)
        kern = w.T[:, None, :]  # (k, 1, H)
        kern = jnp.tile(kern, (1, 1, C // H)).reshape(k, 1, C)
        from funasr_tpu.ops.dwconv import depthwise_conv1d

        y = depthwise_conv1d(h.astype(jnp.float32), kern,
                             k // 2, k // 2)[:, :T]
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (C,),
                               self.param_dtype)
        if time_mask is not None and not self.use_kernel_mask:
            y = y * time_mask
        if self.freq2d:
            wf = self.param("weight_f", nn.initializers.uniform(1.0), (k,),
                            self.param_dtype).astype(jnp.float32)
            wf = jax.nn.softmax(wf)
            xf = lax.conv_general_dilated(
                h.astype(jnp.float32).reshape(B * T, C, 1),
                wf[:, None, None], (1,), [(k // 2, k // 2)],
                dimension_numbers=("NHC", "HIO", "NHC"),
            ).reshape(B, T, C)
            y = jnp.concatenate([y, xf], axis=-1)
        return QDense(C, name="linear2", dtype=self.dtype,
                        param_dtype=self.param_dtype)(y.astype(x.dtype))


class DynamicConvolution(nn.Module):
    """Dynamic convolution (reference transformer/utils/dynamic_conv.py:12):
    per-position kernels predicted from the input, realized as a banded
    (width-k) softmax attention — on TPU the band is built with iota masks
    and the apply is a plain batched matmul.  ``freq2d`` adds the 2D
    variant's per-position frequency conv (dynamic_conv2d.py:12)."""

    wshare: int
    n_feat: int
    kernel_size: int
    use_kernel_mask: bool = True
    use_bias: bool = False
    dropout_rate: float = 0.0
    freq2d: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_mask=None, deterministic: bool = True):
        B, T, C = x.shape
        H, k = self.wshare, self.kernel_size
        h = QDense(2 * C, name="linear1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)

        w = QDense(H * k, name="linear_weight", use_bias=True,
                     dtype=self.dtype, param_dtype=self.param_dtype)(h)
        w = w.reshape(B, T, H, k).astype(jnp.float32)
        if not deterministic and self.dropout_rate > 0.0:
            # reference dynamic_conv.py:93 weight dropout during training
            keep_p = 1.0 - self.dropout_rate
            drop = jax.random.bernoulli(self.make_rng("dropout"), keep_p,
                                        w.shape)
            w = jnp.where(drop, w / keep_p, 0.0)
        # banded scores: score[b,h,t,s] = w[b,t,h, s - t + (k-1)//2]
        t_pos = jnp.arange(T)[:, None]
        s_pos = jnp.arange(T)[None, :]
        j = s_pos - t_pos + (k - 1) // 2  # (T, T)
        in_band = (j >= 0) & (j < k)
        jc = jnp.clip(j, 0, k - 1)
        scores = jnp.take_along_axis(
            jnp.transpose(w, (0, 2, 1, 3)),  # (B, H, T, k)
            jnp.broadcast_to(jc[None, None], (B, H, T, T)), axis=-1)
        scores = jnp.where(in_band[None, None], scores, -jnp.inf)
        if self.use_kernel_mask:
            scores = jnp.where((s_pos <= t_pos)[None, None], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1)
        # heads are contiguous channel blocks (torch view(B*H, C/H, T))
        xh = h.astype(jnp.float32).reshape(B, T, H, C // H)
        y = jnp.einsum("bhts,bshd->bthd", attn, xh).reshape(B, T, C)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (C,),
                               self.param_dtype)
        if time_mask is not None and not self.use_kernel_mask:
            y = y * time_mask
        if self.freq2d:
            wf = QDense(k, name="linear_weight_f", dtype=self.dtype,
                          param_dtype=self.param_dtype)(h).astype(jnp.float32)
            # per-(b,t) kernel over the feature axis: k shifted FMAs,
            # xf[..., c] = sum_j wf[..., j] * h[..., c + j - k//2]
            hf = h.astype(jnp.float32)
            xf = jnp.zeros_like(hf)
            for j in range(k):
                s = j - k // 2
                if s >= 0:
                    shifted = jnp.pad(hf[..., s:], ((0, 0), (0, 0), (0, s)))
                else:
                    shifted = jnp.pad(hf[..., :s], ((0, 0), (0, 0), (-s, 0)))
                xf = xf + wf[..., j:j + 1] * shifted
            y = jnp.concatenate([y, xf], axis=-1)
        return QDense(C, name="linear2", dtype=self.dtype,
                        param_dtype=self.param_dtype)(y.astype(x.dtype))


class _ConvDecoderLayer(nn.Module):
    """Decoder layer whose self-attention is a light/dynamic convolution
    (reference transformer/decoder.py:416-655 conv decoder families)."""

    size: int
    n_head: int
    linear_units: int
    conv_kind: str
    conv_wshare: int
    kernel_size: int
    conv_usebias: bool = False
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, memory_mask, deterministic: bool = True):
        kw = dict(wshare=self.conv_wshare, n_feat=self.size,
                  kernel_size=self.kernel_size, use_kernel_mask=True,
                  use_bias=self.conv_usebias,
                  dropout_rate=self.self_attention_dropout_rate,
                  freq2d=self.conv_kind.endswith("2d"),
                  dtype=self.dtype, param_dtype=self.param_dtype,
                  name="self_attn")
        conv_cls = (LightweightConvolution
                    if self.conv_kind.startswith("light")
                    else DynamicConvolution)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(x)
        h = conv_cls(**kw)(h, None, deterministic)
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
        return res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)


class _ConvTransformerDecoder(nn.Module):
    """Shared body of the conv-decoder families; per-layer kernel lengths
    (``conv_kernel_length``) follow the reference's per-layer construction,
    so layers are built in a Python loop rather than nn.scan."""

    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    conv_wshare: int = 4
    conv_kernel_length: Any = (11, 11, 11, 11, 11, 11)
    conv_usebias: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    conv_kind: str = "light"  # light | light2d | dynamic | dynamic2d

    @nn.compact
    def __call__(self, memory, memory_lengths, ys_in, ys_in_lengths,
                 deterministic: bool = True):
        if len(self.conv_kernel_length) < self.num_blocks:
            raise ValueError("conv_kernel_length must cover num_blocks")
        B, U = ys_in.shape
        T = memory.shape[1]
        d = self.encoder_output_size
        x = nn.Embed(self.vocab_size, d, name="embed",
                     dtype=self.dtype, param_dtype=self.param_dtype)(ys_in)
        pe = transformer_encoding(U, d)
        x = x * (d ** 0.5) + pe[None].astype(x.dtype)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        memory_mask = key_mask(memory_lengths, T, jnp.float32)[:, None, :, :]
        for i in range(self.num_blocks):
            x = _ConvDecoderLayer(
                d, self.attention_heads, self.linear_units, self.conv_kind,
                self.conv_wshare, self.conv_kernel_length[i],
                self.conv_usebias, self.dropout_rate,
                self.self_attention_dropout_rate,
                self.src_attention_dropout_rate,
                self.dtype, self.param_dtype, name=f"decoders_{i}",
            )(x, memory.astype(self.dtype), memory_mask, deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        return QDense(self.vocab_size, name="output_layer",
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)


@tables.register("decoder_classes", "LightweightConvolutionTransformerDecoder")
class LightweightConvolutionTransformerDecoder(_ConvTransformerDecoder):
    """reference transformer/decoder.py:417"""
    conv_kind: str = "light"


@tables.register("decoder_classes", "LightweightConvolution2DTransformerDecoder")
class LightweightConvolution2DTransformerDecoder(_ConvTransformerDecoder):
    """reference transformer/decoder.py:477"""
    conv_kind: str = "light2d"


@tables.register("decoder_classes", "DynamicConvolutionTransformerDecoder")
class DynamicConvolutionTransformerDecoder(_ConvTransformerDecoder):
    """reference transformer/decoder.py:537"""
    conv_kind: str = "dynamic"


@tables.register("decoder_classes", "DynamicConvolution2DTransformerDecoder")
class DynamicConvolution2DTransformerDecoder(_ConvTransformerDecoder):
    """reference transformer/decoder.py:597"""
    conv_kind: str = "dynamic2d"
