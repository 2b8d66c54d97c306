"""Conformer encoder (reference funasr/models/conformer/encoder.py:287).

Layer: 0.5x macaron FFN -> rel-pos MHA (Transformer-XL style, pos_bias_u/v +
rel_shift) -> conv module (pointwise-GLU -> depthwise -> BatchNorm -> swish
-> pointwise) -> 0.5x FFN -> final LN, all pre-norm with residuals.

Subsampling: Conv2dSubsampling x4 (two stride-2 Conv2d + linear,
transformer/utils/subsampling.py).

TPU notes: the rel-shift is a pad/reshape/slice (no gather); BatchNorm
running stats live in the flax ``batch_stats`` collection (training threads
them via TrainState.model_state); layers run under nn.scan.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.ops.quant import QDense
from jax import lax

from funasr_tpu.models.sanm import LayerNormF32, masked_softmax
from funasr_tpu.ops.masks import key_mask
from funasr_tpu.registry import tables

Dtype = Any


def rel_positional_encoding(length: int, d_model: int, dtype=jnp.float32):
    """espnet RelPositionalEncoding (transformer/embedding.py): positions
    T-1 .. -(T-1), interleaved sin/cos with sign-flipped sine for negative
    positions; shape (2T-1, d)."""
    pos = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(np.log(10000.0) / d_model))
    pe = np.zeros((2 * length - 1, d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe, dtype)


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) -> (B, H, T, T) Transformer-XL relative shift
    (attention.py:342)."""
    B, H, T, L = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, L + 1, T)
    x = x[:, :, 1:, :].reshape(B, H, T, L)
    return x[:, :, :, : (L // 2 + 1)][:, :, :, :T]


class RelPosMultiHeadAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask, deterministic: bool = True):
        B, T, _ = x.shape
        d_k = self.n_feat // self.n_head
        q = QDense(self.n_feat, name="linear_q", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        k = QDense(self.n_feat, name="linear_k", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        v = QDense(self.n_feat, name="linear_v", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        p = QDense(self.n_feat, use_bias=False, name="linear_pos",
                     dtype=self.dtype, param_dtype=self.param_dtype)(
            pos_emb.astype(self.dtype))
        pos_bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(),
                                (self.n_head, d_k), self.param_dtype)
        pos_bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(),
                                (self.n_head, d_k), self.param_dtype)

        H = self.n_head
        q = q.reshape(B, T, H, d_k)
        p = p.reshape(-1, H, d_k)  # (2T-1, H, dk)

        q_u = q + pos_bias_u.astype(q.dtype)
        q_v = q + pos_bias_v.astype(q.dtype)
        # merged (B*H) batched matmuls for the content term and the value
        # contraction (fewer TPU layout copies than the 4D einsum form)
        qu2 = q_u.transpose(0, 2, 1, 3).reshape(B * H, T, d_k)
        k2 = (k.reshape(B, T, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, T, d_k))
        v2 = (v.reshape(B, T, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, T, d_k))
        ac = jnp.einsum("bid,bjd->bij", qu2, k2).reshape(B, H, T, T)
        bd = jnp.einsum("bthd,lhd->bhtl", q_v, p)
        bd = rel_shift(bd)
        scores = (ac + bd) * (d_k ** -0.5)
        attn = masked_softmax(scores, None if mask is None else mask[:, None, :, :])
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bij,bjd->bid",
                         attn.reshape(B * H, T, T).astype(v2.dtype), v2)
        ctx = (ctx.reshape(B, H, T, d_k).transpose(0, 2, 1, 3)
               .reshape(B, T, self.n_feat))
        return QDense(self.n_feat, name="linear_out", dtype=self.dtype,
                        param_dtype=self.param_dtype)(ctx)


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 15
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_t=None, deterministic: bool = True):
        # NOTE: the reference ConvolutionModule (conformer/encoder.py:53)
        # does NOT mask pad frames before the depthwise conv — published
        # checkpoints bake in that boundary behavior, so we match it
        # (mask_t is accepted for API compatibility but unused).
        del mask_t
        h = QDense(2 * self.channels, name="pointwise_conv1",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        pad = (self.kernel_size - 1) // 2
        kernel = self.param("depthwise_conv", nn.initializers.lecun_normal(),
                            (self.kernel_size, 1, self.channels),
                            self.param_dtype)
        dw_bias = self.param("depthwise_conv_bias", nn.initializers.zeros,
                             (self.channels,), self.param_dtype)
        from funasr_tpu.ops.dwconv import depthwise_conv1d

        h = depthwise_conv1d(h, kernel, pad, pad) + dw_bias.astype(h.dtype)
        h = nn.BatchNorm(
            use_running_average=deterministic, name="norm",
            dtype=jnp.float32, param_dtype=self.param_dtype,
        )(h.astype(jnp.float32)).astype(self.dtype)
        h = h * nn.sigmoid(h)  # swish
        return QDense(self.channels, name="pointwise_conv2",
                        dtype=self.dtype, param_dtype=self.param_dtype)(h)


class FeedForward(nn.Module):
    hidden: int
    out: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = QDense(self.hidden, name="w_1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        h = h * nn.sigmoid(h)  # swish (conformer default)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return QDense(self.out, name="w_2", dtype=self.dtype,
                        param_dtype=self.param_dtype)(h)


class ConformerEncoderLayer(nn.Module):
    size: int
    n_head: int
    linear_units: int
    cnn_kernel: int = 15
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs, deterministic: bool = True):
        """inputs = (pos_emb, mask, mask_t); returns (x, None) for scan."""
        pos_emb, mask, mask_t = inputs
        # macaron FFN
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm_ff_macaron")(x)
        h = FeedForward(self.linear_units, self.size, self.dropout_rate,
                        self.dtype, self.param_dtype, name="feed_forward_macaron"
                        )(h, deterministic)
        x = res + 0.5 * nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        # attention
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm_mha")(x)
        h = RelPosMultiHeadAttention(
            self.n_head, self.size, self.attention_dropout_rate,
            self.dtype, self.param_dtype, name="self_attn",
        )(h, pos_emb, mask, deterministic)
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        # conv
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm_conv")(x)
        h = ConvolutionModule(self.size, self.cnn_kernel, self.dtype,
                              self.param_dtype, name="conv_module"
                              )(h, mask_t, deterministic)
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        # FFN
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm_ff")(x)
        h = FeedForward(self.linear_units, self.size, self.dropout_rate,
                        self.dtype, self.param_dtype, name="feed_forward"
                        )(h, deterministic)
        x = res + 0.5 * nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="norm_final")(x)
        return x, None


class Conv2dSubsampling(nn.Module):
    """x4 subsampling: two stride-2 3x3 Conv2d + linear
    (transformer/utils/subsampling.py Conv2dSubsampling)."""

    odim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        B, T, D = x.shape
        h = x[..., None].astype(self.dtype)  # (B, T, D, 1)
        h = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                    name="conv0", dtype=self.dtype,
                    param_dtype=self.param_dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                    name="conv1", dtype=self.dtype,
                    param_dtype=self.param_dtype)(h)
        h = nn.relu(h)
        B2, T2, F2, C = h.shape
        h = h.reshape(B2, T2, F2 * C)
        h = QDense(self.odim, name="out", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        # reference semantics: the pad mask is sliced [:-2:2][:-2:2], so a
        # subsampled frame j is valid iff original index 4j < L ->
        # olens = min(T', ceil(L / 4)) (transformer/utils/subsampling.py via
        # conformer/encoder.py mask slicing), NOT the conv arithmetic count.
        out_lengths = jnp.minimum((lengths + 3) // 4, T2)
        return h, jnp.maximum(out_lengths, 0)


@tables.register("encoder_classes", "ConformerEncoder")
class ConformerEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    cnn_module_kernel: int = 15
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, lengths, deterministic: bool = True):
        if self.input_layer == "conv2d":
            x, lengths = Conv2dSubsampling(
                self.output_size, self.dtype, self.param_dtype, name="embed"
            )(xs, lengths)
        elif self.input_layer == "linear":
            x = QDense(self.output_size, name="embed", dtype=self.dtype,
                         param_dtype=self.param_dtype)(xs.astype(self.dtype))
        else:
            raise NotImplementedError(self.input_layer)
        B, T, _ = x.shape
        x = x * (self.output_size ** 0.5)
        pos_emb = rel_positional_encoding(T, self.output_size)

        mask = key_mask(lengths, T, dtype=jnp.float32)
        mask_t = jnp.swapaxes(mask, 1, 2).astype(x.dtype)

        Stack = nn.scan(
            ConformerEncoderLayer,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(
            self.output_size, self.attention_heads, self.linear_units,
            self.cnn_module_kernel, self.dropout_rate,
            self.attention_dropout_rate, self.dtype, self.param_dtype,
            name="encoders",
        )(x, (pos_emb, mask, mask_t), deterministic)
        # espnet normalize_before: one more LN over the stack output
        # (reference conformer/encoder.py after_norm)
        x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        return x, lengths
