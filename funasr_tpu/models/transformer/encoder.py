"""Vanilla Transformer encoder (reference
funasr/models/transformer/encoder.py ``TransformerEncoder``).

conv2d subsampling (or linear embed) -> scaled absolute positional encoding
-> N x pre-norm (MHA + FFN) layers under ``nn.scan`` -> after_norm.  This is
the encoder behind the reference's ``Transformer``/``SANM``/``CTC`` model
configs; the conformer/branchformer families have their own encoders.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.ops.quant import QDense

from funasr_tpu.models.sanm import LayerNormF32, PositionwiseFeedForward
from funasr_tpu.models.transformer.decoder import MultiHeadAttention
from funasr_tpu.ops.masks import key_mask
from funasr_tpu.ops.posenc import transformer_encoding
from funasr_tpu.registry import tables

Dtype = Any


class _TransformerEncoderLayer(nn.Module):
    size: int
    n_head: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs, deterministic: bool = True):
        (mask,) = inputs  # (B, 1, 1, T)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(x)
        h = MultiHeadAttention(self.n_head, self.size,
                               self.attention_dropout_rate,
                               self.dtype, self.param_dtype, name="self_attn"
                               )(h, h, mask, deterministic)
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm2")(x)
        h = PositionwiseFeedForward(self.linear_units, self.size,
                                    self.dropout_rate, self.dtype,
                                    self.param_dtype, name="feed_forward"
                                    )(h, deterministic)
        return res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic), None


@tables.register("encoder_classes", "TransformerEncoder")
class TransformerEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, lengths, deterministic: bool = True):
        from funasr_tpu.models.conformer import Conv2dSubsampling

        if self.input_layer == "conv2d":
            x, lengths = Conv2dSubsampling(
                self.output_size, self.dtype, self.param_dtype, name="embed"
            )(xs, lengths)
        elif self.input_layer == "linear":
            # reference embed stack: Linear -> LayerNorm -> Dropout -> ReLU
            # (transformer/encoder.py:188-195), then pos-enc below
            x = QDense(self.output_size, name="embed", dtype=self.dtype,
                         param_dtype=self.param_dtype)(xs)
            x = LayerNormF32(self.dtype, self.param_dtype,
                             name="embed_norm")(x)
            x = nn.Dropout(self.dropout_rate)(
                x, deterministic=deterministic)
            x = nn.relu(x)
        else:
            raise NotImplementedError(self.input_layer)
        B, T, d = x.shape
        pe = transformer_encoding(T, d)
        x = x * (d ** 0.5) + pe[None].astype(x.dtype)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        mask = key_mask(lengths, T, jnp.float32)[:, None, :, :]

        Stack = nn.scan(
            _TransformerEncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(
            self.output_size, self.attention_heads, self.linear_units,
            self.dropout_rate, self.attention_dropout_rate,
            self.dtype, self.param_dtype, name="encoders",
        )(x, (mask,), deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        return x, lengths
