"""Branchformer and E-Branchformer encoders (reference
funasr/models/branchformer/{encoder.py,cgmlp.py},
funasr/models/e_branchformer/encoder.py).

Parallel-branch encoder layers: a global attention branch (rel-pos MHA) and
a local cgMLP branch (channel projection + Convolutional Spatial Gating
Unit), merged per layer.  Branchformer merges with concat->linear; the
E-Branchformer layer additionally wraps the branches in macaron 0.5x FFNs
and merges with concat -> depthwise conv (residual) -> linear.

TPU notes: identical discipline to the Conformer stack — nn.scan over
layers, masked softmax/convs so padded frames cannot leak into valid
positions, fp32 layernorm under bf16 compute, depthwise convs as grouped
``lax.conv_general_dilated`` (fused by XLA; the MXU work stays in the
projections).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.models.conformer import (
    Conv2dSubsampling,
    FeedForward,
    RelPosMultiHeadAttention,
    rel_positional_encoding,
)
from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.models.transformer.model import _HybridModel
from funasr_tpu.ops.masks import key_mask
from funasr_tpu.registry import tables

Dtype = Any


def _depthwise_conv1d(x, kernel, bias=None):
    """(B, T, C) same-padded depthwise conv (SPMD-safe grad,
    ops/dwconv.py)."""
    from funasr_tpu.ops.dwconv import depthwise_conv1d

    pad = (kernel.shape[0] - 1) // 2
    out = depthwise_conv1d(x, kernel, pad, pad)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class ConvolutionalSpatialGatingUnit(nn.Module):
    """CSGU (cgmlp.py): split channels; gate half = LN -> depthwise conv
    (+1 init bias so the unit starts near identity); out = a * gate."""

    kernel_size: int = 31
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_t=None, deterministic: bool = True):
        a, g = jnp.split(x, 2, axis=-1)
        g = LayerNormF32(self.dtype, self.param_dtype, name="norm")(g)
        # NOTE: the reference CSGU convolves UNMASKED frames
        # (cgmlp.py:110-118) — pad frames may bleed into the last
        # kernel//2 valid frames exactly as in released checkpoints
        ch = g.shape[-1]
        kernel = self.param("conv", nn.initializers.normal(1e-3),
                            (self.kernel_size, 1, ch), self.param_dtype)
        bias = self.param("conv_bias", nn.initializers.ones, (ch,),
                          self.param_dtype)
        g = _depthwise_conv1d(g, kernel, bias)
        out = a * g
        return nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)


class ConvolutionalGatingMLP(nn.Module):
    """cgMLP local branch (cgmlp.py ConvolutionalGatingMLP)."""

    size: int
    linear_units: int
    kernel_size: int = 31
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_t=None, deterministic: bool = True):
        h = nn.Dense(self.linear_units, name="channel_proj1",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.gelu(h)
        h = ConvolutionalSpatialGatingUnit(
            self.kernel_size, self.dropout_rate, self.dtype,
            self.param_dtype, name="csgu",
        )(h, mask_t, deterministic)
        return nn.Dense(self.size, name="channel_proj2", dtype=self.dtype,
                        param_dtype=self.param_dtype)(h)


class BranchformerLayer(nn.Module):
    size: int
    n_head: int
    linear_units: int
    cgmlp_kernel: int = 31
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs, deterministic: bool = True):
        pos_emb, mask, mask_t = inputs
        # global (attention) branch
        h1 = LayerNormF32(self.dtype, self.param_dtype, name="norm_mha")(x)
        h1 = RelPosMultiHeadAttention(
            self.n_head, self.size, self.attention_dropout_rate,
            self.dtype, self.param_dtype, name="attn",
        )(h1, pos_emb, mask, deterministic)
        h1 = nn.Dropout(self.dropout_rate)(h1, deterministic=deterministic)
        # local (cgMLP) branch
        h2 = LayerNormF32(self.dtype, self.param_dtype, name="norm_mlp")(x)
        h2 = ConvolutionalGatingMLP(
            self.size, self.linear_units, self.cgmlp_kernel,
            self.dropout_rate, self.dtype, self.param_dtype, name="cgmlp",
        )(h2, mask_t, deterministic)
        h2 = nn.Dropout(self.dropout_rate)(h2, deterministic=deterministic)
        # merge: concat -> linear (encoder.py merge_method "concat")
        merged = nn.Dense(self.size, name="merge_proj", dtype=self.dtype,
                          param_dtype=self.param_dtype)(
            jnp.concatenate([h1, h2], axis=-1))
        x = x + nn.Dropout(self.dropout_rate)(merged,
                                              deterministic=deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="norm_final")(x)
        return x, None


class EBranchformerLayer(nn.Module):
    size: int
    n_head: int
    linear_units: int
    cgmlp_linear_units: int
    cgmlp_kernel: int = 31
    merge_kernel: int = 3
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs, deterministic: bool = True):
        pos_emb, mask, mask_t = inputs
        drop = lambda h: nn.Dropout(self.dropout_rate)(  # noqa: E731
            h, deterministic=deterministic)
        # macaron FFN 1
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm_ff1")(x)
        h = FeedForward(self.linear_units, self.size, self.dropout_rate,
                        self.dtype, self.param_dtype, name="feed_forward1"
                        )(h, deterministic)
        x = x + 0.5 * drop(h)
        # branches
        h1 = LayerNormF32(self.dtype, self.param_dtype, name="norm_mha")(x)
        h1 = RelPosMultiHeadAttention(
            self.n_head, self.size, self.attention_dropout_rate,
            self.dtype, self.param_dtype, name="attn",
        )(h1, pos_emb, mask, deterministic)
        h1 = drop(h1)
        h2 = LayerNormF32(self.dtype, self.param_dtype, name="norm_mlp")(x)
        h2 = ConvolutionalGatingMLP(
            self.size, self.cgmlp_linear_units, self.cgmlp_kernel,
            self.dropout_rate, self.dtype, self.param_dtype, name="cgmlp",
        )(h2, mask_t, deterministic)
        h2 = drop(h2)
        # merge: concat -> depthwise conv residual -> linear (e_branchformer
        # encoder.py "concat + conv1d merge")
        cat = jnp.concatenate([h1, h2], axis=-1)
        kernel = self.param("merge_conv", nn.initializers.lecun_normal(),
                            (self.merge_kernel, 1, cat.shape[-1]),
                            self.param_dtype)
        # reference merge conv is unmasked too (e_branchformer
        # encoder.py:160)
        cat = cat + _depthwise_conv1d(cat, kernel)
        merged = nn.Dense(self.size, name="merge_proj", dtype=self.dtype,
                          param_dtype=self.param_dtype)(cat)
        x = x + drop(merged)
        # macaron FFN 2
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm_ff2")(x)
        h = FeedForward(self.linear_units, self.size, self.dropout_rate,
                        self.dtype, self.param_dtype, name="feed_forward2"
                        )(h, deterministic)
        x = x + 0.5 * drop(h)
        x = LayerNormF32(self.dtype, self.param_dtype, name="norm_final")(x)
        return x, None


class _BranchEncoderBase(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    cgmlp_linear_units: int = 2048
    cgmlp_conv_kernel: int = 31
    merge_conv_kernel: int = 3
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _embed(self, xs, lengths):
        if self.input_layer == "conv2d":
            x, lengths = Conv2dSubsampling(
                self.output_size, self.dtype, self.param_dtype, name="embed"
            )(xs, lengths)
        elif self.input_layer == "linear":
            x = nn.Dense(self.output_size, name="embed", dtype=self.dtype,
                         param_dtype=self.param_dtype)(xs.astype(self.dtype))
        else:
            raise NotImplementedError(self.input_layer)
        # reference embed ends in RelPositionalEncoding whose forward scales
        # by sqrt(d_model) (embedding.py:273,321)
        return x * (self.output_size ** 0.5), lengths

    def _common(self, x, lengths):
        T = x.shape[1]
        pos_emb = rel_positional_encoding(T, self.output_size)
        mask = key_mask(lengths, T, dtype=jnp.float32)
        mask_t = jnp.swapaxes(mask, 1, 2).astype(x.dtype)
        return pos_emb, mask, mask_t


@tables.register("encoder_classes", "BranchformerEncoder")
class BranchformerEncoder(_BranchEncoderBase):
    @nn.compact
    def __call__(self, xs, lengths, deterministic: bool = True):
        x, lengths = self._embed(xs, lengths)
        pos_emb, mask, mask_t = self._common(x, lengths)
        Stack = nn.scan(
            BranchformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(
            self.output_size, self.attention_heads, self.cgmlp_linear_units,
            self.cgmlp_conv_kernel, self.dropout_rate,
            self.attention_dropout_rate, self.dtype, self.param_dtype,
            name="encoders",
        )(x, (pos_emb, mask, mask_t), deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        return x, lengths


@tables.register("encoder_classes", "EBranchformerEncoder")
class EBranchformerEncoder(_BranchEncoderBase):
    @nn.compact
    def __call__(self, xs, lengths, deterministic: bool = True):
        x, lengths = self._embed(xs, lengths)
        pos_emb, mask, mask_t = self._common(x, lengths)
        Stack = nn.scan(
            EBranchformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(
            self.output_size, self.attention_heads, self.linear_units,
            self.cgmlp_linear_units, self.cgmlp_conv_kernel,
            self.merge_conv_kernel, self.dropout_rate,
            self.attention_dropout_rate, self.dtype, self.param_dtype,
            name="encoders",
        )(x, (pos_emb, mask, mask_t), deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        return x, lengths


def _filtered(conf: Dict[str, Any]) -> Dict[str, Any]:
    conf = dict(conf or {})
    for k in ("attn_branch_drop_rate", "pos_enc_layer_type", "rel_pos_type",
              "positional_dropout_rate", "stochastic_depth_rate",
              "use_attn", "use_cgmlp", "merge_method", "cgmlp_weight",
              "gate_activation", "use_linear_after_conv",
              "attention_layer_type"):
        conf.pop(k, None)
    conf.setdefault("input_layer", "conv2d")
    return conf


@tables.register("model_classes", "Branchformer")
class Branchformer(_HybridModel):
    """CTC/attention hybrid with a Branchformer encoder (reference
    funasr/models/branchformer/model.py delegates to the Transformer model
    body)."""

    def make_encoder(self):
        return BranchformerEncoder(
            input_size=self.input_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder",
            **_filtered(self.encoder_conf),
        )


@tables.register("model_classes", "EBranchformer")
class EBranchformer(_HybridModel):
    def make_encoder(self):
        return EBranchformerEncoder(
            input_size=self.input_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder",
            **_filtered(self.encoder_conf),
        )
