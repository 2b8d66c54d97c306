"""Paraformer SANM decoder (reference funasr/models/paraformer/decoder.py:225).

Bidirectional (no causal mask) decoder over the CIF acoustic-embedding grid:
each layer is FFN -> FSMN "self-attention" (a depthwise conv memory block,
attention.py:471) -> cross-attention into the encoder memory.  The
``att_layer_num`` identical layers run under ``nn.scan``; a final FFN-only
layer (``decoders3``) and output projection follow.

TPU notes: token grid U is static (padded); tgt masks are (B, U, 1) floats;
cross-attention key masks are (B, 1, T).  All matmuls are MXU-shaped; softmax
f32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.ops.quant import QDense

from funasr_tpu.models.sanm import (
    LayerNormF32,
    fsmn_memory,
    masked_softmax,
)
from funasr_tpu.ops.masks import key_mask, sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


class FeedForwardDecoderSANM(nn.Module):
    """w_2(norm(dropout(relu(w_1 x)))), w_2 bias-free
    (sanm/positionwise_feed_forward.py ``PositionwiseFeedForwardDecoderSANM``)."""

    hidden_units: int
    out_units: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = QDense(self.hidden_units, name="w_1",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm")(h)
        return QDense(self.out_units, name="w_2", use_bias=False,
                        dtype=self.dtype, param_dtype=self.param_dtype)(h)


class _FFNDecParams(nn.Module):
    """Parameter holder mirroring ``FeedForwardDecoderSANM``'s tree."""

    in_features: int
    hidden_units: int
    out_units: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        from funasr_tpu.models.sanm import _DenseParams, _LNParams

        w1, b1 = _DenseParams(self.in_features, self.hidden_units,
                              self.param_dtype, name="w_1")()
        fln = _LNParams(self.hidden_units, self.param_dtype, name="norm")()
        w2, _ = _DenseParams(self.hidden_units, self.out_units,
                             self.param_dtype, use_bias=False, name="w_2")()
        return w1, b1, fln, w2


class _FsmnParams(nn.Module):
    """Parameter holder mirroring ``FsmnSelfAttention``'s tree."""

    n_feat: int
    kernel_size: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param("fsmn_block", nn.initializers.lecun_normal(),
                          (self.kernel_size, 1, self.n_feat),
                          self.param_dtype)


class _CrossAttnParams(nn.Module):
    """Parameter holder mirroring ``CrossAttention``'s tree."""

    n_feat: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        from funasr_tpu.models.sanm import _DenseParams

        wq, bq = _DenseParams(self.n_feat, self.n_feat, self.param_dtype,
                              name="linear_q")()
        wkv, bkv = _DenseParams(self.n_feat, 2 * self.n_feat,
                                self.param_dtype, name="linear_k_v")()
        wout, bout = _DenseParams(self.n_feat, self.n_feat, self.param_dtype,
                                  name="linear_out")()
        return wq, bq, wkv, bkv, wout, bout


def _fused_decoder_layer(tgt, memory, lens_t, lens_m, ln1, ffn, ln2, fsmn,
                         ln3, cross, *, n_head, left, right,
                         interpret=False):
    """Quantize the layer's weights and invoke the fused kernel."""
    from funasr_tpu.ops import decoder_layer_pallas as DL
    from funasr_tpu.ops.quant import quantize_rows

    w1, b1, fln, w2 = ffn
    wq, bq, wkv, bkv, wout, bout = cross
    w18, s1 = quantize_rows(w1, axis=0)
    w28, s2 = quantize_rows(w2, axis=0)
    wq8, sq = quantize_rows(wq, axis=0)
    wkv8, skv = quantize_rows(wkv, axis=0)
    wout8, so = quantize_rows(wout, axis=0)
    r = lambda v: v.reshape(1, -1).astype(jnp.float32)
    D = tgt.shape[-1]
    return DL._call(
        tgt, memory, lens_t.astype(jnp.int32), lens_m.astype(jnp.int32),
        r(ln1[0]), r(ln1[1]), w18, s1, r(b1), r(fln[0]), r(fln[1]), w28, s2,
        r(ln2[0]), r(ln2[1]),
        fsmn.reshape(fsmn.shape[0], D).astype(jnp.float32),
        r(ln3[0]), r(ln3[1]),
        wq8, sq, r(bq), wkv8, skv, r(bkv), wout8, so, r(bout),
        n_head=n_head, left=left, right=right, interpret=interpret)


class FsmnSelfAttention(nn.Module):
    """Decoder 'self-attention': pure FSMN depthwise memory
    (attention.py:471 ``MultiHeadedAttentionSANMDecoder``)."""

    n_feat: int
    kernel_size: int = 11
    sanm_shift: int = 0
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        left = (self.kernel_size - 1) // 2 + max(self.sanm_shift, 0)
        right = self.kernel_size - 1 - left
        kernel = self.param(
            "fsmn_block", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.n_feat), self.param_dtype,
        )
        out = fsmn_memory(x, kernel, mask, left, right)
        return nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)


class CrossAttention(nn.Module):
    """Cross-attention with fused KV projection
    (attention.py:568 ``MultiHeadedAttentionCrossAtt``)."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, memory_mask, deterministic: bool = True):
        d_k = self.n_feat // self.n_head
        B, U, _ = x.shape
        T = memory.shape[1]
        q = QDense(self.n_feat, name="linear_q",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        kv = QDense(2 * self.n_feat, name="linear_k_v",
                      dtype=self.dtype, param_dtype=self.param_dtype)(memory)
        k, v = jnp.split(kv, 2, axis=-1)
        H = self.n_head

        from funasr_tpu.ops import attention_pallas as AP

        key_mask_only = memory_mask is None or memory_mask.shape[1] == 1
        if (AP.enabled() and key_mask_only
                and AP.supported(U, d_k, v.dtype, None, Tk=T)
                and deterministic):  # pallas kernels are inference-only
            # fused VMEM cross-attention (same kernel as the encoder path)
            if memory_mask is None:
                bias = jnp.zeros((B, T), jnp.float32)
            else:
                bias = (1.0 - memory_mask[:, 0, :].astype(jnp.float32)) * -1e30
            ctx = AP.fused_attention(q * (d_k ** -0.5), k, v, bias, H)
            return QDense(self.n_feat, name="linear_out",
                            dtype=self.dtype, param_dtype=self.param_dtype)(ctx)

        # merged (B*H) 3D matmuls (fewer TPU layout copies than 4D einsum)
        q2 = (q.reshape(B, U, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, U, d_k)) * (d_k ** -0.5)
        k2 = (k.reshape(B, T, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, T, d_k))
        v2 = (v.reshape(B, T, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, T, d_k))
        scores = jnp.einsum("bud,btd->but", q2, k2).reshape(B, H, U, T)
        attn = masked_softmax(
            scores, None if memory_mask is None else memory_mask[:, None, :, :]
        )
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        ctx = jnp.einsum("but,btd->bud",
                         attn.reshape(B * H, U, T).astype(v2.dtype), v2)
        ctx = (ctx.reshape(B, H, U, d_k).transpose(0, 2, 1, 3)
               .reshape(B, U, self.n_feat))
        return QDense(self.n_feat, name="linear_out",
                        dtype=self.dtype, param_dtype=self.param_dtype)(ctx)


class DecoderLayerSANM(nn.Module):
    """FFN -> FSMN self-memory -> cross-attention, pre-norm
    (paraformer/decoder.py:26 ``DecoderLayerSANM`` forward, :78-121)."""

    size: int
    n_head: int
    linear_units: int
    kernel_size: int = 11
    sanm_shift: int = 0
    dropout_rate: float = 0.0
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    has_self_attn: bool = True
    has_src_attn: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, carry_inputs, deterministic: bool = True):
        """carry_inputs = (tgt_mask (B,U,1), memory (B,T,D), memory_mask (B,1,T)).

        Returns ``(x, None)`` for nn.scan compatibility.
        """
        tgt_mask, memory, memory_mask = carry_inputs

        from funasr_tpu.ops import decoder_layer_pallas as DL
        from funasr_tpu.ops import quant
        from funasr_tpu.models.sanm import _LNParams

        if (self.has_self_attn and self.has_src_attn
                and deterministic  # pallas kernels are inference-only
                and quant.enabled() and DL.enabled()
                and tgt_mask is not None and memory_mask is not None
                and memory_mask.shape[1] == 1
                and DL.supported(tgt.shape[0], tgt.shape[1], memory.shape[1],
                                 self.size, self.linear_units, self.n_head)):
            # fully fused int8 decoder layer (ops/decoder_layer_pallas.py);
            # parameter tree identical to the module path below.
            ln1 = _LNParams(self.size, self.param_dtype, name="norm1")()
            ffn = _FFNDecParams(self.size, self.linear_units, self.size,
                                self.param_dtype, name="feed_forward")()
            ln2 = _LNParams(self.size, self.param_dtype, name="norm2")()
            fsmn = _FsmnParams(self.size, self.kernel_size,
                               self.param_dtype, name="self_attn")()
            ln3 = _LNParams(self.size, self.param_dtype, name="norm3")()
            cross = _CrossAttnParams(self.size, self.param_dtype,
                                     name="src_attn")()
            left = (self.kernel_size - 1) // 2 + max(self.sanm_shift, 0)
            lens_t = jnp.sum((tgt_mask[:, :, 0] > 0).astype(jnp.int32), -1)
            lens_m = jnp.sum((memory_mask[:, 0, :] > 0).astype(jnp.int32), -1)
            out = _fused_decoder_layer(
                tgt.astype(self.dtype), memory.astype(self.dtype),
                lens_t, lens_m, ln1, ffn, ln2, fsmn, ln3, cross,
                n_head=self.n_head, left=left,
                right=self.kernel_size - 1 - left)
            return out, None

        residual = tgt
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(tgt)
        h = FeedForwardDecoderSANM(
            self.linear_units, self.size, self.dropout_rate,
            self.dtype, self.param_dtype, name="feed_forward",
        )(h, deterministic)

        x = h
        if self.has_self_attn:
            h2 = LayerNormF32(self.dtype, self.param_dtype, name="norm2")(h)
            x = FsmnSelfAttention(
                self.size, self.kernel_size, self.sanm_shift,
                self.self_attention_dropout_rate, self.dtype, self.param_dtype,
                name="self_attn",
            )(h2, tgt_mask, deterministic)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
            x = residual + x

        if self.has_src_attn:
            residual = x
            h3 = LayerNormF32(self.dtype, self.param_dtype, name="norm3")(x)
            s = CrossAttention(
                self.n_head, self.size, self.src_attention_dropout_rate,
                self.dtype, self.param_dtype, name="src_attn",
            )(h3, memory, memory_mask, deterministic)
            s = nn.Dropout(self.dropout_rate)(s, deterministic=deterministic)
            x = residual + s

        return x, None


@tables.register("decoder_classes", "ParaformerSANMDecoder")
class ParaformerSANMDecoder(nn.Module):
    """Stack of DecoderLayerSANM + FFN-only tail layer + output projection
    (paraformer/decoder.py:225 ``ParaformerSANMDecoder``)."""

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
        self.embed = nn.Embed(
            self.vocab_size, d, name="embed", param_dtype=self.param_dtype,
            dtype=self.dtype,
        )
        self.decoders = nn.scan(
            DecoderLayerSANM,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.att_layer_num,
            in_axes=(nn.broadcast, nn.broadcast),
        )(
            d, self.attention_heads, self.linear_units, self.kernel_size,
            self.sanm_shift, self.dropout_rate,
            self.self_attention_dropout_rate, self.src_attention_dropout_rate,
            True, True, self.dtype, self.param_dtype, name="decoders",
        )
        if self.num_blocks - self.att_layer_num > 0:
            self.decoders2 = nn.scan(
                DecoderLayerSANM,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_blocks - self.att_layer_num,
                in_axes=(nn.broadcast, nn.broadcast),
            )(
                d, self.attention_heads, self.linear_units, self.kernel_size,
                0, self.dropout_rate, self.self_attention_dropout_rate,
                self.src_attention_dropout_rate, True, False,
                self.dtype, self.param_dtype, name="decoders2",
            )
        else:
            self.decoders2 = None
        self.decoders3 = DecoderLayerSANM(
            d, self.attention_heads, self.linear_units, self.kernel_size,
            self.sanm_shift, self.dropout_rate,
            self.self_attention_dropout_rate, self.src_attention_dropout_rate,
            False, False, self.dtype, self.param_dtype, name="decoders3",
        )
        self.after_norm = LayerNormF32(self.dtype, self.param_dtype,
                                       name="after_norm")
        if self.use_output_layer:
            self.output_layer = QDense(
                self.vocab_size, name="output_layer",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )

    def __call__(
        self,
        memory: jnp.ndarray,  # (B, T, D) encoder output
        memory_lengths: jnp.ndarray,  # (B,)
        semantic_embeds: jnp.ndarray,  # (B, U, D) CIF embeddings
        token_lengths: jnp.ndarray,  # (B,)
        deterministic: bool = True,
        return_hidden: bool = False,
    ):
        """Returns logits (B, U, vocab) (or hidden if no output layer or
        ``return_hidden``)."""
        B, U, _ = semantic_embeds.shape
        T = memory.shape[1]
        tgt_mask = sequence_mask(token_lengths, U, dtype=jnp.float32)[:, :, None]
        memory_mask = key_mask(memory_lengths, T, dtype=jnp.float32)

        x = semantic_embeds.astype(self.dtype)
        inputs = (tgt_mask, memory.astype(self.dtype), memory_mask)
        x, _ = self.decoders(x, inputs, deterministic)
        if self.decoders2 is not None:
            x, _ = self.decoders2(x, inputs, deterministic)
        x, _ = self.decoders3(x, inputs, deterministic)
        hidden = self.after_norm(x)
        if self.use_output_layer and not return_hidden:
            return self.output_layer(hidden)
        return hidden

    def project(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Apply the output projection to decoder hiddens."""
        return self.output_layer(hidden)

    def embed_tokens(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Token embedding lookup (used by the GLM sampler)."""
        return self.embed(ids)


@tables.register("decoder_classes", "ParaformerSANDecoder")
class ParaformerSANDecoder(nn.Module):
    """NAR decoder with standard (non-FSMN) multi-head self-attention over
    the CIF embeddings (reference paraformer/decoder.py:982
    ``ParaformerSANDecoder``): bidirectional — the target mask is only the
    pad mask, no subsequent mask (decoder.py:1060-1063).  Same call
    contract as ``ParaformerSANMDecoder`` so ``Paraformer`` selects it by
    registry name."""

    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    use_output_layer: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        from funasr_tpu.models.transformer.decoder import (
            TransformerDecoderLayer)

        d = self.encoder_output_size
        self.embed = nn.Embed(
            self.vocab_size, d, name="embed", param_dtype=self.param_dtype,
            dtype=self.dtype,
        )
        self.decoders = nn.scan(
            TransformerDecoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
            in_axes=(nn.broadcast, nn.broadcast),
        )(
            d, self.attention_heads, self.linear_units, self.dropout_rate,
            self.self_attention_dropout_rate,
            self.src_attention_dropout_rate,
            self.dtype, self.param_dtype, name="decoders",
        )
        self.after_norm = LayerNormF32(self.dtype, self.param_dtype,
                                       name="after_norm")
        if self.use_output_layer:
            self.output_layer = QDense(
                self.vocab_size, name="output_layer",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )

    def __call__(self, memory, memory_lengths, semantic_embeds,
                 token_lengths, deterministic: bool = True,
                 return_hidden: bool = False):
        B, U, _ = semantic_embeds.shape
        T = memory.shape[1]
        # bidirectional: pad-only key mask on both self- and cross-attention
        tgt_mask = sequence_mask(token_lengths, U,
                                 dtype=jnp.float32)[:, None, None, :]
        memory_mask = key_mask(memory_lengths, T,
                               dtype=jnp.float32)[:, None, :, :]
        x = semantic_embeds.astype(self.dtype)
        x, _ = self.decoders(
            x, (tgt_mask, memory.astype(self.dtype), memory_mask),
            deterministic)
        hidden = self.after_norm(x)
        if self.use_output_layer and not return_hidden:
            return self.output_layer(hidden)
        return hidden

    def project(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return self.output_layer(hidden)

    def embed_tokens(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed(ids)
