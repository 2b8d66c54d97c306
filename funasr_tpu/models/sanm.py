"""SAN-M: self-attention with an FSMN memory branch, TPU-native.

Re-design of the reference SAN-M stack (funasr/models/sanm/attention.py:140
``MultiHeadedAttentionSANM``, funasr/models/sanm/encoder.py:44/188) in
flax.linen with TPU discipline:

- fused QKV projection (one MXU matmul),
- the FSMN memory branch (depthwise conv over V, residual) expressed as
  ``lax.conv_general_dilated`` with ``feature_group_count = D`` — XLA lowers
  this to a VPU sliding window fused with the surrounding elementwise ops,
- softmax and layernorm in float32, everything else in the module ``dtype``
  (bfloat16 in production),
- the 49 identical encoder layers are stacked with ``nn.scan`` so the layer
  body is traced/compiled once, and ``nn.remat`` can be applied for training
  memory,
- masks are (B, 1, T) float key masks; fully-masked rows stay NaN-free
  (finite fill + re-mask, matching attention.py:272-280 semantics).

Parameter names mirror the torch module names (``linear_q_k_v``,
``fsmn_block``, ``linear_out``, ``norm1``...) so reference checkpoints map
mechanically (see funasr_tpu/convert.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.ops.quant import QDense
from jax import lax

from funasr_tpu.ops.masks import mask_fill
from funasr_tpu.ops.posenc import sinusoidal_encoding
from funasr_tpu.registry import tables

Dtype = Any


def ln_f32(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
           eps: float = 1e-12) -> jnp.ndarray:
    """LayerNormF32 core on raw weights: f32 stats, torch eps, f32 out.

    SHARED by the ``LayerNormF32`` module and the sequence-parallel path
    (parallel/sp_encoder.py / sp_decoder.py) so the norm math cannot
    drift between them.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def fsmn_conv(v: jnp.ndarray, kernel: jnp.ndarray, padding) -> jnp.ndarray:
    """The FSMN depthwise conv itself (no residual/mask): v (B, T, D),
    kernel (K, 1, D), ``padding`` = [(left, right)] or "VALID".

    SHARED by ``fsmn_memory`` (padded, single device) and the
    sequence-parallel halo-exchange path (pre-concatenated halos, VALID).
    Routed through ops/dwconv.py for the SPMD-safe kernel gradient (the
    forward is the identical XLA conv).
    """
    from funasr_tpu.ops.dwconv import depthwise_conv1d

    left, right = (0, 0) if padding == "VALID" else padding[0]
    return depthwise_conv1d(v, kernel, left, right)


def fsmn_memory(
    v: jnp.ndarray,
    kernel: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    left_padding: int,
    right_padding: int,
) -> jnp.ndarray:
    """Depthwise FSMN block (attention.py:207 ``forward_fsmn``):
    mask -> depthwise conv1d (no bias) -> +residual -> mask.

    v: (B, T, D); kernel: (K, 1, D) depthwise filters.
    """
    if mask is not None:
        mask = mask.astype(v.dtype)
        v = v * mask
    out = fsmn_conv(v, kernel, [(left_padding, right_padding)])
    out = out + v
    if mask is not None:
        out = out * mask
    return out


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over the last axis with key masking, f32 accumulation.

    mask: broadcastable to scores, nonzero = valid.  Matches the reference's
    masked_fill(-inf) -> softmax -> masked_fill(0) (attention.py:272-280).
    """
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = mask_fill(scores, mask)
    attn = jax.nn.softmax(scores, axis=-1)
    if mask is not None:
        attn = jnp.where(mask != 0, attn, 0.0)
    return attn


class MultiHeadedAttentionSANM(nn.Module):
    """Self-attention + FSMN memory, output = attention(QKV) + FSMN(V)."""

    n_head: int
    n_feat: int
    kernel_size: int = 11
    sanm_shift: int = 0
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        # mask may be a (key_mask, attn_mask) pair: key_mask (B,1,T) gates
        # keys + the FSMN memory; attn_mask (B,T,T) adds per-query structure
        # (e.g. the streaming punc controllable time-delay mask).
        attn_mask = None
        if isinstance(mask, (tuple, list)):
            mask, attn_mask = mask
        d_k = self.n_feat // self.n_head
        qkv = QDense(
            3 * self.n_feat, name="linear_q_k_v",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        left = (self.kernel_size - 1) // 2 + max(self.sanm_shift, 0)
        right = self.kernel_size - 1 - left
        fsmn_kernel = self.param(
            "fsmn_block",
            nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.n_feat),
            self.param_dtype,
        )
        mask_t = None if mask is None else jnp.swapaxes(mask, 1, 2).astype(v.dtype)
        mem = fsmn_memory(v, fsmn_kernel, mask_t, left, right)
        mem = nn.Dropout(self.dropout_rate)(mem, deterministic=deterministic)

        B, T, _ = x.shape
        H = self.n_head

        from funasr_tpu.ops import attention_pallas as AP

        # deterministic-only: pallas_call has no transpose rule, so the
        # fused kernels must never be reachable from jax.grad
        if (AP.enabled() and AP.supported(T, d_k, v.dtype, attn_mask)
                and deterministic):
            # fused VMEM attention: scores never hit HBM, inputs stay in
            # (B, T, H*d) layout (no head transposes)
            if mask is None:
                bias = jnp.zeros((B, T), jnp.float32)
            else:
                bias = (1.0 - mask[:, 0, :].astype(jnp.float32)) * -1e30
            ctx = AP.fused_attention(q * (d_k ** -0.5), k, v, bias, H)
            out = QDense(
                self.n_feat, name="linear_out",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(ctx)
            return out + mem

        # merged (B*H) 3D batched matmuls: measurably fewer layout copies
        # on TPU than the 4D "bthd,bshd->bhts" form (XLA re-lays the 4D
        # attention matrix between the two dots and softmax)
        q2 = (q.reshape(B, T, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, T, d_k)) * (d_k ** -0.5)
        k2 = (k.reshape(B, T, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, T, d_k))
        v2 = (v.reshape(B, T, H, d_k).transpose(0, 2, 1, 3)
              .reshape(B * H, T, d_k))
        scores = jnp.einsum("bid,bjd->bij", q2, k2).reshape(B, H, T, T)
        m4 = None if mask is None else mask[:, None, :, :]
        if attn_mask is not None:
            am4 = attn_mask[:, None, :, :].astype(jnp.float32)
            m4 = am4 if m4 is None else m4 * am4
        attn = masked_softmax(scores, m4)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bij,bjd->bid",
                         attn.reshape(B * H, T, T).astype(v2.dtype), v2)
        ctx = (ctx.reshape(B, H, T, d_k).transpose(0, 2, 1, 3)
               .reshape(B, T, self.n_feat))
        out = QDense(
            self.n_feat, name="linear_out",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(ctx)
        return out + mem


class _DenseParams(nn.Module):
    """Parameter holder shaped exactly like ``nn.Dense`` (same names,
    shapes, and default inits) for kernels that consume raw weights."""

    in_features: int
    features: int
    param_dtype: Dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features),
                            self.param_dtype)
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return kernel, bias


class _LNParams(nn.Module):
    """Parameter holder shaped exactly like ``LayerNormF32``."""

    dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          self.param_dtype)
        return scale, bias


class _SANMAttnParams(nn.Module):
    """Parameter holder mirroring ``MultiHeadedAttentionSANM``'s tree
    (linear_q_k_v / fsmn_block / linear_out) for the fused layer kernel."""

    n_feat: int
    kernel_size: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(self.n_feat, 3 * self.n_feat,
                                  self.param_dtype, name="linear_q_k_v")()
        fsmn = self.param("fsmn_block", nn.initializers.lecun_normal(),
                          (self.kernel_size, 1, self.n_feat),
                          self.param_dtype)
        wout, bout = _DenseParams(self.n_feat, self.n_feat,
                                  self.param_dtype, name="linear_out")()
        return wqkv, bqkv, fsmn, wout, bout


class _FFNParams(nn.Module):
    """Parameter holder mirroring ``PositionwiseFeedForward``'s tree."""

    in_features: int
    hidden_units: int
    out_units: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.in_features, self.hidden_units,
                              self.param_dtype, name="w_1")()
        w2, b2 = _DenseParams(self.hidden_units, self.out_units,
                              self.param_dtype, name="w_2")()
        return w1, b1, w2, b2


class _SANMLayerParams(nn.Module):
    """Scan body that only declares one encoder layer's parameters (tree
    identical to ``EncoderLayerSANM``) and emits them as stacked scan
    outputs.  Lets the encoder pre-quantize the whole weight stack OUTSIDE
    the layer scan, so XLA hoists the (loop-invariant) quantization out of
    serving loops instead of re-running it per layer per call."""

    size: int
    linear_units: int
    kernel_size: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        ln1 = _LNParams(self.size, self.param_dtype, name="norm1")()
        attn = _SANMAttnParams(self.size, self.kernel_size,
                               self.param_dtype, name="self_attn")()
        ln2 = _LNParams(self.size, self.param_dtype, name="norm2")()
        ffn = _FFNParams(self.size, self.linear_units, self.size,
                         self.param_dtype, name="feed_forward")()
        return carry, (*ln1, *attn, *ln2, *ffn)


def declare_stacked_sanm_params(size, linear_units, kernel_size,
                                param_dtype, n_rest, name="encoders"):
    """Declare the scanned encoder stack's parameters via the holder
    (tree identical to ``nn.scan(EncoderLayerSANM)``) and return the
    13 stacked leaves — SHARED by the fused-int8 and pipeline branches
    so the holder unpack can't skew between them.  Must be called from
    inside a parent module's compact context."""
    ParamStack = nn.scan(
        _SANMLayerParams,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        length=n_rest,
        in_axes=(nn.broadcast,),
    )
    _, stacked = ParamStack(size, linear_units, kernel_size,
                            param_dtype, name=name)(0.0, None)
    return stacked


class PositionwiseFeedForward(nn.Module):
    """w_2(dropout(relu(w_1(x)))) — transformer/positionwise_feed_forward.py."""

    hidden_units: int
    out_units: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from funasr_tpu.ops import ffn_pallas as FP
        from funasr_tpu.ops import quant

        M = 1
        for d in x.shape[:-1]:
            M *= d
        if (deterministic and quant.enabled()
                and FP.enabled()
                and FP.supported(M, x.shape[-1], self.hidden_units,
                                 self.out_units, self.dtype)):
            # fused VMEM FFN (ops/ffn_pallas.py): the (M, hidden) tensor
            # never reaches HBM and both contractions run on the int8 MXU.
            # int8-only: in bf16 the hidden-traffic saving measured slightly
            # below XLA's epilogue-fused matmuls, so the XLA path stays
            # default there.
            k1, b1 = _DenseParams(x.shape[-1], self.hidden_units,
                                  self.param_dtype, name="w_1")()
            k2, b2 = _DenseParams(self.hidden_units, self.out_units,
                                  self.param_dtype, name="w_2")()
            # int8=True literally: this branch requires quant.enabled()
            return FP.fused_ffn(x.astype(self.dtype), k1, b1, k2, b2,
                                int8=True)
        h = QDense(self.hidden_units, name="w_1",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return QDense(self.out_units, name="w_2",
                        dtype=self.dtype, param_dtype=self.param_dtype)(h)


class LayerNormF32(nn.Module):
    """LayerNorm computed in float32, cast back to the compute dtype.

    Owns its scale/bias directly (no nested module) so checkpoint paths are
    ``.../norm1/{scale,bias}``, mirroring the torch ``norm1.{weight,bias}``.
    """

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    epsilon: float = 1e-12  # torch.nn.LayerNorm default in the reference

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (d,), self.param_dtype)
        return ln_f32(x, scale, bias, self.epsilon).astype(self.dtype)


class EncoderLayerSANM(nn.Module):
    """Pre-norm SANM encoder layer (sanm/encoder.py:44).

    When ``in_size != size`` (the first layer, 560 -> 512 for
    Paraformer-large) the attention residual is skipped, matching the
    reference (encoder.py:120-137).
    """

    in_size: int
    size: int
    n_head: int
    linear_units: int
    kernel_size: int = 11
    sanm_shift: int = 0
    dropout_rate: float = 0.0
    attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        """Returns ``(x, None)`` — the (carry, out) shape ``nn.scan`` needs."""
        from funasr_tpu.ops import quant
        from funasr_tpu.ops import sanm_layer_pallas as SL

        if (self.in_size == self.size
                and deterministic
                and quant.enabled() and SL.enabled()
                and not isinstance(mask, (tuple, list))
                and SL.supported(x.shape[1], self.size, self.linear_units,
                                 self.n_head)):
            # fully fused int8 layer (ops/sanm_layer_pallas.py): one HBM
            # round-trip per layer instead of ~8; every matmul on the int8
            # MXU.  Parameter tree identical to the module path below.
            if mask is None:
                lengths = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
            else:
                lengths = jnp.sum(
                    (mask[:, 0, :] > 0).astype(jnp.int32), axis=-1)
            ln1 = _LNParams(self.size, self.param_dtype, name="norm1")()
            wqkv, bqkv, fsmn, wout, bout = _SANMAttnParams(
                self.size, self.kernel_size, self.param_dtype,
                name="self_attn")()
            ln2 = _LNParams(self.size, self.param_dtype, name="norm2")()
            w1, b1, w2, b2 = _FFNParams(
                self.size, self.linear_units, self.size, self.param_dtype,
                name="feed_forward")()
            left = (self.kernel_size - 1) // 2 + max(self.sanm_shift, 0)
            out = SL.fused_sanm_layer(
                x.astype(self.dtype), lengths, ln1, wqkv, bqkv, fsmn,
                wout, bout, ln2, w1, b1, w2, b2, n_head=self.n_head,
                left=left, right=self.kernel_size - 1 - left)
            return out, None

        residual = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(x)
        attn = MultiHeadedAttentionSANM(
            self.n_head, self.size, self.kernel_size, self.sanm_shift,
            self.attention_dropout_rate, self.dtype, self.param_dtype,
            name="self_attn",
        )(h, mask, deterministic)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = residual + attn if self.in_size == self.size else attn

        residual = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm2")(x)
        ff = PositionwiseFeedForward(
            self.linear_units, self.size, self.dropout_rate,
            self.dtype, self.param_dtype, name="feed_forward",
        )(h, deterministic)
        ff = nn.Dropout(self.dropout_rate)(ff, deterministic=deterministic)
        return residual + ff, None


@tables.register("encoder_classes", "SANMEncoder")
class SANMEncoder(nn.Module):
    """SAN-M encoder (sanm/encoder.py:188 ``SANMEncoder``).

    Structure: x * sqrt(d) -> sinusoidal PE (at input width) -> encoders0
    (in_size -> size) -> nn.scan over (num_blocks - 1) identical layers ->
    after_norm.  The scanned stack compiles the layer body once regardless of
    depth (50 layers for Paraformer-large).
    """

    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    kernel_size: int = 11
    sanm_shift: int = 0
    input_layer: str = "pe"
    normalize_before: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    # unroll the layer scan (small stacks on dispatch-bound paths — the
    # punc windows, cached beam steps; docs/ROOFLINE.md r4).  Keep False
    # for deep stacks: a 50-layer unrolled flagship explodes compile time.
    unroll_layers: bool = False

    @nn.compact
    def __call__(self, xs, lengths, deterministic: bool = True,
                 attn_mask=None):
        """xs: (B, T, input_size); lengths: (B,). Returns (out, lengths).

        ``attn_mask``: optional (B, T, T) per-query attention structure mask
        (nonzero = may attend), combined with the length key mask.
        """
        from funasr_tpu.ops.masks import key_mask

        B, T, _ = xs.shape
        mask = key_mask(lengths, T, dtype=jnp.float32)  # (B, 1, T)
        if attn_mask is not None:
            mask = (mask, attn_mask)

        x = xs.astype(self.dtype) * (self.output_size ** 0.5)
        if self.input_layer == "pe":
            pe = sinusoidal_encoding(T, self.input_size, dtype=jnp.float32)
            x = x + pe[None, :, :].astype(self.dtype)
        elif self.input_layer is None:
            pass  # reference: scaled input straight into encoders0
        else:
            raise NotImplementedError(
                f"input_layer={self.input_layer!r} (only 'pe'/None for SANM)"
            )

        x, _ = EncoderLayerSANM(
            self.input_size, self.output_size, self.attention_heads,
            self.linear_units, self.kernel_size, self.sanm_shift,
            self.dropout_rate, self.attention_dropout_rate,
            self.dtype, self.param_dtype, name="encoders0",
        )(x, mask, deterministic)

        n_rest = self.num_blocks - 1
        from funasr_tpu.ops import quant
        from funasr_tpu.ops import sanm_layer_pallas as SL

        if (n_rest > 0 and quant.enabled() and SL.enabled()
                and attn_mask is None
                and deterministic
                and SL.supported(T, self.output_size, self.linear_units,
                                 self.attention_heads)):
            # fused int8 stack: params declared by a scanned holder (tree
            # identical to the module path), weights pre-quantized as one
            # stacked op outside the layer loop, layers run as a lax.scan
            # over the fused kernel (ops/sanm_layer_pallas.py).
            (ln1s, ln1b, wqkv, bqkv, fsmn, wout, bout,
             ln2s, ln2b, w1, b1, w2, b2) = declare_stacked_sanm_params(
                self.output_size, self.linear_units, self.kernel_size,
                self.param_dtype, n_rest)
            D = self.output_size
            wqkv8, sqkv = quant.quantize_rows(wqkv, axis=1)
            wout8, sout = quant.quantize_rows(wout, axis=1)
            w18, s1 = quant.quantize_rows(w1, axis=1)
            w28, s2 = quant.quantize_rows(w2, axis=1)
            r2 = lambda v: v[:, None, :].astype(jnp.float32)  # (L,N)->(L,1,N)
            lw = (r2(ln1s), r2(ln1b), wqkv8, sqkv, r2(bqkv),
                  fsmn.reshape(n_rest, self.kernel_size, D)
                  .astype(jnp.float32),
                  wout8, sout, r2(bout), r2(ln2s), r2(ln2b),
                  w18, s1, r2(b1), w28, s2, r2(b2))
            left = (self.kernel_size - 1) // 2 + max(self.sanm_shift, 0)
            lens32 = lengths.astype(jnp.int32)
            dtype = self.dtype
            n_head = self.attention_heads
            kright = self.kernel_size - 1 - left

            i8attn = os.environ.get("FUNASR_TPU_INT8_ATTN", "0") == "1"

            def body(h, layer_w):
                h = SL._call(h.astype(dtype), lens32, *layer_w,
                             n_head=n_head, left=left, right=kright,
                             int8_attn=i8attn)
                return h, None

            x, _ = jax.lax.scan(body, x, lw)
            if self.normalize_before:
                x = LayerNormF32(self.dtype, self.param_dtype,
                                 name="after_norm")(x)
            return x, lengths

        from funasr_tpu.parallel import pp as PP

        if (n_rest > 0 and PP.enabled()
                and not isinstance(mask, (tuple, list))
                and n_rest % PP.config()["mesh"].shape[
                    PP.config()["axis"]] == 0
                and B % PP.config()["n_micro"] == 0):
            # pipeline-parallel stack: layer axis sharded over the pp mesh
            # axis, GPipe microbatch schedule (parallel/pipeline.py).  The
            # stacked params are declared by the same holder the int8 path
            # uses, so the tree is identical to the nn.scan stack and the
            # unmodified train step / checkpoints work; the layer math is
            # EncoderLayerSANM.apply itself — no duplication.
            cfg = PP.config()
            from funasr_tpu.parallel.pipeline import pipeline_apply

            (ln1s, ln1b, wqkv, bqkv, fsmn, wout, bout,
             ln2s, ln2b, w1, b1, w2, b2) = declare_stacked_sanm_params(
                self.output_size, self.linear_units, self.kernel_size,
                self.param_dtype, n_rest)
            tree = {
                "norm1": {"scale": ln1s, "bias": ln1b},
                "self_attn": {
                    "linear_q_k_v": {"kernel": wqkv, "bias": bqkv},
                    "fsmn_block": fsmn,
                    "linear_out": {"kernel": wout, "bias": bout},
                },
                "norm2": {"scale": ln2s, "bias": ln2b},
                "feed_forward": {"w_1": {"kernel": w1, "bias": b1},
                                 "w_2": {"kernel": w2, "bias": b2}},
            }
            layer = EncoderLayerSANM(
                self.output_size, self.output_size, self.attention_heads,
                self.linear_units, self.kernel_size, self.sanm_shift,
                self.dropout_rate, self.attention_dropout_rate,
                self.dtype, self.param_dtype)
            need_rng = (not deterministic) and (
                self.dropout_rate > 0 or self.attention_dropout_rate > 0)
            drop_rng = self.make_rng("dropout") if need_rng else None

            def layer_fn(p, h, m, rng=None):
                rngs = {"dropout": rng} if rng is not None else None
                return layer.apply({"params": p}, h, m, deterministic,
                                   rngs=rngs)[0]

            x = pipeline_apply(
                layer_fn, tree, x, n_micro=cfg["n_micro"],
                mesh=cfg["mesh"], axis=cfg["axis"], extras=mask,
                batch_axis=cfg["batch_axis"], rng=drop_rng)
            if self.normalize_before:
                x = LayerNormF32(self.dtype, self.param_dtype,
                                 name="after_norm")(x)
            return x, lengths

        if n_rest > 0:
            layer_cls = EncoderLayerSANM
            if self.remat:
                layer_cls = nn.remat(
                    layer_cls, static_argnums=(3,),
                    policy=jax.checkpoint_policies.nothing_saveable,
                )
            ScanStack = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=n_rest,
                in_axes=(nn.broadcast, nn.broadcast),
                unroll=n_rest if self.unroll_layers else 1,
            )
            x, _ = ScanStack(
                self.output_size, self.output_size, self.attention_heads,
                self.linear_units, self.kernel_size, self.sanm_shift,
                self.dropout_rate, self.attention_dropout_rate,
                self.dtype, self.param_dtype, name="encoders",
            )(x, mask, deterministic)

        if self.normalize_before:
            x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        return x, lengths
