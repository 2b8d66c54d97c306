"""Chunked / causal streaming Conformer encoder.

Reference: funasr/models/conformer/encoder.py:609 ``CausalConvolution``
(left-padded depthwise conv with a (kernel-1)-frame streaming cache),
:705 ``ChunkEncoderLayer`` (per-layer attention K/V cache + conv cache in
``chunk_forward``) and :885 ``ConformerChunkEncoder`` / registry name
``ChunkConformerEncoder`` (dynamic-chunk-mask training via
transformer/utils/nets_utils.py:608 ``make_chunk_mask``, chunk-local
``StreamingConvInput`` embedding, ``chunk_forward`` streaming inference).

TPU-first design notes:
- training/full decode: ONE program over the whole utterance; the chunk
  restriction is an attention MASK (``make_chunk_mask``) and the conv is
  causal (left-pad k-1), so the same kernels as the offline Conformer run
  at full MXU batch — no per-chunk host loop at train time;
- streaming: ``forward_chunk`` is a fixed-shape jitted step carrying an
  explicit cache pytree (per layer: (B, left, D) attention K/V input +
  (B, k-1, D) conv tail) — caches thread through ``lax.scan``-able code,
  no Python-side module state (the reference mutates ``self.cache``);
- chunk-by-chunk output == the full chunk-masked forward EXACTLY (eval
  mode), pinned by tests/test_conformer_streaming.py.

The embedding processes each chunk independently (the reference reshapes
to (B*N_chunks, cs*sub, F) before the conv — subsampling.py:573), so the
streaming embed matches the training embed bit-for-bit.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.conformer import (FeedForward,
                                         rel_positional_encoding)
from funasr_tpu.models.sanm import LayerNormF32, masked_softmax
from funasr_tpu.ops.quant import QDense
from funasr_tpu.registry import tables

Dtype = Any


def make_chunk_mask(size: int, chunk_size: int,
                    left_chunk_size: int = 0) -> jnp.ndarray:
    """(T, T) bool chunk-attention mask, True = ATTEND (note: the torch
    reference returns the inverted "masked" convention; here True=keep to
    compose with ``masked_softmax``).  Frame i sees frames
    [max((i//cs - left_chunks)*cs, 0), (i//cs + 1)*cs);
    left_chunk_size < 0 = full left context, 0 = current chunk only.
    Reference transformer/utils/nets_utils.py:608."""
    i = np.arange(size)
    blk = i // chunk_size
    if left_chunk_size < 0:
        start = np.zeros(size, np.int64)
    else:
        start = np.maximum((blk - left_chunk_size) * chunk_size, 0)
    end = (blk + 1) * chunk_size
    j = np.arange(size)
    keep = (j[None, :] >= start[:, None]) & (j[None, :] < end[:, None])
    return jnp.asarray(keep)


class CausalConvModule(nn.Module):
    """Reference ``CausalConvolution`` (conformer/encoder.py:609):
    pointwise-GLU -> LEFT-padded depthwise conv (k-1 frames of history)
    -> BatchNorm -> activation -> pointwise.  ``cache`` carries the last
    k-1 post-GLU frames between chunks; semantics match the reference's
    cat([cache, x]) exactly (zero-init cache == the zero left pad)."""

    channels: int
    kernel_size: int = 31
    activation: str = "swish"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        h = QDense(2 * self.channels, name="pointwise_conv1",
                   dtype=self.dtype, param_dtype=self.param_dtype)(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        lorder = self.kernel_size - 1
        if cache is None:
            hist = jnp.zeros((h.shape[0], lorder, h.shape[2]), h.dtype)
        else:
            hist = cache.astype(h.dtype)
        hcat = jnp.concatenate([hist, h], axis=1)
        new_cache = hcat[:, -lorder:, :] if lorder > 0 else hist
        kernel = self.param("depthwise_conv", nn.initializers.lecun_normal(),
                            (self.kernel_size, 1, self.channels),
                            self.param_dtype)
        dw_bias = self.param("depthwise_conv_bias", nn.initializers.zeros,
                             (self.channels,), self.param_dtype)
        from funasr_tpu.ops.dwconv import depthwise_conv1d

        h = depthwise_conv1d(hcat, kernel, 0, 0) + dw_bias.astype(h.dtype)
        h = nn.BatchNorm(use_running_average=deterministic, name="norm",
                         dtype=jnp.float32, param_dtype=self.param_dtype,
                         )(h.astype(jnp.float32)).astype(self.dtype)
        h = h * nn.sigmoid(h) if self.activation == "swish" else nn.relu(h)
        h = QDense(self.channels, name="pointwise_conv2",
                   dtype=self.dtype, param_dtype=self.param_dtype)(h)
        return h, new_cache


class ChunkRelPosAttention(nn.Module):
    """Rel-pos MHA supporting a left-context K/V prefix (reference
    transformer/attention.py:411 ``RelPositionMultiHeadedAttentionChunk``).

    Query rows are the current T1 frames; keys are ``left`` cached frames
    followed by the T1 frames.  The positional term is computed by direct
    gather on the (2L-1, d) rel table — chunk shapes are small, and the
    same gather drives BOTH the full forward (left=0, T1=T) and the
    streaming step, which is what makes the two paths bit-equal."""

    n_head: int
    n_feat: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, mask, left: int,
                 deterministic: bool = True):
        """q_in (B, T1, D); kv_in (B, left+T1, D); mask (B, T1, left+T1)
        bool/float keep-mask or None."""
        B, T1, _ = q_in.shape
        T2 = kv_in.shape[1]
        H = self.n_head
        d_k = self.n_feat // H
        q = QDense(self.n_feat, name="linear_q", dtype=self.dtype,
                   param_dtype=self.param_dtype)(q_in)
        k = QDense(self.n_feat, name="linear_k", dtype=self.dtype,
                   param_dtype=self.param_dtype)(kv_in)
        v = QDense(self.n_feat, name="linear_v", dtype=self.dtype,
                   param_dtype=self.param_dtype)(kv_in)
        # rel table for rel = (left + i) - j, i in [0,T1), j in [0,T2):
        # rel spans [-(T1-1) ... left+T1-1] wait: min rel = (left+0)-(T2-1)
        # = left - left - T1 + 1 = 1 - T1; max rel = left + T1 - 1 = T2 - 1.
        pos = rel_positional_encoding(T2, self.n_feat)  # (2*T2-1, d): row r
        # encodes rel = (T2-1) - r
        p = QDense(self.n_feat, use_bias=False, name="linear_pos",
                   dtype=self.dtype, param_dtype=self.param_dtype)(
            pos.astype(self.dtype))  # (2*T2-1, D)
        p = p.reshape(-1, H, d_k)
        pos_bias_u = self.param("pos_bias_u",
                                nn.initializers.xavier_uniform(),
                                (H, d_k), self.param_dtype)
        pos_bias_v = self.param("pos_bias_v",
                                nn.initializers.xavier_uniform(),
                                (H, d_k), self.param_dtype)
        q = q.reshape(B, T1, H, d_k)
        k = k.reshape(B, T2, H, d_k)
        v = v.reshape(B, T2, H, d_k)
        q_u = q + pos_bias_u.astype(q.dtype)
        q_v = q + pos_bias_v.astype(q.dtype)
        ac = jnp.einsum("bihd,bjhd->bhij", q_u, k)
        # row index into the table: r = (T2-1) - rel = (T2-1) - (left+i-j)
        i_idx = jnp.arange(T1)[:, None]
        j_idx = jnp.arange(T2)[None, :]
        rows = (T2 - 1) - (left + i_idx - j_idx)  # (T1, T2) in [0, 2*T2-2]
        p_g = p[rows]  # (T1, T2, H, d_k)
        bd = jnp.einsum("bihd,ijhd->bhij", q_v, p_g)
        scores = (ac + bd) * (d_k ** -0.5)
        m = None if mask is None else mask[:, None, :, :]
        attn = masked_softmax(scores, m)
        attn = nn.Dropout(self.dropout_rate)(attn,
                                             deterministic=deterministic)
        ctx = jnp.einsum("bhij,bjhd->bihd", attn.astype(v.dtype), v)
        ctx = ctx.reshape(B, T1, self.n_feat)
        return QDense(self.n_feat, name="linear_out", dtype=self.dtype,
                      param_dtype=self.param_dtype)(ctx)


class ChunkConformerLayer(nn.Module):
    """Reference ``ChunkEncoderLayer`` (conformer/encoder.py:705):
    macaron FFN -> rel-pos chunk MHA -> causal conv -> FFN -> final LN.
    One module serves both the full forward (``left=0`` over the whole
    padded grid, chunk mask folded into ``mask``) and the streaming step
    (``left>0`` K/V prefix from the cache)."""

    size: int
    n_head: int
    linear_units: int
    cnn_kernel: int = 31
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, left: int = 0,
                 att_cache: Optional[jnp.ndarray] = None,
                 conv_cache: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm_macaron")(x)
        h = FeedForward(self.linear_units, self.size, self.dropout_rate,
                        self.dtype, self.param_dtype,
                        name="feed_forward_macaron")(h, deterministic)
        x = res + 0.5 * h
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype,
                         name="norm_self_att")(x)
        if left > 0:
            kv = jnp.concatenate([att_cache.astype(h.dtype), h], axis=1)
        else:
            kv = h
        new_att_cache = kv[:, -left:, :] if left > 0 else None
        h = ChunkRelPosAttention(
            self.n_head, self.size, self.dropout_rate, self.dtype,
            self.param_dtype, name="self_att",
        )(h, kv, mask, left, deterministic)
        x = res + h
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm_conv")(x)
        h, new_conv_cache = CausalConvModule(
            self.size, self.cnn_kernel, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_mod",
        )(h, conv_cache, deterministic)
        x = res + h
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype,
                         name="norm_feed_forward")(x)
        h = FeedForward(self.linear_units, self.size, self.dropout_rate,
                        self.dtype, self.param_dtype,
                        name="feed_forward")(h, deterministic)
        x = res + 0.5 * h
        x = LayerNormF32(self.dtype, self.param_dtype, name="norm_final")(x)
        return x, new_att_cache, new_conv_cache


class StreamingConvInput(nn.Module):
    """Reference transformer/utils/subsampling.py:379 ``StreamingConvInput``
    (non-VGG branch): chunk-local Conv2d stack + linear.  factor 1 keeps
    the frame rate (two convs stride (1, 2): freq /4); factor 4 is the
    conv2d pair with time stride 2 each.  ``chunk_size`` (in SUBSAMPLED
    frames) makes the conv see each chunk independently — the invariant
    that lets the streaming embed equal the training embed."""

    input_size: int
    conv_size: int
    subsampling_factor: int = 1
    output_size: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, chunk_size: Optional[int] = None):
        B, T, F0 = x.shape
        sub = self.subsampling_factor
        if sub not in (1, 4):
            raise NotImplementedError(
                f"StreamingConvInput subsampling_factor={sub} (1 / 4)")
        if chunk_size is not None:
            raw_cs = chunk_size * sub
            Tp = -(-T // raw_cs) * raw_cs
            x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
            n_chunks = Tp // raw_cs
            x = x.reshape(B * n_chunks, raw_cs, F0)
        h = x[..., None].astype(self.dtype)  # (b, t, f, 1)
        if sub == 1:
            h = nn.Conv(self.conv_size, (3, 3), strides=(1, 2),
                        padding=((1, 1), (0, 0)), name="conv0",
                        dtype=self.dtype, param_dtype=self.param_dtype)(h)
            h = nn.relu(h)
            h = nn.Conv(self.conv_size, (3, 3), strides=(1, 2),
                        padding=((1, 1), (0, 0)), name="conv1",
                        dtype=self.dtype, param_dtype=self.param_dtype)(h)
            h = nn.relu(h)
            out_lengths = lengths
        else:  # 4: stride-2 twice (kernel_2=3, stride_2=2 per
            # sub_factor_to_params(4))
            h = nn.Conv(self.conv_size, (3, 3), strides=(2, 2),
                        padding=((1, 1), (0, 0)), name="conv0",
                        dtype=self.dtype, param_dtype=self.param_dtype)(h)
            h = nn.relu(h)
            h = nn.Conv(self.conv_size, (3, 3), strides=(2, 2),
                        padding=((1, 1), (0, 0)), name="conv1",
                        dtype=self.dtype, param_dtype=self.param_dtype)(h)
            h = nn.relu(h)
            # reference mask slicing [:, ::2][:, ::stride_2]
            out_lengths = -(-(-(-lengths // 2)) // 2)
        b2, t2, f2, c = h.shape
        h = h.reshape(b2, t2, f2 * c)
        if chunk_size is not None:
            h = h.reshape(B, n_chunks * t2, f2 * c)
        if self.output_size is not None:
            h = QDense(self.output_size, name="out", dtype=self.dtype,
                       param_dtype=self.param_dtype)(h)
        return h, jnp.minimum(out_lengths, h.shape[1])


@tables.register("encoder_classes", "ChunkConformerEncoder")
class ChunkConformerEncoder(nn.Module):
    """Reference ``ConformerChunkEncoder`` (conformer/encoder.py:885).

    Call modes:
    - ``__call__(xs, lengths)``: full-context forward;
    - ``__call__(xs, lengths, chunk_size=cs, left_chunk_size=l)``: the
      dynamic-chunk-mask forward (training draws cs on the host per step
      — reference randint logic lives in the recipe/train step since jit
      shapes are static per cs);
    - ``forward_chunk(xs_chunk, lengths, caches, offset)``: streaming step
      over one chunk (SUBSAMPLED length = chunk_size) with the per-layer
      cache list; ``init_cache(B, left_context)`` builds the zero state.
      left_context is in subsampled frames and must be a multiple of
      chunk_size to match ``left_chunk_size = left_context // chunk_size``.
    """

    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.0
    cnn_module_kernel: int = 31
    subsampling_factor: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.embed = StreamingConvInput(
            self.input_size, self.output_size,
            subsampling_factor=self.subsampling_factor,
            output_size=self.output_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="embed")
        self.layers = [
            ChunkConformerLayer(
                self.output_size, self.attention_heads, self.linear_units,
                self.cnn_module_kernel, self.dropout_rate, self.dtype,
                self.param_dtype, name=f"layer_{i}")
            for i in range(self.num_blocks)]

    def __call__(self, xs, lengths, deterministic: bool = True,
                 chunk_size: Optional[int] = None,
                 left_chunk_size: int = 0):
        x, olens = self.embed(xs, lengths, chunk_size)
        B, T, _ = x.shape
        valid = (jnp.arange(T)[None, :] < olens[:, None])  # (B, T)
        mask = valid[:, None, :] & valid[:, :, None]  # (B, T, T)
        if chunk_size is not None:
            mask = mask & make_chunk_mask(T, chunk_size,
                                          left_chunk_size)[None]
        mask = mask.astype(jnp.float32)
        for layer in self.layers:
            x, _, _ = layer(x, mask, 0, None, None, deterministic)
        return x, olens

    def init_cache(self, batch: int, left_context: int) -> List:
        """Zero streaming state: per layer (att (B, left, D) in the LAYER
        INPUT space, conv (B, k-1, D) post-GLU tail)."""
        return [
            (jnp.zeros((batch, left_context, self.output_size)),
             jnp.zeros((batch, self.cnn_module_kernel - 1,
                        self.output_size)))
            for _ in range(self.num_blocks)]

    def forward_chunk(self, xs, caches, left_context: int,
                      valid_left: Optional[int] = None):
        """One streaming step.  ``xs`` (B, chunk*sub, F) raw features of
        the chunk; returns (out (B, chunk, D), new_caches).  All shapes
        static -> one jit program per (chunk, left_context).

        ``valid_left``: how many of the ``left_context`` cache frames hold
        real history (< left_context during the first chunks).  Masking
        the zero-initialized remainder keeps this path EXACTLY equal to
        the full chunk-masked forward; the torch reference attends into
        its zero cache instead (encoder.py:856 ``chunk_forward`` passes no
        cache mask) — a small-warmup approximation we do not reproduce."""
        B = xs.shape[0]
        lens = jnp.full((B,), xs.shape[1], jnp.int32)
        x, _ = self.embed(xs, lens, None)
        T1 = x.shape[1]
        mask = None
        if valid_left is not None and valid_left < left_context:
            j = jnp.arange(left_context + T1)
            keep = (j >= left_context - valid_left)
            mask = jnp.broadcast_to(keep[None, None, :],
                                    (B, T1, left_context + T1)
                                    ).astype(jnp.float32)
        new_caches = []
        for layer, (att_c, conv_c) in zip(self.layers, caches):
            x, na, nc = layer(x, mask, left_context, att_c, conv_c, True)
            new_caches.append((na, nc))
        return x, new_caches
