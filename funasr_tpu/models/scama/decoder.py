"""SCAMA chunk-aware FSMN decoder (reference funasr/models/scama/decoder.py:204
``FsmnDecoderSCAMAOpt``).

SCAMA ("Streaming Chunk-Aware Multihead Attention", arXiv:2006.01712)
decodes AUTOREGRESSIVELY with a causal-FSMN decoder whose cross-attention
into the encoder is masked per token: token i may only attend encoder
frames up to the end of the chunk containing its CIF fire frame (plus a
bounded look-back window) — that chunk-synchronised attention IS the model.

Layer structure is the Paraformer SANM decoder's (FFN -> FSMN memory ->
cross-attention; reference scama/decoder.py:27 ``DecoderLayerSANM`` is the
same block), with two differences faithful to the reference:

- the input is the TOKEN EMBEDDING of the sos-prefixed target (AR teacher
  forcing / step decoding), not CIF acoustic embeddings (decoder.py:250
  ``input_layer == "embed"``: a bare ``nn.Embedding``, no posenc/scaling);
- the FSMN kernel defaults to 21 taps with ``sanm_shfit=(k-1)//2``
  (decoder.py:277), i.e. fully causal — tokens only see their past.

The cross-attention chunk mask is built by :func:`scama_cross_mask`
(reference chunk_utilis.py:370 ``build_scama_mask_for_cross_attention_
decoder`` with the train-call parameterisation model.py:341-366:
per-frame alignments, chunk_size=1, attention_chunk_size=encoder chunk).

Step decoding uses :class:`CachedScamaDecoder` — the TPU-native version of
the reference's ``forward_one_step`` FSMN cache (decoder.py:430): each
layer keeps a rolling k-tap window of its FSMN input, cross K/V are
projected once, and one beam step is a single ``lax.scan`` over layers.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.models.paraformer.decoder import DecoderLayerSANM
from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.ops.cached_decoder import _dense, _ln, _mha_step_shared
from funasr_tpu.ops.masks import key_mask, sequence_mask
from funasr_tpu.ops.quant import QDense
from funasr_tpu.registry import tables

Dtype = Any


def scama_cross_mask(peaks: jnp.ndarray, enc_lens: jnp.ndarray,
                     token_lens: jnp.ndarray, n_tokens: int,
                     chunk: int, look_back: int = 1,
                     n_frames: Optional[int] = None) -> jnp.ndarray:
    """Chunk-synchronised cross-attention mask (B, U, T).

    peaks (B, T): per-frame CIF fire indicator (predictor alignments with
    chunk_size=1, reference model.py:336 ``gen_frame_alignments``);
    token i attends frames [end_i - chunk*(look_back+1), end_i) where
    end_i = the encoder-chunk boundary after token i's fire frame
    (chunk_utilis.py:405-436: fire frame -> ``(floor(f/chunk)+1)*chunk``
    rounding, ``mask_flip2`` look-back window), intersected with the
    usual length masks.  Tokens that never fire keep the last frame's
    window (the reference clip to ``chunk_num``).  The CIF tail frame
    (peaks may be one frame longer than the encoder memory) is dropped —
    ``n_frames`` pins the mask's T to the memory length.
    """
    B, T = peaks.shape
    if n_frames is not None and T != n_frames:
        peaks = (peaks[:, :n_frames] if T > n_frames else jnp.pad(
            peaks, ((0, 0), (0, n_frames - T))))
        T = n_frames
    peaks = lax.stop_gradient(peaks).astype(jnp.int32)
    cum = jnp.cumsum(peaks, axis=1)  # (B, T)
    want = jnp.arange(1, n_tokens + 1)[None, :, None]  # (1, U, 1)
    # fire frame of token i = #frames with cumulative fires < i+1
    ff = jnp.sum((cum[:, None, :] < want).astype(jnp.int32), axis=-1)
    ff = jnp.clip(ff, 0, T - 1)  # (B, U)
    end = (ff // chunk + 1) * chunk  # exclusive chunk boundary
    beg = jnp.maximum(end - chunk * (look_back + 1), 0) if look_back >= 0 \
        else jnp.zeros_like(end)
    t = jnp.arange(T)[None, None, :]
    mask = (t >= beg[..., None]) & (t < end[..., None])
    mask &= (t < enc_lens[:, None, None])
    mask &= (jnp.arange(n_tokens)[None, :] < token_lens[:, None])[..., None]
    return mask.astype(jnp.float32)


@tables.register("decoder_classes", "FsmnDecoderSCAMAOpt")
class FsmnDecoderSCAMAOpt(nn.Module):
    """AR chunk-aware SANM decoder (reference scama/decoder.py:204)."""

    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    att_layer_num: int = 6
    kernel_size: int = 21
    sanm_shift: int = -1  # -1 = reference default (kernel_size - 1) // 2
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    use_output_layer: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def shift(self) -> int:
        return ((self.kernel_size - 1) // 2 if self.sanm_shift < 0
                else self.sanm_shift)

    def setup(self):
        d = self.encoder_output_size
        self.embed = nn.Embed(self.vocab_size, d, name="embed",
                              param_dtype=self.param_dtype, dtype=self.dtype)
        self.decoders = nn.scan(
            DecoderLayerSANM,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.att_layer_num,
            in_axes=(nn.broadcast, nn.broadcast),
        )(
            d, self.attention_heads, self.linear_units, self.kernel_size,
            self.shift, self.dropout_rate,
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
                self.shift, self.dropout_rate,
                self.self_attention_dropout_rate,
                self.src_attention_dropout_rate, True, False,
                self.dtype, self.param_dtype, name="decoders2",
            )
        else:
            self.decoders2 = None
        self.decoders3 = DecoderLayerSANM(
            d, self.attention_heads, self.linear_units, self.kernel_size,
            self.shift, self.dropout_rate,
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
        memory: jnp.ndarray,        # (B, T, D)
        memory_lengths: jnp.ndarray,
        ys_in: jnp.ndarray,         # (B, U) sos-prefixed target ids
        ys_in_lengths: jnp.ndarray,
        chunk_mask: Optional[jnp.ndarray] = None,  # (B, U, T)
        deterministic: bool = True,
    ):
        """Teacher-forced scoring -> logits (B, U, vocab)
        (reference decoder.py:353 ``forward``)."""
        B, U = ys_in.shape
        T = memory.shape[1]
        tgt_mask = sequence_mask(ys_in_lengths, U,
                                 dtype=jnp.float32)[:, :, None]
        memory_mask = key_mask(memory_lengths, T, dtype=jnp.float32)
        if chunk_mask is not None:
            memory_mask = memory_mask * chunk_mask  # (B, U, T)

        x = self.embed(ys_in).astype(self.dtype)
        inputs = (tgt_mask, memory.astype(self.dtype), memory_mask)
        x, _ = self.decoders(x, inputs, deterministic)
        if self.decoders2 is not None:
            x, _ = self.decoders2(x, inputs, deterministic)
        x, _ = self.decoders3(x, inputs, deterministic)
        hidden = self.after_norm(x)
        if self.use_output_layer:
            return self.output_layer(hidden)
        return hidden


class ScamaState(NamedTuple):
    """Rolling FSMN windows, layer-stacked: (L1+L2, N, K, D)."""

    fsmn: jnp.ndarray


class CachedScamaDecoder:
    """Step scorer over an FsmnDecoderSCAMAOpt param tree (the TPU
    equivalent of reference decoder.py:430 ``forward_one_step`` + the
    MultiHeadedAttentionSANMDecoder cache, attention.py:521-537).

    ``cross_mask`` must be (B, U_max, T) — per UTTERANCE ONLY (chunk
    windows come from the predictor's fire alignment, shared by all beam
    rows; a per-hypothesis mask is not supported — the shared-key
    attention broadcasts a (B, T) key mask).  It applies the per-token
    SCAMA chunk mask row at each step (offline chunk-aware decoding);
    without it the memory length mask alone gates cross-attention
    (streaming serving, where the visible memory IS the chunk window).
    """

    def __init__(self, dec_params, memory, memory_lengths, *, n_head,
                 kernel_size, dtype=jnp.float32, cross_mask=None, beam=1):
        """memory (B, T, D) per utterance; hypothesis axis N = B*beam
        (cross K/V beam-shared; ``cross_mask`` must be per utterance,
        (B, U, T) — see the class docstring)."""
        self.p = dec_params
        self.n_head = n_head
        self.K = kernel_size
        self.dtype = dtype
        self.beam = beam
        self.cross_mask = cross_mask
        B, T, _ = memory.shape
        N = B * beam
        self.N = N
        mem = memory.astype(dtype)
        self.has_dec2 = "decoders2" in dec_params
        self.L1 = dec_params["decoders"]["self_attn"]["fsmn_block"].shape[0]
        self.L2 = (dec_params["decoders2"]["self_attn"]["fsmn_block"].shape[0]
                   if self.has_dec2 else 0)
        self.D = dec_params["embed"]["embedding"].shape[-1]

        def _kv(p):
            kv = _dense(mem, p, dtype)
            return jnp.split(kv, 2, axis=-1)

        ck, cv = jax.vmap(_kv)(dec_params["decoders"]["src_attn"]
                               ["linear_k_v"])
        self.ck, self.cv = ck, cv  # (L1, N, T, F)
        self.mem_valid = (jnp.arange(T)[None, :]
                          < memory_lengths[:, None])  # (B, T)

    def init_state(self) -> ScamaState:
        return ScamaState(fsmn=jnp.zeros(
            (self.L1 + self.L2, self.N, self.K, self.D), self.dtype))

    def _layer(self, x, lp, buf, ck_l=None, cv_l=None, key_valid=None):
        """One DecoderLayerSANM step on a single token (N, 1, D)."""
        dtype = self.dtype
        residual = x
        h = _ln(x, lp["norm1"]).astype(dtype)
        ff = lp["feed_forward"]
        h = _dense(h, ff["w_1"], dtype)
        h = jax.nn.relu(h)
        h = _ln(h, ff["norm"]).astype(dtype)
        h = _dense(h, ff["w_2"], dtype)
        # FSMN memory: rolling causal window (torch cache semantics
        # attention.py:531 ``cat(cache[:, :, 1:], x)``)
        h2 = _ln(h, lp["norm2"]).astype(dtype)
        buf = jnp.concatenate([buf[:, 1:], h2], axis=1)  # (N, K, D)
        kern = lp["self_attn"]["fsmn_block"].astype(dtype)  # (K, 1, D)
        conv = jnp.sum(buf * kern[None, :, 0, :], axis=1, keepdims=True)
        x = residual + conv + h2  # fsmn adds its input residual
        if "src_attn" in lp:
            sa = lp["src_attn"]
            h3 = _ln(x, lp["norm3"]).astype(dtype)
            q = _dense(h3, sa["linear_q"], dtype)
            ctx = _mha_step_shared(q, ck_l, cv_l, key_valid, self.n_head,
                                   self.beam, dtype)
            x = x + _dense(ctx, sa["linear_out"], dtype)
        return x, buf

    def step(self, y_tok: jnp.ndarray, pos, state: ScamaState
             ) -> Tuple[jnp.ndarray, ScamaState]:
        p, dtype = self.p, self.dtype
        x = p["embed"]["embedding"][y_tok].astype(dtype)[:, None, :]
        key_valid = self.mem_valid
        if self.cross_mask is not None:
            row = lax.dynamic_slice_in_dim(self.cross_mask, pos, 1,
                                           axis=1)[:, 0]
            key_valid = key_valid & (row > 0)

        def layer1(x, xs):
            lp, ck_l, cv_l, buf = xs
            x, buf = self._layer(x, lp, buf, ck_l, cv_l, key_valid)
            return x, buf

        # unrolled: dispatch-bound step, same finding as
        # ops/cached_decoder (docs/ROOFLINE.md r4)
        x, buf1 = lax.scan(
            layer1, x, (p["decoders"], self.ck, self.cv,
                        state.fsmn[:self.L1]), unroll=True)
        if self.has_dec2:
            def layer2(x, xs):
                lp, buf = xs
                x, buf = self._layer(x, lp, buf)
                return x, buf

            x, buf2 = lax.scan(layer2, x,
                               (p["decoders2"], state.fsmn[self.L1:]),
                               unroll=True)
            fsmn = jnp.concatenate([buf1, buf2], axis=0)
        else:
            fsmn = buf1
        # decoders3: FFN only, output REPLACES x (no residual)
        lp3 = p["decoders3"]
        h = _ln(x, lp3["norm1"]).astype(dtype)
        h = _dense(h, lp3["feed_forward"]["w_1"], dtype)
        h = jax.nn.relu(h)
        h = _ln(h, lp3["feed_forward"]["norm"]).astype(dtype)
        x = _dense(h, lp3["feed_forward"]["w_2"], dtype)
        x = _ln(x, p["after_norm"]).astype(dtype)
        logits = _dense(x, p["output_layer"], dtype)[:, 0]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return logp, ScamaState(fsmn=fsmn)

    @staticmethod
    def reorder_state(state: ScamaState, src_flat: jnp.ndarray
                      ) -> ScamaState:
        return ScamaState(fsmn=state.fsmn[:, src_flat])
