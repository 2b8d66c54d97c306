"""Transformer / Conformer CTC-attention hybrid ASR (reference
funasr/models/transformer/model.py, funasr/models/conformer/model.py).

Training: ``loss = ctc_weight * ctc + (1 - ctc_weight) * att`` with label
smoothing on the sos/eos-wrapped targets.  Inference: device-resident joint
CTC/attention beam search (funasr_tpu.ops.beam_search) — the reference's
Python hypothesis loop (transformer/search.py:34) re-designed as fixed beam
tensors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu import losses
from funasr_tpu.models.conformer import ConformerEncoder
from funasr_tpu.models.transformer.decoder import TransformerDecoder
from funasr_tpu.ops.beam_search import beam_search, mask_ctc_frames
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


def add_sos_eos(text, text_lengths, sos, eos, ignore_id=-1):
    """(ys_in = [sos] + y, ys_out = y + [eos]) like the reference
    add_sos_eos (transformer/utils/add_sos_eos.py)."""
    B, U = text.shape
    valid = sequence_mask(text_lengths, U, jnp.bool_)
    y = jnp.where(valid, text, 0)
    ys_in = jnp.concatenate([jnp.full((B, 1), sos, text.dtype), y], axis=1)
    pos = jnp.arange(U + 1)[None, :]
    ys_out = jnp.full((B, U + 1), ignore_id, text.dtype)
    ys_out = ys_out.at[:, :U].set(jnp.where(valid, text, ignore_id))
    ys_out = jnp.where(pos == text_lengths[:, None], eos, ys_out)
    return ys_in, ys_out, text_lengths + 1


class _HybridModel(nn.Module):
    """Shared CTC/attention model body; subclasses pick the encoder."""

    vocab_size: int
    input_size: int = 80
    encoder_name: Optional[str] = None  # registry override of the default
    encoder_conf: Dict[str, Any] = None
    decoder: str = "TransformerDecoder"
    decoder_conf: Dict[str, Any] = None
    ctc_weight: float = 0.3
    lsm_weight: float = 0.1
    length_normalized_loss: bool = False
    ignore_id: int = -1
    blank_id: int = 0
    sos: int = 1
    eos: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def default_encoder(self) -> str:
        raise NotImplementedError

    def make_encoder(self):
        """Encoder by registry name: the config's ``encoder`` key when set
        (AutoModel maps it to ``encoder_name``), else the family default."""
        name = self.encoder_name or self.default_encoder()
        conf = dict(self.encoder_conf or {})
        for k in ("selfattention_layer_type", "pos_enc_class",
                  "positional_dropout_rate", "pos_enc_layer_type",
                  "rel_pos_type", "macaron_style", "use_cnn_module",
                  "activation_type", "normalize_before"):
            conf.pop(k, None)
        if name != "SANMEncoder":  # SANM takes "pe"/None, not conv2d
            conf.setdefault("input_layer", "conv2d")
        cls = tables.get("encoder_classes", name)
        return cls(input_size=self.input_size, dtype=self.dtype,
                   param_dtype=self.param_dtype, name="encoder", **conf)

    def setup(self):
        self.encoder = self.make_encoder()
        d = self.encoder.output_size
        dec_conf = dict(self.decoder_conf or {})
        # decoder selectable by registry name (e.g. TransformerRWKVDecoder
        # = the reference's conformer_rwkv model)
        dec_cls = tables.get("decoder_classes", self.decoder)
        self.decoder_module = dec_cls(
            vocab_size=self.vocab_size, encoder_output_size=d,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="decoder", **dec_conf,
        )
        self.ctc_lo = nn.Dense(self.vocab_size, name="ctc_lo",
                               dtype=self.dtype, param_dtype=self.param_dtype)

    def encode(self, speech, speech_lengths, deterministic=True):
        return self.encoder(speech, speech_lengths, deterministic)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = False):
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        ys_in, ys_out, ys_lens = add_sos_eos(
            text, text_lengths, self.sos, self.eos, self.ignore_id
        )
        logits = self.decoder_module(enc, enc_lens, ys_in, ys_lens, deterministic)
        loss_att = losses.label_smoothing_loss(
            logits, ys_out, self.ignore_id, self.lsm_weight,
            self.length_normalized_loss,
        )
        acc = losses.th_accuracy(logits, ys_out, self.ignore_id)
        stats = {"loss_att": loss_att, "acc": acc}
        if self.ctc_weight > 0.0:
            ctc_logits = self.ctc_lo(enc)
            loss_ctc = losses.ctc_loss(ctc_logits, enc_lens, text, text_lengths,
                                       self.ignore_id, self.blank_id)
            loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
            stats["loss_ctc"] = loss_ctc
        else:
            loss = loss_att
        stats["loss"] = loss
        return loss, stats

    def decode_beam(
        self, speech, speech_lengths, beam: int = 10, maxlen: int = 64,
        decoding_ctc_weight: float = 0.3, length_bonus: float = 0.0,
        use_cache: bool = True, cache_stages: int = 4,
    ):
        """Joint CTC/attention beam decode -> (tokens (B,K,L), lengths, scores).

        ``use_cache=True`` (default) scores steps incrementally with the
        KV-cached scorer (ops/cached_decoder.py — the reference's
        transformer/decoder.py:334 ``batch_score`` cache semantics) when
        the decoder is the plain TransformerDecoder; other decoder kinds
        (RWKV/conv) fall back to full-prefix rescoring.

        ``cache_stages`` splits the decode into that many while_loop
        stages with the KV cache buffer grown at each boundary (exact
        numerics; the cached step's cost scales with the buffer length —
        ops/beam_search.py ``cache_stages``).  1 disables; short decodes
        (maxlen < 32) run single-stage regardless.
        """
        enc, enc_lens = self.encode(speech, speech_lengths, True)
        B = enc.shape[0]

        from funasr_tpu.models.transformer.decoder import TransformerDecoder

        decode_fn = step_score_fn = dec_state = state_reorder_fn = None
        if use_cache and type(self.decoder_module) is TransformerDecoder:
            from funasr_tpu.ops.cached_decoder import CachedTransformerDecoder

            scorer = CachedTransformerDecoder(
                self.variables["params"]["decoder"],
                enc.astype(self.dtype), enc_lens,
                n_head=self.decoder_module.attention_heads,
                maxlen=maxlen, dtype=self.dtype, beam=beam)
            step_score_fn = scorer.step
            dec_state = scorer.init_state()
            state_reorder_fn = CachedTransformerDecoder.reorder_state
        else:
            enc_rep = jnp.repeat(enc, beam, axis=0)
            lens_rep = jnp.repeat(enc_lens, beam, axis=0)

            def decode_fn(ys, step):
                L = ys.shape[1]
                lens = jnp.full((ys.shape[0],), L, jnp.int32)
                logits = self.decoder_module(enc_rep, lens_rep, ys, lens, True)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                return jnp.take_along_axis(
                    logp, jnp.broadcast_to(step[None, None, None],
                                           (ys.shape[0], 1, 1)), axis=1
                )[:, 0]

        ctc_logp = None
        if decoding_ctc_weight > 0.0 and self.ctc_weight > 0.0:
            ctc_logp = jax.nn.log_softmax(
                self.ctc_lo(enc).astype(jnp.float32), axis=-1
            )
            ctc_logp = mask_ctc_frames(ctc_logp, enc_lens, self.blank_id)

        stage_bounds = None
        state_grow_fn = None
        if step_score_fn is not None and cache_stages > 1 and maxlen >= 32:
            from funasr_tpu.ops.cached_decoder import resize_state

            stage_bounds = [maxlen * (i + 1) // cache_stages
                            for i in range(cache_stages)]
            state_grow_fn = resize_state
        return beam_search(
            decode_fn, B, beam, self.vocab_size, self.sos, self.eos, maxlen,
            ctc_logp=ctc_logp, ctc_weight=decoding_ctc_weight,
            length_bonus=length_bonus, blank_id=self.blank_id,
            step_score_fn=step_score_fn, dec_state=dec_state,
            state_reorder_fn=state_reorder_fn,
            cache_stages=stage_bounds, state_grow_fn=state_grow_fn,
        )

    def decode_beam_align(
        self, speech, speech_lengths, beam: int = 10, maxlen: int = 64,
        decoding_ctc_weight: float = 0.3, length_bonus: float = 0.0,
        use_cache: bool = True,
    ):
        """``decode_beam`` plus a CTC forced alignment of EVERY hypothesis
        against the encoder frames -> per-hypothesis frame-level token
        spans (the reference WFST decoder's lattice-backed word timings,
        runtime/onnxruntime/src/wfst-decoder.cpp — here each n-best entry
        gets its own alignment).  Returns (tokens (B, K, L), lengths,
        scores, align (B, K, T) frame label grid, enc_lens (B,))."""
        res = self.decode_beam(speech, speech_lengths, beam, maxlen,
                               decoding_ctc_weight, length_bonus,
                               use_cache)
        enc, enc_lens = self.encode(speech, speech_lengths, True)
        logp = jax.nn.log_softmax(
            self.ctc_lo(enc).astype(jnp.float32), axis=-1)
        from funasr_tpu.ops.ctc_align import ctc_forced_align

        B, K, L = res.tokens.shape
        toks = jnp.where(
            jnp.arange(L)[None, None, :] < res.lengths[:, :, None],
            res.tokens, self.blank_id).reshape(B * K, L)
        tlens = res.lengths.reshape(B * K)
        align = ctc_forced_align(
            jnp.repeat(logp, K, axis=0), toks,
            jnp.repeat(enc_lens, K, axis=0), tlens,
            blank=self.blank_id).reshape(B, K, -1)
        return res.tokens, res.lengths, res.scores, align, enc_lens


@tables.register("model_classes", "Transformer")
class Transformer(_HybridModel):
    """AR CTC/attention model over the vanilla TransformerEncoder
    (reference funasr/models/transformer/model.py)."""

    def default_encoder(self) -> str:
        return "TransformerEncoder"


@tables.register("model_classes", "Conformer")
class Conformer(_HybridModel):
    def default_encoder(self) -> str:
        return "ConformerEncoder"


@tables.register("model_classes", "SANM")
class SANM(_HybridModel):
    """AR SAN-M model: the Transformer contract with the SANM encoder
    (reference funasr/models/sanm/model.py:14 ``SANM(Transformer)``)."""

    def default_encoder(self) -> str:
        return "SANMEncoder"


@tables.register("model_classes", "CTC")
class CTCModel(nn.Module):
    """Encoder + CTC head only — no attention decoder (reference
    funasr/models/ctc/model.py:17, registered as "CTC": forward computes
    just the CTC loss, :97-104)."""

    vocab_size: int
    input_size: int = 80
    encoder_name: Optional[str] = None
    encoder_conf: Dict[str, Any] = None
    ignore_id: int = -1
    blank_id: int = 0
    length_normalized_loss: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        name = self.encoder_name or "TransformerEncoder"
        conf = dict(self.encoder_conf or {})
        if name != "SANMEncoder":
            conf.setdefault("input_layer", "conv2d")
        cls = tables.get("encoder_classes", name)
        self.encoder = cls(input_size=self.input_size, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="encoder",
                           **conf)
        self.ctc_lo = nn.Dense(self.vocab_size, name="ctc_lo",
                               dtype=self.dtype, param_dtype=self.param_dtype)

    def encode(self, speech, speech_lengths, deterministic=True):
        return self.encoder(speech, speech_lengths, deterministic)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = False):
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        logits = self.ctc_lo(enc)
        loss = losses.ctc_loss(logits, enc_lens, text, text_lengths,
                               self.ignore_id, self.blank_id)
        return loss, {"loss": loss, "loss_ctc": loss}

    def greedy_decode(self, speech, speech_lengths):
        from funasr_tpu.ops.ctc_decode import ctc_greedy_decode

        enc, enc_lens = self.encode(speech, speech_lengths, True)
        logp = jax.nn.log_softmax(self.ctc_lo(enc).astype(jnp.float32), -1)
        return ctc_greedy_decode(logp, enc_lens, self.blank_id)
