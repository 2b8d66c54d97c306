"""SA-ASR: joint speaker-attributed ASR (reference
funasr/models/sa_asr/e2e_sa_asr.py:40 ``SAASRModel``).

The reference model wires: a hybrid CTC/attention ASR encoder, a separate
speaker encoder over the SAME fbank (nearest-interpolated onto the ASR
frame rate, e2e_sa_asr.py:299), and a JOINT autoregressive decoder called
as ``decoder(asr_enc, spk_enc, lens, ys, ys_lens, profile, profile_lens)
-> (token logits, speaker weights, _)`` whose speaker head scores the
speaker-decoder state against enrolled profiles by cosine attention
(sa_asr/attention.py:19 ``CosineDistanceAttention``) — losses
ctc_weight*CTC + (1-ctc_weight)*att CE + spk_weight*NLL(log weights,
text_id) (e2e_sa_asr.py:430 _calc_att_loss, :221 loss definition).

NOTE the reference tree ships the model shell, the beam driver
(beam_search_sa_asr.py: per-step ``d.score(yseq, state, asr_enc, spk_enc,
profile)`` returning token scores AND speaker weights) and the cosine
attention — but NOT the joint decoder class those call; this
implementation completes it per that call contract and the SA-ASR paper
(arXiv:2110.03151 / 2203.16844: a token-synchronous speaker decoder whose
profile-attended embedding is fused back into the ASR decoder stream).

TPU design: both decoder streams are token-parallel at train time (one
pass, causal masks); beam decoding reuses the device tensor beam
(ops/beam_search) with full-prefix rescoring, and the per-token speaker
ids come from one weights pass over the 1-best sequence — equivalent to
the reference loop, whose hypothesis ranking uses token scores only
(beam_search_sa_asr.py:328: spk weights ride along unscored).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.losses import ctc_loss as ctc_loss_fn
from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.models.transformer.decoder import TransformerDecoderLayer
from funasr_tpu.ops import beam_search as BS
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.ops.posenc import sinusoidal_encoding
from funasr_tpu.registry import tables

Dtype = Any


def cosine_distance_attention(spk_dec_out, profile, profile_lens):
    """sa_asr/attention.py:19: softmax over masked cosine similarities;
    returns (profile-weighted embedding (B, L, D), weights (B, L, N))."""
    x = spk_dec_out.astype(jnp.float32)
    p = profile.astype(jnp.float32)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    pn = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)
    sim = jnp.einsum("bld,bnd->bln", xn, pn)
    N = profile.shape[1]
    mask = (jnp.arange(N)[None, None, :]
            < profile_lens[:, None, None])
    sim = jnp.where(mask, sim, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(sim, axis=-1)
    w = jnp.where(mask, w, 0.0)
    emb = jnp.einsum("bln,bnd->bld", w, p)
    return emb, w


class SAAsrDecoder(nn.Module):
    """Joint AR decoder: a speaker stream over the speaker encoder track
    selects a profile per token position (cosine attention); the chosen
    profile embedding is fused into the ASR stream before its blocks."""

    vocab_size: int
    d_model: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    spk_num_blocks: int = 2
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, asr_enc, spk_enc, enc_lens, ys_in, ys_lens,
                 profile, profile_lens, deterministic: bool = True):
        B, U = ys_in.shape
        d = self.d_model
        emb = nn.Embed(self.vocab_size, d, name="embed",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        x0 = emb(ys_in) * (d ** 0.5) \
            + sinusoidal_encoding(U, d, dtype=jnp.float32)[None]
        x0 = x0.astype(self.dtype)
        causal = jnp.tril(jnp.ones((U, U), jnp.float32))
        tmask = sequence_mask(ys_lens, U, jnp.float32)
        tgt_mask = (causal[None] * tmask[:, None, :])[:, None]  # (B,1,U,U)
        mem_mask = sequence_mask(enc_lens, asr_enc.shape[1],
                                 jnp.float32)[:, None, None, :]
        inputs_spk = (tgt_mask, spk_enc.astype(self.dtype), mem_mask)
        s = x0
        for i in range(self.spk_num_blocks):
            s, _ = TransformerDecoderLayer(
                d, self.attention_heads, self.linear_units,
                self.dropout_rate, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"spk_dec_{i}")(s, inputs_spk, deterministic)
        s = LayerNormF32(self.dtype, self.param_dtype,
                         name="spk_after_norm")(s)
        spk_emb, weights = cosine_distance_attention(s, profile,
                                                     profile_lens)
        fused = x0 + nn.Dense(d, name="spk_fusion", dtype=self.dtype,
                              param_dtype=self.param_dtype)(
            spk_emb.astype(self.dtype))
        inputs_asr = (tgt_mask, asr_enc.astype(self.dtype), mem_mask)
        x = fused
        for i in range(self.num_blocks):
            x, _ = TransformerDecoderLayer(
                d, self.attention_heads, self.linear_units,
                self.dropout_rate, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"asr_dec_{i}")(x, inputs_asr, deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype,
                         name="after_norm")(x)
        logits = nn.Dense(self.vocab_size, name="output_layer",
                          dtype=self.dtype,
                          param_dtype=self.param_dtype)(x)
        return logits, weights


@tables.register("model_classes", "SAASRModel")
class SAASRModel(nn.Module):
    """Reference-wired SA-ASR (e2e_sa_asr.py:40): hybrid CTC/attention +
    joint speaker decoder against enrolled profiles."""

    vocab_size: int
    input_size: int
    max_spk_num: int = 16
    encoder: str = "ConformerEncoder"
    encoder_conf: Optional[Dict] = None
    spk_encoder_conf: Optional[Dict] = None  # ResNet34DiarEncoder conf
    decoder_conf: Optional[Dict] = None
    ctc_weight: float = 0.5
    spk_weight: float = 0.5
    sos: int = 1
    eos: int = 2
    blank_id: int = 0
    ignore_id: int = -1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        enc_conf = dict(self.encoder_conf or {})
        enc_cls = tables.get("encoder_classes", self.encoder)
        self.asr_encoder = enc_cls(input_size=self.input_size,
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="asr_encoder", **enc_conf)
        from funasr_tpu.models.sond.reference_arch import \
            ResNet34DiarEncoder

        spk_conf = dict(self.spk_encoder_conf or {})
        spk_conf.setdefault("input_size", self.input_size)
        self.spk_encoder = ResNet34DiarEncoder(name="spk_encoder",
                                               **spk_conf)
        d = enc_conf.get("output_size", 256)
        self.decoder = SAAsrDecoder(
            vocab_size=self.vocab_size, d_model=d,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="decoder", **(self.decoder_conf or {}))
        self.ctc_out = nn.Dense(self.vocab_size, name="ctc_out",
                                dtype=self.dtype,
                                param_dtype=self.param_dtype)

    def encode(self, speech, speech_lengths, deterministic=True):
        """ASR encoder + speaker encoder, the latter nearest-interpolated
        onto the ASR frame grid (e2e_sa_asr.py:299)."""
        enc, enc_lens = self.asr_encoder(speech, speech_lengths,
                                         deterministic)
        spk, _ = self.spk_encoder(speech, speech_lengths)
        T_asr, T_spk = enc.shape[1], spk.shape[1]
        if T_spk != T_asr:
            # torch F.interpolate(..., mode="nearest"): src index
            # floor(i * T_spk / T_asr)
            idx = jnp.floor(jnp.arange(T_asr) * (T_spk / T_asr)
                            ).astype(jnp.int32)
            spk = spk[:, jnp.clip(idx, 0, T_spk - 1)]
        return enc, enc_lens, spk

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 profile, profile_lens, text_id,
                 deterministic: bool = True):
        """Training loss (e2e_sa_asr.py:132 forward): returns
        (loss, stats).  ``text_id``: per-token speaker index into the
        profile matrix (ignore_id on pads)."""
        enc, enc_lens, spk = self.encode(speech, speech_lengths,
                                         deterministic)
        B, U = text.shape
        # sos/eos teacher forcing
        ys_in = jnp.concatenate(
            [jnp.full((B, 1), self.sos, text.dtype),
             jnp.where(text == self.ignore_id, self.eos, text)], axis=1)
        ys_out = jnp.concatenate(
            [text, jnp.full((B, 1), self.ignore_id, text.dtype)], axis=1)
        put_eos = (jnp.arange(U + 1)[None, :] == text_lengths[:, None])
        ys_out = jnp.where(put_eos, self.eos, ys_out)
        ys_in_lens = text_lengths + 1
        logits, weights = self.decoder(enc, spk, enc_lens, ys_in,
                                       ys_in_lens, profile, profile_lens,
                                       deterministic)
        valid = (jnp.arange(U + 1)[None, :]
                 < ys_in_lens[:, None]).astype(jnp.float32)
        tgt = jnp.where(ys_out == self.ignore_id, 0, ys_out)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        denom = jnp.maximum(jnp.sum(valid), 1.0)
        loss_att = jnp.sum(nll * valid) / denom
        # speaker NLL over log weights at the text positions
        # (criterion_spk, e2e_sa_asr.py:457: NllLoss(log(weights), text_id))
        tid_valid = (jnp.arange(U)[None, :]
                     < text_lengths[:, None]).astype(jnp.float32)
        tid = jnp.where(text_id == self.ignore_id, 0, text_id)
        logw = jnp.log(jnp.maximum(weights[:, :U], 1e-10))
        nll_spk = -jnp.take_along_axis(logw, tid[..., None], -1)[..., 0]
        loss_spk = jnp.sum(nll_spk * tid_valid) / jnp.maximum(
            jnp.sum(tid_valid), 1.0)
        # CTC branch
        loss_ctc = ctc_loss_fn(self.ctc_out(enc).astype(jnp.float32),
                               enc_lens, text, text_lengths,
                               blank_id=self.blank_id)
        loss_asr = (self.ctc_weight * loss_ctc
                    + (1.0 - self.ctc_weight) * loss_att)
        loss = (self.spk_weight * loss_spk
                + (1.0 - self.spk_weight) * loss_asr)
        return loss, {"loss_att": loss_att, "loss_ctc": loss_ctc,
                      "loss_spk": loss_spk}

    def decode_beam(self, speech, speech_lengths, profile, profile_lens,
                    beam: int = 10, maxlen: int = 96,
                    decoding_ctc_weight: float = 0.0):
        """Joint beam decode -> (tokens (B, K, L), token_lengths (B, K),
        scores (B, K), speaker ids (B, L) for the 1-best).  Hypothesis
        ranking matches the reference driver (token scores; spk weights
        unscored — beam_search_sa_asr.py:328)."""
        enc, enc_lens, spk = self.encode(speech, speech_lengths, True)
        B = enc.shape[0]

        def decode_fn(ys, step):
            n = ys.shape[0]
            K = n // B
            rep = lambda a: jnp.repeat(a, K, axis=0)
            logits, _ = self.decoder(
                rep(enc), rep(spk), rep(enc_lens), ys,
                jnp.full((n,), ys.shape[1], jnp.int32),
                rep(profile), rep(profile_lens), True)
            sel = jnp.take_along_axis(
                logits, jnp.broadcast_to(
                    step[None, None, None], (n, 1, 1)), axis=1)[:, 0]
            return jax.nn.log_softmax(sel.astype(jnp.float32), -1)

        ctc_logp = None
        if decoding_ctc_weight > 0.0:
            ctc_logp = BS.mask_ctc_frames(
                jax.nn.log_softmax(
                    self.ctc_out(enc).astype(jnp.float32), -1),
                enc_lens, self.blank_id)
        res = BS.beam_search(
            decode_fn, B, beam, self.vocab_size, self.sos, self.eos,
            maxlen, ctc_logp=ctc_logp, ctc_weight=decoding_ctc_weight,
            blank_id=self.blank_id)
        # speaker ids for the 1-best: one weights pass over its sequence
        best = res.tokens[:, 0, :]  # (B, L) includes eos tail
        ys_in = jnp.concatenate(
            [jnp.full((B, 1), self.sos, best.dtype), best[:, :-1]], axis=1)
        _, weights = self.decoder(enc, spk, enc_lens, ys_in,
                                  res.lengths[:, 0] + 1, profile,
                                  profile_lens, True)
        spk_ids = jnp.argmax(weights, axis=-1)  # (B, L)
        return res.tokens, res.lengths, res.scores, spk_ids
