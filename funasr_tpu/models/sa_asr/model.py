"""Speaker-attributed ASR (reference funasr/models/sa_asr/ — joint
transcription + per-token speaker attribution against enrolled speaker
profiles).

Design: the Paraformer NAR body produces per-token decoder hiddens; a
speaker branch cross-attends each token hidden into the frame-level
speaker-embedding track (a projection of the encoder states) and scores
the attended vector against the enrolled profile matrix by scaled dot
product.  Outputs: text tokens + a speaker id per token.

Train: ASR loss (inherited) + CE over profiles per token.  All device-
resident; profile count is a static pad (max_profiles) with a validity
mask.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.paraformer.model import Paraformer, add_eos
from funasr_tpu.models.transformer.decoder import MultiHeadAttention
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


@tables.register("model_classes", "SAASR")
class SAASR(Paraformer):
    spk_dim: int = 192
    spk_heads: int = 4
    spk_weight: float = 0.5

    def setup(self):
        super().setup()
        d = self.encoder.output_size
        self.spk_track = nn.Dense(self.spk_dim, name="spk_track",
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.spk_attn = MultiHeadAttention(
            self.spk_heads, self.spk_dim, 0.0, self.dtype,
            self.param_dtype, name="spk_attn")
        self.spk_query = nn.Dense(self.spk_dim, name="spk_query",
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.profile_proj = nn.Dense(self.spk_dim, name="profile_proj",
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype)

    def _spk_logits(self, enc, enc_lens, dec_hidden, profiles,
                    profile_lens):
        """(B, U, D_dec) x (B, S, D_spk) -> (B, U, S) speaker logits."""
        track = self.spk_track(enc)  # (B, T, spk_dim)
        q = self.spk_query(dec_hidden)
        T = enc.shape[1]
        mask = sequence_mask(enc_lens, T, jnp.float32)[:, None, None, :]
        att = self.spk_attn(q, track, mask, True)  # (B, U, spk_dim)
        prof = self.profile_proj(profiles.astype(self.dtype))  # (B, S, d)
        logits = jnp.einsum("bud,bsd->bus", att, prof)
        logits = logits / jnp.sqrt(float(self.spk_dim))
        S = profiles.shape[1]
        pmask = sequence_mask(profile_lens, S, jnp.bool_)[:, None, :]
        return jnp.where(pmask, logits, -1e30)

    def forward_sa(self, speech, speech_lengths, text, text_lengths,
                   profiles, profile_lens, spk_labels,
                   deterministic: bool = False):
        """Joint loss: ASR (Paraformer) + per-token speaker CE.

        spk_labels: (B, U+1) profile index per target token (ignore_id
        padded; the eos position may be ignore_id)."""
        # ONE encoder pass shared by the ASR loss and the speaker branch
        # (the 50-layer encoder is the bulk of the step)
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        loss_asr, stats = self(speech, speech_lengths, text, text_lengths,
                               deterministic, encoded=(enc, enc_lens))
        ys_pad, ys_lens = add_eos(text, text_lengths, self.eos,
                                  self.ignore_id)
        U = ys_pad.shape[1]
        pred = self.predictor(enc, enc_lens, max_tokens=U,
                              target_length=ys_lens.astype(jnp.float32),
                              deterministic=deterministic)
        dec_hidden = self.decoder(enc, enc_lens, pred.acoustic_embeds,
                                  ys_lens, deterministic, return_hidden=True)
        logits = self._spk_logits(enc, enc_lens, dec_hidden, profiles,
                                  profile_lens)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = jnp.where(spk_labels == self.ignore_id, 0, spk_labels)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        valid = spk_labels != self.ignore_id
        loss_spk = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1)
        stats = dict(stats)
        stats["loss_spk"] = loss_spk
        loss = loss_asr + self.spk_weight * loss_spk
        stats["loss"] = loss
        return loss, stats

    def decode_sa(self, speech, speech_lengths, profiles, profile_lens,
                  max_tokens: int = 128):
        """-> (tokens, token_lengths, spk_ids): transcript + speaker per
        token."""
        enc, enc_lens = self.encode(speech, speech_lengths, True)
        pred = self.predictor(enc, enc_lens, max_tokens=max_tokens,
                              deterministic=True)
        tok_lens = jnp.clip(jnp.round(pred.token_num).astype(jnp.int32),
                            0, max_tokens)
        dec_hidden = self.decoder(enc, enc_lens, pred.acoustic_embeds,
                                  tok_lens, True, return_hidden=True)
        text_logits = self.decoder.project(dec_hidden)
        tokens = jnp.argmax(text_logits, axis=-1)
        spk_logits = self._spk_logits(enc, enc_lens, dec_hidden, profiles,
                                      profile_lens)
        spk_ids = jnp.argmax(spk_logits, axis=-1)
        valid = sequence_mask(tok_lens, max_tokens, jnp.bool_)
        return (jnp.where(valid, tokens, self.blank_id), tok_lens,
                jnp.where(valid, spk_ids, -1))
