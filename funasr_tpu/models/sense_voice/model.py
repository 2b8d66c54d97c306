"""SenseVoiceSmall: multitask non-autoregressive ASR+LID+SER+AED
(reference funasr/models/sense_voice/model.py:588 ``SenseVoiceSmall``,
encoder :443 ``SenseVoiceEncoderSmall``).

Four prompt embeddings ([language, event, emotion, textnorm] special-token
embeddings at the *input feature* width) are prepended to the LFR fbank
frames; a SANM encoder (main stack + ``tp_blocks`` tail stack with its own
norm) feeds a CTC head.  Decoding is device-resident greedy CTC; the first
four output positions carry the rich tags (LID/SER/AED/textnorm), decoded to
text + emoji by ``rich_transcription_postprocess``.

Training loss: CTC over frames 4: vs text tokens 4:, plus rich CE on the
first 4 frames vs the 4 tag tokens (model.py:700-707).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu import losses
from funasr_tpu.models.sanm import EncoderLayerSANM, LayerNormF32
from funasr_tpu.ops.quant import QDense
from funasr_tpu.ops.ctc_decode import ctc_greedy_decode
from funasr_tpu.ops.masks import key_mask, sequence_mask
from funasr_tpu.ops.posenc import sinusoidal_encoding
from funasr_tpu.registry import tables

Dtype = Any

LID_DICT = {"auto": 0, "zh": 3, "en": 4, "yue": 7, "ja": 11, "ko": 12,
            "nospeech": 13}
TEXTNORM_DICT = {"withitn": 14, "woitn": 15}
# main-vocab tag token id -> query embed id (reference model.py:643,645:
# lid_int_dict / textnorm_int_dict for the released 25k SentencePiece vocab)
LID_INT_DICT = {24884: 3, 24885: 4, 24888: 7, 24892: 11, 24896: 12,
                24992: 13}
TEXTNORM_INT_DICT = {25016: 14, 25017: 15}
EMO_UNK_TAG = "<|EMO_UNKNOWN|>"
QUERY_VOCAB = 16  # 7 + len(lid) + len(textnorm)


@tables.register("encoder_classes", "SenseVoiceEncoderSmall")
class SenseVoiceEncoderSmall(nn.Module):
    """SANM stack + tp (timestamp-predictor) tail stack with its own norm."""

    input_size: int
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50
    tp_blocks: int = 20
    kernel_size: int = 11
    sanm_shift: int = 0
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, lengths, deterministic: bool = True):
        B, T, _ = xs.shape
        mask = key_mask(lengths, T, dtype=jnp.float32)
        x = xs.astype(self.dtype) * (self.output_size ** 0.5)
        pe = sinusoidal_encoding(T, self.input_size, dtype=jnp.float32)
        x = x + pe[None].astype(self.dtype)

        x, _ = EncoderLayerSANM(
            self.input_size, self.output_size, self.attention_heads,
            self.linear_units, self.kernel_size, self.sanm_shift,
            self.dropout_rate, self.attention_dropout_rate,
            self.dtype, self.param_dtype, name="encoders0",
        )(x, mask, deterministic)

        def stack(n, name):
            return nn.scan(
                EncoderLayerSANM,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=n,
                in_axes=(nn.broadcast, nn.broadcast),
            )(
                self.output_size, self.output_size, self.attention_heads,
                self.linear_units, self.kernel_size, self.sanm_shift,
                self.dropout_rate, self.attention_dropout_rate,
                self.dtype, self.param_dtype, name=name,
            )

        if self.num_blocks > 1:
            x, _ = stack(self.num_blocks - 1, "encoders")(x, mask, deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="after_norm")(x)
        if self.tp_blocks > 0:
            x, _ = stack(self.tp_blocks, "tp_encoders")(x, mask, deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="tp_norm")(x)
        return x, lengths


@tables.register("model_classes", "SenseVoiceSmall")
class SenseVoiceSmall(nn.Module):
    vocab_size: int
    input_size: int = 560
    encoder_conf: Dict[str, Any] = None
    lsm_weight: float = 0.1
    length_normalized_loss: bool = True
    ignore_id: int = -1
    blank_id: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        conf = dict(self.encoder_conf or {})
        conf.pop("input_layer", None)
        conf.pop("pos_enc_class", None)
        conf.pop("selfattention_layer_type", None)
        conf.pop("positional_dropout_rate", None)
        sanm_shift = conf.pop("sanm_shfit", 0)
        self.encoder = SenseVoiceEncoderSmall(
            input_size=self.input_size, sanm_shift=sanm_shift,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="encoder", **conf,
        )
        # prompt-token embedding at input feature width (model.py:646)
        self.embed = nn.Embed(QUERY_VOCAB, self.input_size, name="embed",
                              dtype=self.dtype, param_dtype=self.param_dtype)
        self.ctc_lo = QDense(self.vocab_size, name="ctc_lo",
                               dtype=self.dtype, param_dtype=self.param_dtype)

    def _compose(self, speech, speech_lengths, lid_ids, textnorm_ids):
        """Prepend [language, event(1), emo(2), textnorm] queries
        (model.py:758-772); output lengths = input + 4."""
        B = speech.shape[0]
        lang_q = self.embed(lid_ids[:, None])  # (B, 1, D)
        tn_q = self.embed(textnorm_ids[:, None])
        ev_emo = self.embed(jnp.broadcast_to(jnp.array([[1, 2]]), (B, 2)))
        speech = jnp.concatenate(
            [lang_q, ev_emo, tn_q, speech.astype(lang_q.dtype)], axis=1
        )
        return speech, speech_lengths + 4

    def encode(self, speech, speech_lengths, lid_ids, textnorm_ids,
               deterministic: bool = True):
        x, lens = self._compose(speech, speech_lengths, lid_ids, textnorm_ids)
        return self.encoder(x, lens, deterministic)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = False):
        """Training forward.  ``text[:, :4]`` = [lid, event, emo, textnorm]
        tag token ids (in the main vocab); text[:, 4:] = transcription.

        The language/textnorm QUERIES are derived from the ground-truth tag
        tokens (reference model.py:744-772: ``lid_int_dict[text[:,0]]`` with
        0.2 dropout to 'auto', ``textnorm_int_dict[text[:,3]]``) so the
        prompts the model learns to follow agree with the rich-CE targets.
        """
        B = speech.shape[0]
        lid_tok, tn_tok = text[:, 0], text[:, 3]
        lid_ids = jnp.zeros((B,), jnp.int32)  # default 'auto'
        for tok, qid in LID_INT_DICT.items():
            lid_ids = jnp.where(lid_tok == tok, qid, lid_ids)
        if not deterministic:
            drop = jax.random.uniform(self.make_rng("dropout"), (B,)) <= 0.2
            lid_ids = jnp.where(drop, 0, lid_ids)
        tn_ids = jnp.full((B,), TEXTNORM_DICT["woitn"], jnp.int32)
        for tok, qid in TEXTNORM_INT_DICT.items():
            tn_ids = jnp.where(tn_tok == tok, qid, tn_ids)
        enc, enc_lens = self.encode(speech, speech_lengths, lid_ids, tn_ids,
                                    deterministic)
        logits = self.ctc_lo(enc)
        loss_ctc = losses.ctc_loss(
            logits[:, 4:], enc_lens - 4, text[:, 4:], text_lengths - 4,
            self.ignore_id, self.blank_id,
        )
        loss_rich = losses.label_smoothing_loss(
            logits[:, :4], text[:, :4], self.ignore_id, self.lsm_weight,
            self.length_normalized_loss,
        )
        acc_rich = losses.th_accuracy(logits[:, :4], text[:, :4], self.ignore_id)
        loss = loss_ctc + loss_rich
        return loss, {"loss": loss, "loss_ctc": loss_ctc,
                      "loss_rich": loss_rich, "acc_rich": acc_rich}

    def greedy_decode(self, speech, speech_lengths, lid_ids, textnorm_ids):
        """Device-resident CTC greedy decode -> (tokens, token_lengths)."""
        enc, enc_lens = self.encode(speech, speech_lengths, lid_ids,
                                    textnorm_ids, True)
        log_probs = jax.nn.log_softmax(
            self.ctc_lo(enc).astype(jnp.float32), axis=-1
        )
        return ctc_greedy_decode(log_probs, enc_lens, self.blank_id)

    def greedy_decode_with_alignment(self, speech, speech_lengths,
                                     lid_ids, textnorm_ids):
        """Greedy decode + CTC forced alignment of the decoded speech
        tokens (reference sense_voice/model.py:918-931 output_timestamp
        path) -> (tokens, token_lengths, align (B, T-4)).

        Reference quirks reproduced: the alignment runs on SOFTMAX
        probabilities (not logs) over the SPEECH rows (after the 4
        prompt frames), with the blank probability zeroed on frames
        whose argmax is blank (model.py:923) — this spreads token spans
        into greedy-blank regions, widening the stamps the same way."""
        from funasr_tpu.ops.ctc_align import ctc_forced_align

        enc, enc_lens = self.encode(speech, speech_lengths, lid_ids,
                                    textnorm_ids, True)
        log_probs = jax.nn.log_softmax(
            self.ctc_lo(enc).astype(jnp.float32), axis=-1)
        tokens, tok_lens = ctc_greedy_decode(log_probs, enc_lens,
                                             self.blank_id)
        probs = jnp.exp(log_probs[:, 4:])
        pred = jnp.argmax(probs, axis=-1)
        probs = probs.at[..., self.blank_id].set(
            jnp.where(pred == self.blank_id, 0.0,
                      probs[..., self.blank_id]))
        align = ctc_forced_align(
            probs, tokens[:, 4:],
            jnp.maximum(enc_lens - 4, 0),
            jnp.maximum(tok_lens - 4, 0), self.blank_id)
        return tokens, tok_lens, align


def lid_id(language: str) -> int:
    return LID_DICT.get(language, 0)


def textnorm_id(use_itn: bool) -> int:
    return TEXTNORM_DICT["withitn" if use_itn else "woitn"]
