"""LCB-Net reference architecture: long-context biasing for audio-visual
(slide-OCR) speech recognition (reference funasr/models/lcbnet/,
arXiv:2401.06390).

Wiring (model.py:388 inference): conformer audio encoder; OCR text through
``TransformerTextEncoder`` (encoder.py:131 — embed + standard abs-pos
transformer); ``SelfSrcAttention`` fusion (encoder.py:229 — one
self+src-attention block where the AUDIO stream queries the TEXT memory);
the fusion output is ADDED to the encoder output before beam decoding.
``ConvPredictor`` (encoder.py:358) scores which OCR tokens occur in the
audio (cross-attention + FFN + depthwise conv + linear) — present in
checkpoints and mapped by the converter; the shipped reference uses it in
the bias-training objective only.  Training forward (model.py:167) is the
plain hybrid CTC/attention loss.

Published checkpoints bind via convert.lcbnet_from_torch; component
parity vs the actual reference torch modules is pinned in
tests/test_lcbnet_ref.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.losses import ctc_loss as ctc_loss_fn
from funasr_tpu.models.mfcca.reference_arch import PlainMHA
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


def abs_pos_table(T: int, d: int) -> jnp.ndarray:
    """transformer/embedding.py:37 PositionalEncoding (positions 0..T-1,
    interleaved sin/cos; the max_len-5000 table sliced [:T] IS 0..T-1 —
    no reversed-slice quirk here, unlike the legacy rel table)."""
    pos = np.arange(T, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2) * -(np.log(10000.0) / d))
    pe = np.zeros((T, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)


def _pwff(x, hidden, out, name):
    h = nn.Dense(hidden, name=f"{name}_w1")(x)
    h = nn.relu(h)
    return nn.Dense(out, name=f"{name}_w2")(h)


@tables.register("encoder_classes", "TransformerTextEncoder")
class LCBTextEncoder(nn.Module):
    """encoder.py:131 TransformerTextEncoder (pre-norm, abs pos)."""

    input_size: int  # vocab
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6

    @nn.compact
    def __call__(self, ocr, ocr_lens):
        B, L = ocr.shape
        d = self.output_size
        x = nn.Embed(self.input_size, d, name="embed")(ocr)
        x = x * (d ** 0.5) + abs_pos_table(L, d)[None]
        mask = sequence_mask(ocr_lens, L, jnp.float32)[:, None, :]
        for i in range(self.num_blocks):
            res = x
            h = nn.LayerNorm(epsilon=1e-12, name=f"l{i}_norm1")(x)
            h = PlainMHA(self.attention_heads, d,
                         name=f"l{i}_self_attn")(h, h, h, mask)
            x = res + h
            res = x
            h = nn.LayerNorm(epsilon=1e-12, name=f"l{i}_norm2")(x)
            x = res + _pwff(h, self.linear_units, d, f"l{i}_ff")
        x = nn.LayerNorm(epsilon=1e-12, name="after_norm")(x)
        return x, ocr_lens


@tables.register("encoder_classes", "FusionSANEncoder")
class SelfSrcAttentionFusion(nn.Module):
    """encoder.py:229 SelfSrcAttention: the audio stream self-attends,
    then cross-attends the text memory, then FFN (pre-norm)."""

    size: int
    attention_heads: int = 4
    linear_units: int = 2048

    @nn.compact
    def __call__(self, audio, audio_mask, text, text_mask):
        x = audio
        res = x
        h = nn.LayerNorm(epsilon=1e-12, name="norm1")(x)
        h = PlainMHA(self.attention_heads, self.size,
                     name="self_attn")(h, h, h, audio_mask)
        x = res + h
        res = x
        h = nn.LayerNorm(epsilon=1e-12, name="norm2")(x)
        h = PlainMHA(self.attention_heads, self.size,
                     name="src_attn")(h, text, text, text_mask)
        x = res + h
        res = x
        h = nn.LayerNorm(epsilon=1e-12, name="norm3")(x)
        x = res + _pwff(h, self.linear_units, self.size, "ff")
        return x


@tables.register("encoder_classes", "ConvBiasPredictor")
class ConvBiasPredictor(nn.Module):
    """encoder.py:358 ConvPredictor: per-OCR-token occurrence score."""

    size: int = 256
    l_order: int = 3
    r_order: int = 3
    attention_heads: int = 4
    linear_units: int = 2048

    @nn.compact
    def __call__(self, text_enc, asr_enc):
        res = text_enc
        h = PlainMHA(self.attention_heads, self.size,
                     name="atten")(text_enc, asr_enc, asr_enc, None)
        x = res + h
        res = x
        h = nn.LayerNorm(epsilon=1e-12, name="norm1")(x)
        x = res + _pwff(h, self.linear_units, self.size, "ff")
        x = nn.LayerNorm(epsilon=1e-12, name="norm2")(x)
        kernel = self.param("conv1d", nn.initializers.lecun_normal(),
                            (self.l_order + self.r_order + 1, 1,
                             self.size))
        bias = self.param("conv1d_bias", nn.initializers.zeros,
                          (self.size,))
        from funasr_tpu.ops.dwconv import depthwise_conv1d

        mem = depthwise_conv1d(x, kernel, self.l_order,
                               self.r_order) + bias
        out = nn.relu(mem + x)
        return nn.Dense(1, name="output_linear")(out)[..., 0]


@tables.register("model_classes", "LCBNet")
class LCBNetModel(nn.Module):
    """Reference-wired LCB-Net (model.py:28): conformer audio encoder +
    text encoder + self-src fusion (+ conv bias predictor) + hybrid
    CTC/attention decoder.  NOTE sos == eos == vocab_size - 1
    (model.py:113)."""

    vocab_size: int
    input_size: int
    encoder: str = "ConformerEncoder"
    encoder_conf: Optional[Dict] = None
    text_encoder_conf: Optional[Dict] = None
    fusion_encoder_conf: Optional[Dict] = None
    bias_predictor_conf: Optional[Dict] = None
    decoder_conf: Optional[Dict] = None
    ctc_weight: float = 0.5
    blank_id: int = 0
    ignore_id: int = -1

    def setup(self):
        enc_conf = dict(self.encoder_conf or {})
        enc_cls = tables.get("encoder_classes", self.encoder)
        self.audio_encoder = enc_cls(input_size=self.input_size,
                                     name="encoder", **enc_conf)
        d = enc_conf.get("output_size", 256)
        tconf = dict(self.text_encoder_conf or {})
        tconf.setdefault("output_size", d)
        self.text_encoder = LCBTextEncoder(input_size=self.vocab_size,
                                           name="text_encoder", **tconf)
        fconf = dict(self.fusion_encoder_conf or {})
        fconf.setdefault("size", d)
        self.fusion_encoder = SelfSrcAttentionFusion(
            name="fusion_encoder", **fconf)
        bconf = dict(self.bias_predictor_conf or {})
        bconf.setdefault("size", d)
        self.bias_predictor = ConvBiasPredictor(name="bias_predictor",
                                                **bconf)
        from funasr_tpu.models.transformer.decoder import \
            TransformerDecoder

        self.decoder = TransformerDecoder(
            vocab_size=self.vocab_size, encoder_output_size=d,
            name="decoder", **(self.decoder_conf or {}))
        self.ctc_lo = nn.Dense(self.vocab_size, name="ctc_lo")

    @property
    def sos(self):
        return self.vocab_size - 1

    def encode_with_bias(self, speech, speech_lengths, ocr, ocr_lens,
                         deterministic: bool = True):
        """model.py:443-455: fused (biased) encoder memory + the bias
        predictor's per-OCR-token scores."""
        enc, enc_lens = self.audio_encoder(speech, speech_lengths,
                                           deterministic)
        text, _ = self.text_encoder(ocr, ocr_lens)
        fusion = self.fusion_encoder(enc, None, text, None)
        fused = enc + fusion
        bias = self.bias_predictor(text, enc)
        return fused, enc_lens, bias

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = True):
        """Training forward (model.py:167): plain hybrid CTC/att loss —
        the shipped reference trains the bias branch separately."""
        enc, enc_lens = self.audio_encoder(speech, speech_lengths,
                                           deterministic)
        B, U = text.shape
        sos = eos = self.vocab_size - 1
        ys_in = jnp.concatenate(
            [jnp.full((B, 1), sos, text.dtype),
             jnp.where(text == self.ignore_id, eos, text)], axis=1)
        ys_out = jnp.concatenate(
            [text, jnp.full((B, 1), self.ignore_id, text.dtype)], axis=1)
        put_eos = (jnp.arange(U + 1)[None, :] == text_lengths[:, None])
        ys_out = jnp.where(put_eos, eos, ys_out)
        logits = self.decoder(enc, enc_lens, ys_in, text_lengths + 1,
                              deterministic)
        valid = (jnp.arange(U + 1)[None, :]
                 < (text_lengths + 1)[:, None]).astype(jnp.float32)
        tgt = jnp.where(ys_out == self.ignore_id, 0, ys_out)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        loss_att = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        loss_ctc = ctc_loss_fn(self.ctc_lo(enc).astype(jnp.float32),
                               enc_lens, text, text_lengths,
                               blank_id=self.blank_id)
        loss = (self.ctc_weight * loss_ctc
                + (1.0 - self.ctc_weight) * loss_att)
        return loss, {"loss_att": loss_att, "loss_ctc": loss_ctc}

    def decode_beam(self, speech, speech_lengths, ocr, ocr_lens,
                    beam: int = 10, maxlen: int = 64,
                    decoding_ctc_weight: float = 0.0):
        """OCR-biased beam decode over the fused memory (the reference's
        inference path through our device tensor beam)."""
        fused, enc_lens, _ = self.encode_with_bias(speech, speech_lengths,
                                                   ocr, ocr_lens, True)
        B = fused.shape[0]
        sos = eos = self.vocab_size - 1

        def decode_fn(ys, step):
            n = ys.shape[0]
            K = n // B
            logits = self.decoder(
                jnp.repeat(fused, K, axis=0),
                jnp.repeat(enc_lens, K, axis=0), ys,
                jnp.full((n,), ys.shape[1], jnp.int32), True)
            sel = jnp.take_along_axis(
                logits, jnp.broadcast_to(step[None, None, None],
                                         (n, 1, 1)), axis=1)[:, 0]
            return jax.nn.log_softmax(sel.astype(jnp.float32), -1)

        from funasr_tpu.ops import beam_search as BS

        ctc_logp = None
        if decoding_ctc_weight > 0.0:
            ctc_logp = BS.mask_ctc_frames(
                jax.nn.log_softmax(
                    self.ctc_lo(fused).astype(jnp.float32), -1),
                enc_lens, self.blank_id)
        res = BS.beam_search(decode_fn, B, beam, self.vocab_size, sos,
                             eos, maxlen, ctc_logp=ctc_logp,
                             ctc_weight=decoding_ctc_weight,
                             blank_id=self.blank_id)
        return res.tokens, res.lengths, res.scores
