"""LCB-Net: long-context biasing network for audio-visual ASR (reference
funasr/models/lcbnet/ — the visual stream is OCR text from slides; a text
encoder over the biasing tokens cross-attends into the audio encoder
states before decoding, so long-context visual text steers recognition).

Structure: Conformer audio encoder + transformer bias-text encoder +
fusion (audio queries attend into the bias-text memory, residual add) +
the hybrid CTC/attention head.  When no bias text is supplied the fusion
is skipped and the model is a plain conformer hybrid.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu import losses
from funasr_tpu.models.conformer import ConformerEncoder
from funasr_tpu.models.emotion2vec.model import TransformerLayer
from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.models.transformer.decoder import (
    MultiHeadAttention,
    TransformerDecoder,
)
from funasr_tpu.models.transformer.model import add_sos_eos
from funasr_tpu.ops.masks import key_mask, sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


@tables.register("model_classes", "LCBNetLite")
class LCBNet(nn.Module):
    vocab_size: int
    input_size: int = 80
    encoder_conf: Dict[str, Any] = None
    text_encoder_conf: Dict[str, Any] = None
    decoder_conf: Dict[str, Any] = None
    fusion_heads: int = 4
    ctc_weight: float = 0.3
    lsm_weight: float = 0.1
    ignore_id: int = -1
    blank_id: int = 0
    sos: int = 1
    eos: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        conf = dict(self.encoder_conf or {})
        conf.setdefault("input_layer", "conv2d")
        self.encoder = ConformerEncoder(
            input_size=self.input_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder", **conf)
        d = self.encoder.output_size
        tconf = dict(self.text_encoder_conf or {})
        self.text_embed = nn.Embed(self.vocab_size, d, name="text_embed",
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        self.text_layers = [
            TransformerLayer(d, tconf.get("attention_heads", 4),
                             tconf.get("linear_units", 4 * d), 0.0,
                             self.dtype, self.param_dtype,
                             name=f"text_layer{i}")
            for i in range(tconf.get("num_blocks", 2))
        ]
        self.fusion_attn = MultiHeadAttention(
            self.fusion_heads, d, 0.0, self.dtype, self.param_dtype,
            name="fusion_attn")
        self.fusion_norm = LayerNormF32(self.dtype, self.param_dtype,
                                        name="fusion_norm")
        self.decoder = TransformerDecoder(
            vocab_size=self.vocab_size, encoder_output_size=d,
            dtype=self.dtype, param_dtype=self.param_dtype, name="decoder",
            **(self.decoder_conf or {}))
        self.ctc_lo = nn.Dense(self.vocab_size, name="ctc_lo",
                               dtype=self.dtype,
                               param_dtype=self.param_dtype)

    def _encode_bias_text(self, bias_text, bias_lengths, deterministic):
        x = self.text_embed(bias_text)
        mask = key_mask(bias_lengths, bias_text.shape[1], jnp.float32)
        for layer in self.text_layers:
            x, _ = layer(x, mask, deterministic)
        return x

    def encode(self, speech, speech_lengths, bias_text=None,
               bias_lengths=None, deterministic: bool = True):
        enc, enc_lens = self.encoder(speech, speech_lengths, deterministic)
        if bias_text is not None:
            mem = self._encode_bias_text(bias_text, bias_lengths,
                                         deterministic)
            mask = sequence_mask(bias_lengths, bias_text.shape[1],
                                 jnp.float32)[:, None, None, :]
            fused = self.fusion_attn(self.fusion_norm(enc), mem, mask,
                                     deterministic)
            enc = enc + fused
        return enc, enc_lens

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 bias_text=None, bias_lengths=None,
                 deterministic: bool = False):
        enc, enc_lens = self.encode(speech, speech_lengths, bias_text,
                                    bias_lengths, deterministic)
        ys_in, ys_out, ys_lens = add_sos_eos(
            text, text_lengths, self.sos, self.eos, self.ignore_id)
        logits = self.decoder(enc, enc_lens, ys_in, ys_lens, deterministic)
        loss_att = losses.label_smoothing_loss(
            logits, ys_out, self.ignore_id, self.lsm_weight, False)
        stats = {"loss_att": loss_att,
                 "acc": losses.th_accuracy(logits, ys_out, self.ignore_id)}
        loss = loss_att
        if self.ctc_weight > 0.0:
            loss_ctc = losses.ctc_loss(self.ctc_lo(enc), enc_lens, text,
                                       text_lengths, self.ignore_id,
                                       self.blank_id)
            loss = self.ctc_weight * loss_ctc \
                + (1 - self.ctc_weight) * loss_att
            stats["loss_ctc"] = loss_ctc
        stats["loss"] = loss
        return loss, stats

    def ctc_greedy(self, speech, speech_lengths, bias_text=None,
                   bias_lengths=None):
        """CTC greedy decode with optional bias text."""
        from funasr_tpu.ops.ctc_decode import ctc_greedy_decode

        enc, enc_lens = self.encode(speech, speech_lengths, bias_text,
                                    bias_lengths, True)
        logits = self.ctc_lo(enc)
        return ctc_greedy_decode(logits, enc_lens, self.blank_id)
