"""ContextualParaformer: hotword biasing v1 (reference
funasr/models/contextual_paraformer/model.py:41 — an LSTM bias encoder
over hotword token lists plus a bias cross-attention whose context is
concatenated into the decoder hidden states before the output projection).

SeACo (funasr_tpu/models/seaco_paraformer) is the v2 scheme with a
separate bias decoder; this class keeps the simpler v1 head.  Both share
the hotword representation (token embed -> 2-layer LSTM, final state).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu import losses
from funasr_tpu.models.paraformer.model import Paraformer, add_eos
from funasr_tpu.models.seaco_paraformer.model import BiasLSTM
from funasr_tpu.models.transformer.decoder import MultiHeadAttention
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


@tables.register("model_classes", "ContextualParaformer")
class ContextualParaformer(Paraformer):
    inner_dim: int = 512
    bias_heads: int = 4

    def setup(self):
        super().setup()
        self.bias_encoder = BiasLSTM(self.inner_dim, name="bias_encoder")
        self.bias_attn = MultiHeadAttention(
            self.bias_heads, self.inner_dim, 0.0, self.dtype,
            self.param_dtype, name="bias_attn")
        self.bias_output = nn.Dense(
            self.vocab_size, name="bias_output", dtype=self.dtype,
            param_dtype=self.param_dtype)

    def _hotword_memory(self, hotword_pad, hotword_lengths):
        """(H, Lh) -> (H, D): embed + LSTM final state (model.py bias
        encoder; the last row should be the all-blank "no bias" entry)."""
        hw_embed = self.decoder.embed_tokens(hotword_pad)
        out = self.bias_encoder(hw_embed.astype(jnp.float32))
        idx = jnp.maximum(hotword_lengths.astype(jnp.int32) - 1, 0)
        return jax.vmap(lambda o, i: o[i])(out, idx)

    def _bias_logits(self, dec_hidden, memory, tok_lens):
        """decoder hiddens attend into the hotword memory; the context adds
        a bias term to the vocabulary logits (model.py contextual head)."""
        B = dec_hidden.shape[0]
        H = memory.shape[0]
        mem = jnp.broadcast_to(memory[None], (B, H, memory.shape[-1]))
        ctx = self.bias_attn(dec_hidden.astype(self.dtype),
                             mem.astype(self.dtype), None, True)
        base = self.decoder.project(dec_hidden)
        return base + self.bias_output(ctx)

    # ------------------------------------------------------------ inference
    def decode_with_hotwords(self, speech, speech_lengths, hotword_pad,
                             hotword_lengths, max_tokens: int = 128):
        enc, enc_lens = self.encode(speech, speech_lengths, True)
        pred = self.predictor(enc, enc_lens, max_tokens=max_tokens,
                              deterministic=True)
        tok_lens = jnp.clip(jnp.round(pred.token_num).astype(jnp.int32),
                            0, max_tokens)
        dec_hidden = self.decoder(enc, enc_lens, pred.acoustic_embeds,
                                  tok_lens, True, return_hidden=True)
        memory = self._hotword_memory(hotword_pad, hotword_lengths)
        logits = self._bias_logits(dec_hidden, memory, tok_lens)
        tokens = jnp.argmax(logits, axis=-1)
        valid = sequence_mask(tok_lens, max_tokens, jnp.bool_)
        return jnp.where(valid, tokens, self.blank_id), tok_lens

    # ------------------------------------------------------------- training
    def contextual_loss(self, speech, speech_lengths, text, text_lengths,
                        hotword_pad, hotword_lengths,
                        deterministic: bool = False):
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        ys_pad, ys_lens = add_eos(text, text_lengths, self.eos,
                                  self.ignore_id)
        U = ys_pad.shape[1]
        pred = self.predictor(enc, enc_lens, max_tokens=U,
                              target_length=ys_lens.astype(jnp.float32),
                              deterministic=deterministic)
        dec_hidden = self.decoder(enc, enc_lens, pred.acoustic_embeds,
                                  ys_lens, deterministic, return_hidden=True)
        memory = self._hotword_memory(hotword_pad, hotword_lengths)
        logits = self._bias_logits(dec_hidden, memory, ys_lens)
        loss_att = losses.label_smoothing_loss(
            logits, ys_pad, self.ignore_id, self.lsm_weight,
            self.length_normalized_loss)
        loss_pre = losses.mae_length_loss(ys_lens, pred.token_num,
                                          self.length_normalized_loss)
        return loss_att + self.predictor_weight * loss_pre
