"""ContextualParaformer: hotword biasing v1 (reference
funasr/models/contextual_paraformer/model.py:41): hotword token lists run
through a dedicated embedding + 1-layer LSTM; the final per-word state is
the hotword memory; a bias cross-attention INSIDE the decoder's last
attention layer attends into that memory and the context re-enters the
hidden stream through a 1x1 Conv (decoder.py:299 ``bias_output``).

SeACo (funasr_tpu/models/seaco_paraformer) is the v2 scheme with a separate
bias decoder head.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu import losses
from funasr_tpu.models.contextual_paraformer.decoder import (
    ContextualParaformerSANMDecoder,
)
from funasr_tpu.models.paraformer.model import Paraformer, add_eos
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


class BiasLSTM1(nn.Module):
    """1-layer unidirectional LSTM (reference model.py:64: torch.nn.LSTM
    with num_layers=1); returns the output at every position."""

    features: int

    @nn.compact
    def __call__(self, x):
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.features), name="lstm0")
        return rnn(x)


@tables.register("model_classes", "ContextualParaformer")
class ContextualParaformer(Paraformer):
    # the registered contextual decoder replaces the plain SANM one
    decoder_name: Optional[str] = "ContextualParaformerDecoder"
    inner_dim: int = 512
    use_decoder_embedding: bool = False
    clas_scale: float = 1.0

    def setup(self):
        super().setup()
        self.bias_encoder = BiasLSTM1(self.inner_dim, name="bias_encoder")
        if not self.use_decoder_embedding:
            self.bias_embed = nn.Embed(
                self.vocab_size, self.inner_dim, name="bias_embed",
                param_dtype=self.param_dtype, dtype=self.dtype)

    def _hotword_memory(self, hotword_pad, hotword_lengths):
        """(H, Lh) -> (H, D): embed + 1-layer LSTM output at position
        len-1 (reference model.py:179-187)."""
        if self.use_decoder_embedding:
            hw_embed = self.decoder.embed_tokens(hotword_pad)
        else:
            hw_embed = self.bias_embed(hotword_pad)
        out = self.bias_encoder(hw_embed.astype(jnp.float32))
        idx = jnp.maximum(hotword_lengths.astype(jnp.int32) - 1, 0)
        return jax.vmap(lambda o, i: o[i])(out, idx)  # (H, D)

    # ------------------------------------------------------------ inference
    def decode_with_hotwords(self, speech, speech_lengths, hotword_pad,
                             hotword_lengths, max_tokens: int = 128):
        enc, enc_lens = self.encode(speech, speech_lengths, True)
        pred = self.predictor(enc, enc_lens, max_tokens=max_tokens,
                              deterministic=True)
        tok_lens = jnp.clip(jnp.round(pred.token_num).astype(jnp.int32),
                            0, max_tokens)
        memory = self._hotword_memory(hotword_pad, hotword_lengths)
        ctx = jnp.broadcast_to(memory[None],
                               (enc.shape[0],) + memory.shape)
        logits = self.decoder(enc, enc_lens, pred.acoustic_embeds, tok_lens,
                              True, contextual_info=ctx,
                              clas_scale=self.clas_scale)
        tokens = jnp.argmax(logits, axis=-1)
        valid = sequence_mask(tok_lens, max_tokens, jnp.bool_)
        return jnp.where(valid, tokens, self.blank_id), tok_lens

    # ------------------------------------------------------------- training
    def contextual_loss(self, speech, speech_lengths, text, text_lengths,
                        hotword_pad, hotword_lengths,
                        deterministic: bool = False):
        """Training loss with the bias branch active (reference
        model.py:150 ``forward``: att CE + predictor MAE, decoder fed the
        hotword memory)."""
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        ys_pad, ys_lens = add_eos(text, text_lengths, self.eos,
                                  self.ignore_id)
        U = ys_pad.shape[1]
        pred = self.predictor(enc, enc_lens, max_tokens=U,
                              target_length=ys_lens.astype(jnp.float32),
                              deterministic=deterministic)
        memory = self._hotword_memory(hotword_pad, hotword_lengths)
        ctx = jnp.broadcast_to(memory[None],
                               (enc.shape[0],) + memory.shape)
        logits = self.decoder(enc, enc_lens, pred.acoustic_embeds, ys_lens,
                              deterministic, contextual_info=ctx,
                              clas_scale=self.clas_scale)
        loss_att = losses.label_smoothing_loss(
            logits, ys_pad, self.ignore_id, self.lsm_weight,
            self.length_normalized_loss)
        loss_pre = losses.mae_length_loss(ys_lens, pred.token_num,
                                          self.length_normalized_loss)
        return loss_att + self.predictor_weight * loss_pre
