"""SeACo-Paraformer: semantic-augmented contextual hotword customization
(reference funasr/models/seaco_paraformer/model.py:44 ``SeacoParaformer``).

Hotwords are short token lists.  A 2-layer LSTM over the decoder's token
embeddings yields one vector per hotword (+ a trailing "no-bias" entry); a
small SANM decoder stack cross-attends FROM both the CIF embeddings and the
main decoder hiddens INTO that hotword memory; the merged states feed a
``hotword_output_layer`` whose argmax either picks a biased token or the
``NO_BIAS`` class.  Final log-probs switch between the main decoder and the
bias head wherever the bias head is confident (model.py:312 ``_merge_res``
with seaco_weight 1.0).

TPU notes: hotword lists are padded (H, Lh) grids; the LSTM is a tiny
lax.scan (hotword encoding happens once per utterance batch); the attention
stages are the existing SANM decoder modules with the hotword memory as
``encoder_out``.  The ASF top-nfilter pre-selection (model.py:276) is not
implemented yet — all supplied hotwords participate.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu import losses
from funasr_tpu.models.bicif_paraformer.model import BiCifParaformer
from funasr_tpu.models.paraformer.decoder import ParaformerSANMDecoder
from funasr_tpu.models.paraformer.model import add_eos
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


class BiasLSTM(nn.Module):
    """2-layer unidirectional LSTM; returns output at each position."""

    features: int

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            rnn = nn.RNN(nn.OptimizedLSTMCell(self.features), name=f"lstm{i}")
            x = rnn(x)
        return x


@tables.register("model_classes", "SeacoParaformer")
class SeacoParaformer(BiCifParaformer):
    inner_dim: int = 512
    seaco_decoder_conf: Optional[Dict[str, Any]] = None
    seaco_weight: float = 1.0
    seaco_lsm_weight: float = 0.0
    no_bias_id: int = 8377
    nfilter: int = 50

    def setup(self):
        super().setup()
        self.bias_encoder = BiasLSTM(self.inner_dim, name="bias_encoder")
        conf = dict(self.seaco_decoder_conf or {})
        conf.setdefault("attention_heads", 4)
        conf.setdefault("linear_units", 1024)
        conf.setdefault("num_blocks", 3)
        conf.setdefault("att_layer_num", 3)
        conf.setdefault("kernel_size", 11)
        self.seaco_decoder = ParaformerSANMDecoder(
            vocab_size=self.vocab_size,
            encoder_output_size=self.inner_dim,
            use_output_layer=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="seaco_decoder", **conf,
        )
        self.hotword_output_layer = nn.Dense(
            self.vocab_size, name="hotword_output_layer",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    # ------------------------------------------------------------- hotwords
    def _hotword_representation(self, hotword_pad, hotword_lengths):
        """(H, Lh) id grid -> (H, D) via token embed + LSTM final state
        (model.py:330).  The caller appends the no-bias row."""
        hw_embed = self.decoder.embed_tokens(hotword_pad)
        out = self.bias_encoder(hw_embed.astype(jnp.float32))
        idx = jnp.maximum(hotword_lengths.astype(jnp.int32) - 1, 0)
        return jax.vmap(lambda o, i: o[i])(out, idx)  # (H, D)

    def _dha_logits(self, contextual, enc_B, semantic, dec_hidden, tok_lens):
        """Dual hotword attention: seaco decoder over CIF embeds and decoder
        hiddens, merged additively (model.py:300-310)."""
        H = contextual.shape[0]
        ctx = jnp.broadcast_to(contextual[None], (enc_B, H, contextual.shape[-1]))
        ctx_lens = jnp.full((enc_B,), H, jnp.int32)
        cif_att = self.seaco_decoder(ctx, ctx_lens, semantic, tok_lens, True)
        dec_att = self.seaco_decoder(ctx, ctx_lens, dec_hidden, tok_lens, True)
        return self.hotword_output_layer(cif_att + dec_att)

    # ------------------------------------------------------------ inference
    def hotword_logprobs(
        self,
        speech, speech_lengths,
        hotword_pad, hotword_lengths,  # (H, Lh), (H,) — last row = no-bias
        max_tokens: int = 128,
    ):
        """Merged (decoder ⊕ bias-head) log-probs over the token grid
        (reference model.py:234 ``_seaco_decode_with_ASF``)
        -> (merged_logp, token_lengths)."""
        enc, enc_lens = self.encode(speech, speech_lengths, True)
        pred = self.predictor(enc, enc_lens, max_tokens=max_tokens,
                              deterministic=True)
        base = pred.base
        tok_lens = jnp.clip(jnp.round(base.token_num).astype(jnp.int32),
                            0, max_tokens)
        dec_hidden = self.decoder(enc, enc_lens, base.acoustic_embeds,
                                  tok_lens, True, return_hidden=True)
        dec_logits = self.decoder.project(dec_hidden)
        dec_logp = jax.nn.log_softmax(dec_logits.astype(jnp.float32), -1)

        contextual = self._hotword_representation(hotword_pad, hotword_lengths)
        dha_logits = self._dha_logits(contextual, enc.shape[0],
                                      base.acoustic_embeds, dec_hidden,
                                      tok_lens)
        dha_logp = jax.nn.log_softmax(dha_logits.astype(jnp.float32), -1)
        dha_ids = jnp.argmax(dha_logp, axis=-1)
        use_dec = (dha_ids == self.no_bias_id)[..., None]
        lam = self.seaco_weight
        merged = jnp.where(use_dec, dec_logp,
                           (1 - lam) * dec_logp + lam * dha_logp)
        return merged, tok_lens, pred

    def decode_with_hotwords(
        self,
        speech, speech_lengths,
        hotword_pad, hotword_lengths,
        max_tokens: int = 128,
    ):
        """Greedy decode with hotword bias fusion -> (tokens, token_lengths,
        us_alphas, us_peaks) — the upsampled fire tracks give the BiCif
        frame-accurate timestamps in the same pass."""
        merged, tok_lens, pred = self.hotword_logprobs(
            speech, speech_lengths, hotword_pad, hotword_lengths, max_tokens)
        tokens = jnp.argmax(merged, axis=-1)
        valid = sequence_mask(tok_lens, max_tokens, jnp.bool_)
        return (jnp.where(valid, tokens, self.blank_id), tok_lens,
                pred.us_alphas, pred.us_peaks)

    # -------------------------------------------------------------- training
    def seaco_loss(
        self,
        speech, speech_lengths, text, text_lengths,
        hotword_pad, hotword_lengths, seaco_label_pad,
        deterministic: bool = False,
    ):
        """SeACo training loss (model.py:186 ``_calc_seaco_loss``): label-
        smoothed CE of the dha head against labels that are the hotword
        tokens where they occur and NO_BIAS elsewhere."""
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        ys_pad, ys_lens = add_eos(text, text_lengths, self.eos, self.ignore_id)
        U = ys_pad.shape[1]
        pred = self.predictor(enc, enc_lens, max_tokens=U,
                              target_length=ys_lens.astype(jnp.float32),
                              deterministic=deterministic)
        base = pred.base
        dec_hidden = self.decoder(enc, enc_lens, base.acoustic_embeds,
                                  ys_lens, deterministic, return_hidden=True)
        contextual = self._hotword_representation(hotword_pad, hotword_lengths)
        dha_logits = self._dha_logits(contextual, enc.shape[0],
                                      base.acoustic_embeds, dec_hidden,
                                      ys_lens)
        # reference drops the last token position in the loss
        loss = losses.label_smoothing_loss(
            dha_logits[:, :-1], seaco_label_pad, self.ignore_id,
            self.seaco_lsm_weight, True,
        )
        return loss
