"""UniASR: the 2-pass (low-latency + offline corrector) model (reference
funasr/models/uniasr/model.py:27 — two full encoder/predictor/decoder
stacks; pass 1 decodes with limited context for latency, pass 2 re-reads
pass-1 encoder states together with the features for the final result).

TPU design: both passes are NAR (CIF predictor + bidirectional SANM
decoder, the same device-resident machinery as Paraformer) inside ONE
jitted program; pass 1's encoder runs under a *chunk-limited attention
mask* (streaming-equivalent context), pass 2's encoder consumes
``concat(features, enc1)`` with full context.  ``greedy_decode`` returns
both passes so a server can emit pass-1 tokens immediately and correct
with pass 2 (the 2-pass websocket mode).

TRAINING-OBJECTIVE DIVERGENCE (read before fine-tuning from a reference
checkpoint): the reference UniASR trains each pass AUTOREGRESSIVELY with
``FsmnDecoderSCAMAOpt`` + the SCAMA chunk mask (uniasr/model.py:316
``_calc_att_loss`` path).  This class keeps the serving-oriented NAR
objective (CIF embeddings through a bidirectional decoder) — weights
convert cleanly in both directions (same parameter layout,
convert.py:uniasr_from_torch), and inference quality tracks the NAR
Paraformer recipe, but *training dynamics differ from the reference*: a
fine-tune starting from a reference UniASR checkpoint optimises a
different loss surface.  For reference-exact AR chunk-aware training use
the SCAMA model (models/scama/model.py), which since r4 trains the real
objective.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu import losses
from funasr_tpu.models.paraformer.decoder import ParaformerSANMDecoder
from funasr_tpu.models.paraformer.predictor import CifPredictorV2
from funasr_tpu.models.paraformer.model import add_eos
from funasr_tpu.models.sanm import SANMEncoder
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


def chunk_attn_mask(T: int, chunk_size: int, left_chunks: int = -1
                    ) -> jnp.ndarray:
    """(T, T) chunkwise attention mask: frame t sees frames in its own
    chunk and ``left_chunks`` previous chunks (all if -1) — the SCAMA/
    UniASR streaming context limit (reference scama/chunk_utilis.py)."""
    idx = jnp.arange(T) // chunk_size
    same_or_past = idx[:, None] >= idx[None, :]
    if left_chunks >= 0:
        within = idx[:, None] - idx[None, :] <= left_chunks
        same_or_past = same_or_past & within
    return same_or_past.astype(jnp.float32)


@tables.register("model_classes", "UniASR")
class UniASR(nn.Module):
    vocab_size: int
    input_size: int = 560
    encoder_conf: Dict[str, Any] = None
    decoder_conf: Dict[str, Any] = None
    predictor_conf: Dict[str, Any] = None
    encoder_conf2: Dict[str, Any] = None
    decoder_conf2: Dict[str, Any] = None
    predictor_conf2: Dict[str, Any] = None
    chunk_size: int = 10
    left_chunks: int = -1
    loss_weight_model1: float = 0.5
    predictor_weight: float = 1.0
    lsm_weight: float = 0.1
    length_normalized_loss: bool = True
    ignore_id: int = -1
    blank_id: int = 0
    sos: int = 1
    eos: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _enc_conf(self, conf):
        conf = dict(conf or {})
        conf.pop("pos_enc_class", None)
        conf.pop("selfattention_layer_type", None)
        conf.pop("positional_dropout_rate", None)
        conf.setdefault("input_layer", "pe")
        conf["sanm_shift"] = conf.pop("sanm_shfit", 0)
        return conf

    def setup(self):
        c1 = self._enc_conf(self.encoder_conf)
        self.encoder1 = SANMEncoder(
            input_size=self.input_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder1", **c1)
        d1 = self.encoder1.output_size
        c2 = self._enc_conf(self.encoder_conf2 or self.encoder_conf)
        self.encoder2 = SANMEncoder(
            input_size=self.input_size + d1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="encoder2", **c2)
        d2 = self.encoder2.output_size

        def mk_pred(conf, d, name):
            conf = dict(conf or {})
            conf.setdefault("idim", d)
            return CifPredictorV2(dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name=name, **conf)

        def mk_dec(conf, d, name):
            conf = dict(conf or {})
            conf.pop("positional_dropout_rate", None)
            conf["sanm_shift"] = conf.pop("sanm_shfit", 0)
            return ParaformerSANMDecoder(
                vocab_size=self.vocab_size, encoder_output_size=d,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=name, **conf)

        self.predictor1 = mk_pred(self.predictor_conf, d1, "predictor1")
        self.decoder1 = mk_dec(self.decoder_conf, d1, "decoder1")
        self.predictor2 = mk_pred(self.predictor_conf2 or self.predictor_conf,
                                  d2, "predictor2")
        self.decoder2 = mk_dec(self.decoder_conf2 or self.decoder_conf,
                               d2, "decoder2")

    # ----------------------------------------------------------- internals
    def _encode1(self, speech, speech_lengths, deterministic):
        T = speech.shape[1]
        am = chunk_attn_mask(T, self.chunk_size, self.left_chunks)
        am = jnp.broadcast_to(am[None], (speech.shape[0], T, T))
        return self.encoder1(speech, speech_lengths, deterministic,
                             attn_mask=am)

    def _encode2(self, speech, enc1, speech_lengths, deterministic):
        x = jnp.concatenate([speech.astype(enc1.dtype), enc1], axis=-1)
        return self.encoder2(x, speech_lengths, deterministic)

    def _pass_loss(self, predictor, decoder, enc, enc_lens, ys_pad, ys_lens,
                   deterministic):
        U = ys_pad.shape[1]
        pred = predictor(enc, enc_lens, max_tokens=U,
                         target_length=ys_lens.astype(jnp.float32),
                         deterministic=deterministic)
        logits = decoder(enc, enc_lens, pred.acoustic_embeds, ys_lens,
                         deterministic)
        loss_att = losses.label_smoothing_loss(
            logits, ys_pad, self.ignore_id, self.lsm_weight,
            self.length_normalized_loss)
        loss_pre = losses.mae_length_loss(ys_lens, pred.token_num,
                                          self.length_normalized_loss)
        acc = losses.th_accuracy(logits, ys_pad, self.ignore_id)
        return loss_att + self.predictor_weight * loss_pre, loss_att, acc

    # --------------------------------------------------------------- train
    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = False):
        ys_pad, ys_lens = add_eos(text, text_lengths, self.eos,
                                  self.ignore_id)
        enc1, enc1_lens = self._encode1(speech, speech_lengths, deterministic)
        loss1, att1, acc1 = self._pass_loss(
            self.predictor1, self.decoder1, enc1, enc1_lens, ys_pad, ys_lens,
            deterministic)
        enc2, enc2_lens = self._encode2(speech, enc1, speech_lengths,
                                        deterministic)
        loss2, att2, acc2 = self._pass_loss(
            self.predictor2, self.decoder2, enc2, enc2_lens, ys_pad, ys_lens,
            deterministic)
        w = self.loss_weight_model1
        loss = w * loss1 + (1.0 - w) * loss2
        stats = {"loss": loss, "loss1": loss1, "loss2": loss2,
                 "acc1": acc1, "acc2": acc2}
        return loss, stats

    # ----------------------------------------------------------- inference
    def greedy_decode(self, speech, speech_lengths, max_tokens: int = 128):
        """Both passes, one program -> dict of (tokens, lengths) per pass."""
        enc1, enc1_lens = self._encode1(speech, speech_lengths, True)
        out = {}
        for name, (pr, de, enc, lens) in {
            "pass1": (self.predictor1, self.decoder1, enc1, enc1_lens),
        }.items():
            out[name] = self._pass_decode(pr, de, enc, lens, max_tokens)
        enc2, enc2_lens = self._encode2(speech, enc1, speech_lengths, True)
        out["pass2"] = self._pass_decode(self.predictor2, self.decoder2,
                                         enc2, enc2_lens, max_tokens)
        return out

    def _pass_decode(self, predictor, decoder, enc, enc_lens, max_tokens):
        pred = predictor(enc, enc_lens, max_tokens=max_tokens,
                         deterministic=True)
        n = jnp.clip(jnp.round(pred.token_num).astype(jnp.int32), 0,
                     max_tokens)
        logits = decoder(enc, enc_lens, pred.acoustic_embeds, n, True)
        tokens = jnp.argmax(logits, axis=-1)
        valid = sequence_mask(n, tokens.shape[1], dtype=jnp.bool_)
        return jnp.where(valid, tokens, self.blank_id), n
