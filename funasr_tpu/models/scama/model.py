"""SCAMA: streaming chunk-aware multihead attention model (reference
funasr/models/scama/ — arXiv:2006.01712).

The reference SCAMA (scama/model.py:40) is an AUTOREGRESSIVE streaming
model: a chunked SANM encoder, a CIF predictor whose per-frame fire
alignment synchronises decoding with chunks, and the chunk-aware
``FsmnDecoderSCAMAOpt`` decoder (scama/decoder.py:204) whose
cross-attention is masked so token i only sees encoder frames up to the
chunk containing its fire frame (+ bounded look-back) — trained with
label-smoothed CE on sos/eos targets + MAE predictor loss
(model.py:303 ``_calc_att_predictor_loss``) and decoded with a
chunk-synchronised beam (scama/beam_search.py:36).

TPU design: the chunk limit on the ENCODER is a static chunkwise attention
mask (identical receptive field to the reference's overlap-chunk
machinery); the decoder's SCAMA mask is built by
:func:`funasr_tpu.models.scama.decoder.scama_cross_mask` from the CIF
fire track; decoding is the device-resident tensor beam
(ops/beam_search.py) driven by the FSMN-cached step scorer
:class:`CachedScamaDecoder` — one jitted program, no per-token host trips.

Training-objective note: up to r3 this class trained the NAR Paraformer
objective (a documented divergence); it now trains the reference's AR
chunk-aware objective, so fine-tuning from a reference SCAMA checkpoint
follows the same dynamics.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from funasr_tpu import losses
from funasr_tpu.models.paraformer.model import Paraformer
from funasr_tpu.models.scama.decoder import (  # noqa: F401 (registration)
    CachedScamaDecoder,
    FsmnDecoderSCAMAOpt,
    scama_cross_mask,
)
from funasr_tpu.models.transformer.model import add_sos_eos
from funasr_tpu.models.uniasr.model import chunk_attn_mask
from funasr_tpu.ops.beam_search import beam_search, mask_ctc_frames
from funasr_tpu.registry import tables

Dtype = Any


@tables.register("model_classes", "SCAMA")
class SCAMA(Paraformer):
    """Chunk-aware AR streaming model (reference scama/model.py:40)."""

    decoder_name: Optional[str] = "FsmnDecoderSCAMAOpt"
    chunk_size: int = 10          # encoder frames per chunk
    left_chunks: int = -1         # encoder look-back (-1 = unlimited)
    decoder_att_look_back_factor: int = 1  # decoder chunk look-back

    def encode(self, speech, speech_lengths, deterministic: bool = True):
        T = speech.shape[1]
        am = chunk_attn_mask(T, self.chunk_size, self.left_chunks)
        am = jnp.broadcast_to(am[None], (speech.shape[0], T, T))
        return self.encoder(speech, speech_lengths, deterministic,
                            attn_mask=am)

    # ----------------------------------------------------------------- train
    def __call__(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        deterministic: bool = False,
        encoded=None,
    ):
        """AR chunk-aware objective (reference scama/model.py:160 forward /
        :303 ``_calc_att_predictor_loss``): CE over sos/eos-wrapped targets
        with the SCAMA cross-attention mask + MAE predictor-count loss
        (predictor target = U+1, the eos-augmented length, model.py:388)."""
        B = speech.shape[0]
        enc, enc_lens = (encoded if encoded is not None
                         else self.encode(speech, speech_lengths,
                                          deterministic))
        ys_in, ys_out, ys_in_lens = add_sos_eos(
            text, text_lengths, self.sos, self.eos, self.ignore_id)
        U1 = ys_in.shape[1]

        pred = self.predictor(
            enc, enc_lens, max_tokens=U1,
            target_length=ys_in_lens.astype(jnp.float32),
            deterministic=deterministic,
        )
        mask = scama_cross_mask(
            pred.peaks, enc_lens, ys_in_lens, U1, self.chunk_size,
            self.decoder_att_look_back_factor, n_frames=enc.shape[1])
        logits = self.decoder(enc, enc_lens, ys_in, ys_in_lens,
                              chunk_mask=mask, deterministic=deterministic)
        loss_att = losses.label_smoothing_loss(
            logits, ys_out, self.ignore_id, self.lsm_weight,
            self.length_normalized_loss)
        loss_pre = losses.mae_length_loss(
            ys_in_lens, pred.token_num, self.length_normalized_loss)
        acc = losses.th_accuracy(logits, ys_out, self.ignore_id)
        stats = {"loss_att": loss_att, "loss_pre": loss_pre, "acc": acc}
        if self.ctc_weight > 0.0:
            ctc_logits = self.ctc_lo(enc)
            loss_ctc = losses.ctc_loss(
                ctc_logits, enc_lens, text, text_lengths,
                self.ignore_id, self.blank_id)
            loss = (self.ctc_weight * loss_ctc
                    + (1.0 - self.ctc_weight) * loss_att
                    + self.predictor_weight * loss_pre)
            stats["loss_ctc"] = loss_ctc
        else:
            loss = loss_att + self.predictor_weight * loss_pre
        stats["loss"] = loss
        stats["batch_size"] = jnp.asarray(B)
        return loss, stats

    # ---------------------------------------------------------------- decode
    def decode_beam(
        self, speech, speech_lengths, beam: int = 5, maxlen: int = 96,
        decoding_ctc_weight: float = 0.0, length_bonus: float = 0.0,
    ):
        """Chunk-aware AR beam decode -> (tokens (B,K,L), lengths, scores).

        The predictor's fire track builds the per-token SCAMA window mask;
        steps score through the FSMN-cached scorer so the whole beam is
        one device program (role of reference scama/beam_search.py:36
        ``BeamSearchScamaStreaming`` without its per-token host loop).
        """
        enc, enc_lens = self.encode(speech, speech_lengths, True)
        B = enc.shape[0]
        pred = self.predictor(enc, enc_lens, max_tokens=maxlen + 1,
                              deterministic=True)
        cross_mask = scama_cross_mask(
            pred.peaks, enc_lens,
            jnp.full((B,), maxlen + 1, jnp.int32),  # gate rows per step
            maxlen + 1, self.chunk_size, self.decoder_att_look_back_factor,
            n_frames=enc.shape[1])

        dec = self.decoder
        scorer = CachedScamaDecoder(
            self.variables["params"]["decoder"],
            enc.astype(self.dtype), enc_lens,
            n_head=dec.attention_heads, kernel_size=dec.kernel_size,
            dtype=self.dtype, cross_mask=cross_mask, beam=beam)

        ctc_logp = None
        if decoding_ctc_weight > 0.0 and self.ctc_weight > 0.0:
            ctc_logp = jax.nn.log_softmax(
                self.ctc_lo(enc).astype(jnp.float32), axis=-1)
            ctc_logp = mask_ctc_frames(ctc_logp, enc_lens, self.blank_id)

        return beam_search(
            None, B, beam, self.vocab_size, self.sos, self.eos, maxlen,
            ctc_logp=ctc_logp, ctc_weight=decoding_ctc_weight,
            length_bonus=length_bonus, blank_id=self.blank_id,
            step_score_fn=scorer.step, dec_state=scorer.init_state(),
            state_reorder_fn=CachedScamaDecoder.reorder_state,
        )

    def greedy_decode(self, speech, speech_lengths, max_tokens: int = 128):
        """AR greedy = beam 1 (keeps the ParaformerEngine-style surface).

        Returns (tokens (B, L), lengths (B,))."""
        res = self.decode_beam(speech, speech_lengths, beam=1,
                               maxlen=max_tokens)
        return res.tokens[:, 0], res.lengths[:, 0]
