"""Paraformer: non-autoregressive ASR (reference
funasr/models/paraformer/model.py:30).

encoder -> CIF predictor (one acoustic embedding per token) -> single-pass
bidirectional decoder.  Training uses the glancing-LM sampler (model.py:339)
mixing ground-truth token embeddings into the CIF embeddings, plus label
smoothing loss, an MAE token-count loss on the predictor, and an optional
CTC branch.

TPU design: the whole forward (train and greedy inference) is one jitted
program with static shapes — the token grid is padded to ``max_tokens`` and
real counts travel as lengths.  The per-utterance Python beam loop of the
reference (model.py:527-546) is replaced by device-resident argmax decode;
beam/CTC-fusion decode lives in funasr_tpu/ops/decode.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu import losses
from funasr_tpu.models.paraformer.decoder import ParaformerSANMDecoder
from funasr_tpu.models.paraformer.predictor import CifPredictorV2
from funasr_tpu.models.sanm import SANMEncoder
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


def add_eos(text: jnp.ndarray, text_lengths: jnp.ndarray, eos: int,
            ignore_id: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Append eos at position ``len`` of each row (reference ``add_sos_eos``
    ys_out with predictor_bias=1, paraformer/model.py:297-299).

    Output is one column wider; pads are ``ignore_id``.
    """
    B, U = text.shape
    padded = jnp.full((B, U + 1), ignore_id, dtype=text.dtype)
    valid = sequence_mask(text_lengths, U, dtype=jnp.bool_)
    padded = padded.at[:, :U].set(jnp.where(valid, text, ignore_id))
    pos = jnp.arange(U + 1)[None, :]
    padded = jnp.where(pos == text_lengths[:, None], eos, padded)
    return padded, text_lengths + 1


@tables.register("model_classes", "Paraformer")
class Paraformer(nn.Module):
    """Flagship NAR model; config fields mirror the reference template.yaml."""

    vocab_size: int
    input_size: int = 560
    encoder_name: Optional[str] = None  # registry override (default SANM)
    encoder_conf: Dict[str, Any] = None
    decoder_name: Optional[str] = None  # registry override (default SANM)
    decoder_conf: Dict[str, Any] = None
    predictor_conf: Dict[str, Any] = None
    ctc_weight: float = 0.0
    lsm_weight: float = 0.1
    length_normalized_loss: bool = True
    predictor_weight: float = 1.0
    predictor_bias: int = 1
    sampling_ratio: float = 0.75
    ignore_id: int = -1
    blank_id: int = 0
    sos: int = 1
    eos: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        import dataclasses

        from funasr_tpu.registry import tables as _tables

        enc_conf = dict(self.encoder_conf or {})
        # encoder selectable by registry name, like the reference
        # (paraformer/model.py builds encoder from tables.encoder_classes
        # — the AISHELL academic recipe uses a Conformer encoder under
        # Paraformer, examples/aishell/paraformer/conf)
        if self.encoder_name in (None, "SANMEncoder"):
            enc_conf.pop("pos_enc_class", None)
            enc_conf.pop("selfattention_layer_type", None)
            enc_conf.setdefault("input_layer", "pe")
            enc_conf.pop("positional_dropout_rate", None)
            sanm_shift = enc_conf.pop("sanm_shfit", 0)
            self.encoder = SANMEncoder(
                input_size=self.input_size,
                sanm_shift=sanm_shift,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="encoder", **enc_conf,
            )
        else:
            enc_cls = _tables.get("encoder_classes", self.encoder_name)
            enc_fields = {f.name for f in dataclasses.fields(enc_cls)}
            enc_conf = {k: v for k, v in enc_conf.items()
                        if k in enc_fields}
            self.encoder = enc_cls(
                input_size=self.input_size,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="encoder", **enc_conf,
            )
        d_model = self.encoder.output_size

        dec_conf = dict(self.decoder_conf or {})
        dec_conf.pop("positional_dropout_rate", None)
        if "sanm_shfit" in dec_conf:  # reference template spelling
            dec_conf["sanm_shift"] = dec_conf.pop("sanm_shfit")
        elif "sanm_shift" not in dec_conf:
            # keep each decoder class's own default (0 for Paraformer,
            # (kernel-1)//2-causal for FsmnDecoderSCAMAOpt) — forcing 0
            # here would silently de-causalise the SCAMA decoder
            pass
        dec_cls = (ParaformerSANMDecoder if self.decoder_name is None
                   else _tables.get("decoder_classes", self.decoder_name))
        fields = {f.name for f in dataclasses.fields(dec_cls)}
        dec_conf = {k: v for k, v in dec_conf.items() if k in fields}
        self.decoder = dec_cls(
            vocab_size=self.vocab_size,
            encoder_output_size=d_model,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="decoder", **dec_conf,
        )

        self.predictor = self.make_predictor(d_model)

        if self.ctc_weight > 0.0:
            self.ctc_lo = nn.Dense(
                self.vocab_size, name="ctc_lo",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )

    def make_predictor(self, d_model: int):
        """Factory hook; BiCifParaformer swaps in CifPredictorV3."""
        pred_conf = dict(self.predictor_conf or {})
        pred_conf.setdefault("idim", d_model)
        return CifPredictorV2(
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="predictor", **pred_conf,
        )

    # ---------------------------------------------------------------- encode
    def encode(self, speech, speech_lengths, deterministic: bool = True):
        return self.encoder(speech, speech_lengths, deterministic)

    # ----------------------------------------------------------------- train
    def __call__(
        self,
        speech: jnp.ndarray,  # (B, T, input_size) LFR+CMVN features
        speech_lengths: jnp.ndarray,
        text: jnp.ndarray,  # (B, U) token ids, ignore_id padded
        text_lengths: jnp.ndarray,
        deterministic: bool = False,
        encoded=None,  # optional (enc, enc_lens) to share the encoder pass
    ):
        """Training forward -> (loss, stats).  Matches reference
        model.py:168 ``forward`` loss composition."""
        B = speech.shape[0]
        enc, enc_lens = (encoded if encoded is not None
                         else self.encode(speech, speech_lengths,
                                          deterministic))

        ys_pad, ys_lens = (
            add_eos(text, text_lengths, self.eos, self.ignore_id)
            if self.predictor_bias == 1
            else (text, text_lengths)
        )
        U = ys_pad.shape[1]

        pred = self.predictor(
            enc, enc_lens, max_tokens=U,
            target_length=ys_lens.astype(jnp.float32),
            deterministic=deterministic,
        )

        if self.sampling_ratio > 0.0 and not deterministic:
            semantic, glat_logits = self._glm_sampler(
                enc, enc_lens, ys_pad, ys_lens, pred.acoustic_embeds
            )
        else:
            semantic, glat_logits = pred.acoustic_embeds, None

        logits = self.decoder(enc, enc_lens, semantic, ys_lens, deterministic)

        loss_att = losses.label_smoothing_loss(
            logits, ys_pad, self.ignore_id, self.lsm_weight,
            self.length_normalized_loss,
        )
        loss_pre = losses.mae_length_loss(
            ys_lens, pred.token_num, self.length_normalized_loss
        )
        acc = losses.th_accuracy(
            glat_logits if glat_logits is not None else logits,
            ys_pad, self.ignore_id,
        )

        stats = {"loss_att": loss_att, "loss_pre": loss_pre, "acc": acc}
        if self.ctc_weight > 0.0:
            # CTC trains on the RAW targets, not the eos-augmented ys_pad
            # (reference model.py:199 computes _calc_ctc_loss on
            # text/text_lengths before add_sos_eos)
            ctc_logits = self.ctc_lo(enc)
            loss_ctc = losses.ctc_loss(
                ctc_logits, enc_lens, text, text_lengths,
                self.ignore_id, self.blank_id,
            )
            loss = (
                self.ctc_weight * loss_ctc
                + (1.0 - self.ctc_weight) * loss_att
                + self.predictor_weight * loss_pre
            )
            stats["loss_ctc"] = loss_ctc
        else:
            loss = loss_att + self.predictor_weight * loss_pre
        stats["loss"] = loss
        stats["batch_size"] = jnp.asarray(B)
        return loss, stats

    def _glm_sampler(self, enc, enc_lens, ys_pad, ys_lens, acoustic_embeds,
                     stop_grad: bool = True):
        """Glancing-LM sampler (reference model.py:339 ``sampler``): run the
        decoder on the raw CIF embeddings without grad, count wrong tokens,
        and swap a random ``ratio * #wrong`` subset of positions for
        ground-truth token embeddings.  ``stop_grad=False`` keeps the first
        pass in the grad graph (e_paraformer's sampler_with_grad,
        e_paraformer/model.py:399 — its logits take an extra CE term)."""
        U = ys_pad.shape[1]
        tgt_mask = sequence_mask(ys_lens, U, dtype=jnp.float32)[:, :, None]
        ys_masked = jnp.where(ys_pad == self.ignore_id, 0, ys_pad)
        ys_embed = self.decoder.embed_tokens(ys_masked)

        # dropout stays LIVE in this pass: the reference wraps it in
        # torch.no_grad() with the module in train() mode (model.py:357),
        # so the wrong-token count is computed on dropout-noised logits
        logits = self.decoder(enc, enc_lens, acoustic_embeds, ys_lens, False)
        if stop_grad:
            logits = jax.lax.stop_gradient(logits)
        pred = jnp.argmax(logits, axis=-1)
        nonpad = ys_pad != self.ignore_id
        same = jnp.sum((pred == ys_pad) & nonpad, axis=-1)
        seq_lens = jnp.sum(nonpad, axis=-1)
        target_num = (
            (seq_lens - same).astype(jnp.float32) * self.sampling_ratio
        ).astype(jnp.int32)

        rng = self.make_rng("sampler")
        noise = jax.random.uniform(rng, ys_pad.shape)
        noise = jnp.where(nonpad, noise, jnp.inf)  # pads sort last
        order = jnp.argsort(noise, axis=-1)
        ranks = jnp.argsort(order, axis=-1)
        swap = (ranks < target_num[:, None]) & nonpad  # positions taking GT embeds

        semantic = jnp.where(
            swap[:, :, None], ys_embed.astype(acoustic_embeds.dtype), acoustic_embeds
        )
        return semantic * tgt_mask.astype(semantic.dtype), logits

    # ------------------------------------------------------------- inference
    def inference_logits(
        self,
        speech: jnp.ndarray,
        speech_lengths: jnp.ndarray,
        max_tokens: int = 128,
    ):
        """Offline inference up to decoder log-probs, fully on device.

        Returns (log_probs (B, U, V), token_lengths (B,), predictor outputs).
        Greedy decode = argmax over log_probs within token_lengths.
        """
        logits, token_lengths, pred = self._infer_raw_logits(
            speech, speech_lengths, max_tokens)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return log_probs, token_lengths, pred

    def _infer_raw_logits(self, speech, speech_lengths, max_tokens=128):
        enc, enc_lens = self.encode(speech, speech_lengths, True)
        pred = self.predictor(enc, enc_lens, max_tokens=max_tokens,
                              deterministic=True)
        token_lengths = jnp.clip(
            jnp.round(pred.token_num).astype(jnp.int32), 0, max_tokens
        )
        logits = self.decoder(enc, enc_lens, pred.acoustic_embeds,
                              token_lengths, True)
        return logits, token_lengths, pred

    def greedy_decode(self, speech, speech_lengths, max_tokens: int = 128):
        """argmax decode (the reference's default decode path,
        model.py:539-546) -> (tokens (B, U), token_lengths, scores).

        Works on raw logits: argmax(log_softmax) == argmax(logits), and the
        per-token greedy log-prob is max(logits) - logsumexp(logits) — both
        fuse into reductions over the vocab axis, so the (B, U, V) float32
        log-prob tensor is never materialized in HBM.
        """
        logits, token_lengths, _ = self._infer_raw_logits(
            speech, speech_lengths, max_tokens
        )
        tokens = jnp.argmax(logits, axis=-1)
        lf = logits.astype(jnp.float32)
        tok_logp = jnp.max(lf, axis=-1) - jax.nn.logsumexp(lf, axis=-1)
        valid = sequence_mask(token_lengths, tokens.shape[1], dtype=jnp.bool_)
        tokens = jnp.where(valid, tokens, self.blank_id)
        scores = jnp.sum(tok_logp * valid.astype(jnp.float32), axis=-1)
        return tokens, token_lengths, scores
