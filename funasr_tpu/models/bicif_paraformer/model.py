"""BiCifParaformer: Paraformer + frame-accurate timestamps (reference
funasr/models/bicif_paraformer/ — ``CifPredictorV3`` cif_predictor.py:97,
model losses model.py:54, timestamp path model.py:135).

``CifPredictorV3`` adds a second alpha head on a x`upsample_times`
transposed-conv upsampling of the CIF conv features; the upsampled fire
track gives token boundaries at (60 / upsample_times) ms resolution.  The
stride==kernel ConvTranspose1d is expressed as a per-frame einsum expansion
(no overlap), which XLA maps straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu import losses
from funasr_tpu.models.paraformer.model import Paraformer, add_eos
from funasr_tpu.models.paraformer.predictor import CifPredictorV2, PredictorOutput
from funasr_tpu.ops.cif import cif, cif_tail, compensated_cumsum
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


class PredictorOutputV3(NamedTuple):
    base: PredictorOutput
    us_alphas: jnp.ndarray  # (B, T*u) upsampled alphas (rescaled)
    us_peaks: jnp.ndarray  # (B, T*u) upsampled fire indicator
    token_num2: jnp.ndarray  # (B,) PRE-rescale sum of the upsample head:
    # the pre2 training signal (reference cif_predictor.py:214
    # token_num2 = alphas2.sum(-1)); the rescaled us_alphas sum to
    # token_num identically, which would give the head ZERO gradient


@tables.register("predictor_classes", "CifPredictorV3")
class CifPredictorV3(nn.Module):
    idim: int
    l_order: int = 1
    r_order: int = 1
    threshold: float = 1.0
    dropout: float = 0.1
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0
    tail_threshold: float = 0.45
    smooth_factor2: float = 0.25
    noise_threshold2: float = 0.01
    upsample_times: int = 3
    use_cif1_cnn: bool = False
    # published BiCif/SeACo/aligner checkpoints use "cnn_blstm"
    # (reference bicif template.yaml:61: ConvTranspose1d -> 1-layer
    # bidirectional LSTM -> Linear(2D, 1)); "cnn" skips the BLSTM
    upsample_type: str = "cnn"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, lengths, max_tokens,
                 target_length: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> PredictorOutputV3:
        B, T, D = hidden.shape
        h = hidden.astype(jnp.float32)
        kernel = self.param("cif_conv1d", nn.initializers.lecun_normal(),
                            (self.l_order + self.r_order + 1, D, D),
                            self.param_dtype)
        conv_bias = self.param("cif_conv1d_bias", nn.initializers.zeros, (D,),
                               self.param_dtype)
        conv = lax.conv_general_dilated(
            h, kernel.astype(jnp.float32), (1,),
            [(self.l_order, self.r_order)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + conv_bias
        q = nn.relu(conv)
        q = nn.Dropout(self.dropout)(q, deterministic=deterministic)
        out = nn.Dense(1, name="cif_output", dtype=jnp.float32,
                       param_dtype=self.param_dtype)(q)
        alphas = nn.relu(nn.sigmoid(out[..., 0]) * self.smooth_factor
                         - self.noise_threshold)

        mask = sequence_mask(lengths, T, dtype=jnp.float32)
        alphas = alphas * mask
        hidden_masked = h * mask[:, :, None]
        token_num = jnp.sum(alphas, axis=-1)

        # ---- upsampled timestamp head (alphas2)
        u = self.upsample_times
        src = q if self.use_cif1_cnn else h
        up_w = self.param("upsample_cnn", nn.initializers.lecun_normal(),
                          (u, D, D), self.param_dtype)
        up_b = self.param("upsample_cnn_bias", nn.initializers.zeros, (D,),
                          self.param_dtype)
        up = jnp.einsum("btd,udo->btuo", src, up_w.astype(jnp.float32)) + up_b
        up = up.reshape(B, T * u, D)
        if self.upsample_type == "cnn_blstm":
            # reference cif_predictor.py:138-145: 1-layer BLSTM over the
            # upsampled track, cif_output2 on the (2D) concat.  Torch runs
            # it unpacked over padded frames; same here, so parity holds.
            fwd = nn.RNN(nn.OptimizedLSTMCell(D, param_dtype=jnp.float32,
                                              name="blstm_fwd"))
            bwd = nn.RNN(nn.OptimizedLSTMCell(D, param_dtype=jnp.float32,
                                              name="blstm_bwd"),
                         reverse=True, keep_order=True)
            up = jnp.concatenate([fwd(up), bwd(up)], axis=-1)
        elif self.upsample_type != "cnn":
            raise NotImplementedError(
                f"upsample_type {self.upsample_type!r} (cnn / cnn_blstm)")
        out2 = nn.Dense(1, name="cif_output2", dtype=jnp.float32,
                        param_dtype=self.param_dtype)(up)
        alphas2 = nn.relu(nn.sigmoid(out2[..., 0]) * self.smooth_factor2
                          - self.noise_threshold2)
        mask2 = jnp.repeat(mask, u, axis=-1)
        alphas2 = alphas2 * mask2
        token_num2 = jnp.sum(alphas2, axis=-1)

        def us_track(a2, count):
            # rescale so the upsampled head integrates to exactly `count`
            # (reference cif_predictor.py:283-284), then fire at multiples of
            # threshold-1e-4 — the reference's own cif_wo_hidden
            # (bicif cif_predictor.py:71,290) subtracts that theta per fire,
            # so fires sit at k*theta crossings of the cumsum.
            theta = self.threshold - 1e-4
            scale = count / jnp.maximum(jnp.sum(a2, axis=-1), 1e-6)
            a2 = a2 * scale[:, None]
            s, c = compensated_cumsum(a2, axis=-1)
            S = s + c
            P = S - a2
            return a2, jnp.floor(S / theta) > jnp.floor(P / theta)

        if target_length is not None:
            scale = target_length.astype(jnp.float32) / jnp.maximum(token_num, 1e-6)
            a = alphas * scale[:, None]
            o = cif(hidden_masked, a, max_tokens)
            base = PredictorOutput(o.embeds.astype(self.dtype), token_num, a,
                                   o.fires, o.peaks)
            alphas2, us_peaks = us_track(
                alphas2, target_length.astype(jnp.float32))
            return PredictorOutputV3(base, alphas2, us_peaks, token_num2)

        if self.tail_threshold > 0.0:
            hidden_masked, alphas, tok_floor = cif_tail(
                hidden_masked, alphas, lengths, self.tail_threshold)
            token_num = tok_floor
        o = cif(hidden_masked, alphas, max_tokens)
        base = PredictorOutput(o.embeds.astype(self.dtype), token_num, alphas,
                               o.fires, o.peaks)
        alphas2, us_peaks = us_track(alphas2, token_num.astype(jnp.float32))
        return PredictorOutputV3(base, alphas2, us_peaks, token_num2)


@tables.register("model_classes", "BiCifParaformer")
class BiCifParaformer(Paraformer):
    """Paraformer with the V3 predictor and the extra pre2 token-count loss
    (reference model.py:54 ``_calc_pre2_loss``)."""

    upsample_times: int = 3

    def make_predictor(self, d_model: int):
        pred_conf = dict(self.predictor_conf or {})
        pred_conf.setdefault("idim", d_model)
        pred_conf.setdefault("upsample_times", self.upsample_times)
        return CifPredictorV3(
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="predictor", **pred_conf,
        )

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = False):
        enc, enc_lens = self.encode(speech, speech_lengths, deterministic)
        ys_pad, ys_lens = add_eos(text, text_lengths, self.eos, self.ignore_id) \
            if self.predictor_bias == 1 else (text, text_lengths)
        U = ys_pad.shape[1]
        pred = self.predictor(
            enc, enc_lens, max_tokens=U,
            target_length=ys_lens.astype(jnp.float32),
            deterministic=deterministic,
        )
        base = pred.base
        if self.sampling_ratio > 0.0 and not deterministic:
            semantic, glat_logits = self._glm_sampler(
                enc, enc_lens, ys_pad, ys_lens, base.acoustic_embeds)
        else:
            semantic, glat_logits = base.acoustic_embeds, None
        logits = self.decoder(enc, enc_lens, semantic, ys_lens, deterministic)
        loss_att = losses.label_smoothing_loss(
            logits, ys_pad, self.ignore_id, self.lsm_weight,
            self.length_normalized_loss)
        loss_pre = losses.mae_length_loss(ys_lens, base.token_num,
                                          self.length_normalized_loss)
        # pre2: the upsample head's PRE-rescale mass must integrate to the
        # target length (token_num2; the rescaled us_alphas sum to the
        # target identically and would give zero gradient)
        loss_pre2 = losses.mae_length_loss(
            ys_lens, pred.token_num2, self.length_normalized_loss)
        acc = losses.th_accuracy(
            glat_logits if glat_logits is not None else logits,
            ys_pad, self.ignore_id)
        # reference model.py:195 weights pre2 by predictor_weight * 0.5
        loss = (loss_att + self.predictor_weight * loss_pre
                + 0.5 * self.predictor_weight * loss_pre2)
        stats = {"loss": loss, "loss_att": loss_att, "loss_pre": loss_pre,
                 "loss_pre2": loss_pre2, "acc": acc}
        return loss, stats

    def _infer_raw_logits(self, speech, speech_lengths, max_tokens=128):
        """V3-predictor override: the base CIF track drives the decoder
        (pred.base); keeps the inherited greedy_decode / inference_logits
        working on the V3 output tree."""
        enc, enc_lens = self.encode(speech, speech_lengths, True)
        pred = self.predictor(enc, enc_lens, max_tokens=max_tokens,
                              deterministic=True)
        base = pred.base
        token_lengths = jnp.clip(
            jnp.round(base.token_num).astype(jnp.int32), 0, max_tokens)
        logits = self.decoder(enc, enc_lens, base.acoustic_embeds,
                              token_lengths, True)
        return logits, token_lengths, pred

    def timestamps(self, speech, speech_lengths, max_tokens: int = 128):
        """-> (tokens, token_lengths, us_alphas, us_peaks) for
        frame-accurate stamps at 60/upsample_times ms resolution."""
        log_probs, token_lengths, pred = self.inference_logits(
            speech, speech_lengths, max_tokens)
        tokens = jnp.argmax(log_probs, axis=-1)
        return tokens, token_lengths, pred.us_alphas, pred.us_peaks
