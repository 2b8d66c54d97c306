"""Monotonic aligner ("fa-zh"): timestamp-only forced alignment (reference
funasr/models/monotonic_aligner/model.py:25).

SANM encoder + CifPredictorV3; given a transcript (token count), the
upsampled CIF track rescaled to integrate to exactly that count yields one
fire per token — forced-alignment timestamps at 60/upsample_times ms.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu import losses
from funasr_tpu.models.bicif_paraformer.model import CifPredictorV3
from funasr_tpu.models.sanm import SANMEncoder
from funasr_tpu.ops.cif import compensated_cumsum
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


@tables.register("model_classes", "MonotonicAligner")
class MonotonicAligner(nn.Module):
    input_size: int = 560
    encoder_conf: Dict[str, Any] = None
    predictor_conf: Dict[str, Any] = None
    length_normalized_loss: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        conf = dict(self.encoder_conf or {})
        conf.pop("pos_enc_class", None)
        conf.pop("selfattention_layer_type", None)
        conf.pop("positional_dropout_rate", None)
        sanm_shift = conf.pop("sanm_shfit", 0)
        self.encoder = SANMEncoder(
            input_size=self.input_size, sanm_shift=sanm_shift,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="encoder", **conf,
        )
        pred_conf = dict(self.predictor_conf or {})
        pred_conf.setdefault("idim", self.encoder.output_size)
        self.predictor = CifPredictorV3(
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="predictor", **pred_conf,
        )

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 deterministic: bool = False):
        """Training: MAE between the upsampled alpha mass and token count."""
        enc, enc_lens = self.encoder(speech, speech_lengths, deterministic)
        pred = self.predictor(enc, enc_lens, max_tokens=text.shape[1],
                              deterministic=deterministic)
        # pre-rescale upsample-head mass (token_num2): the rescaled
        # us_alphas sum to token_num identically -> zero gradient
        # (reference monotonic_aligner/model.py:105 trains
        # pre_token_length2)
        loss = losses.mae_length_loss(
            text_lengths, pred.token_num2,
            self.length_normalized_loss,
        )
        return loss, {"loss": loss, "loss_pre": loss}

    def align(self, speech, speech_lengths, token_num):
        """Forced alignment: rescale the upsampled alphas so they integrate
        to ``token_num`` and return the fire track.

        Returns (us_alphas (B, T*u), us_peaks (B, T*u) bool)."""
        enc, enc_lens = self.encoder(speech, speech_lengths, True)
        pred = self.predictor(enc, enc_lens, max_tokens=8,
                              deterministic=True)
        us_alphas = pred.us_alphas
        total = jnp.sum(us_alphas, axis=-1)
        # rescale slightly past the integer target so the final fire crosses
        # its boundary despite float rounding
        target = token_num.astype(jnp.float32) + 1e-3
        scale = target / jnp.maximum(total, 1e-6)
        us_alphas = us_alphas * scale[:, None]
        s, c = compensated_cumsum(us_alphas, axis=-1)
        S = s + c
        P = S - us_alphas
        # integer fire counts: a frame whose rescaled alpha crosses several
        # integer boundaries fires that many times (reference cif_wo_hidden
        # subtracts the threshold per fire, losing none)
        us_peaks = (jnp.floor(S) - jnp.floor(P)).astype(jnp.int32)
        return us_alphas, us_peaks
