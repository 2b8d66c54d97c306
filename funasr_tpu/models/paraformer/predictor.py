"""CIF predictor module (reference ``CifPredictorV2``, cif_predictor.py:173).

conv1d (k = l_order + r_order + 1) -> relu -> linear -> sigmoid -> alphas,
then the TPU-native interval-overlap CIF (funasr_tpu.ops.cif).

Static-shape contract: the caller supplies ``max_tokens`` (padded token
grid); real counts travel as the float ``token_num`` exactly like the
reference's predictor outputs.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.ops.cif import cif, cif_tail
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


class PredictorOutput(NamedTuple):
    acoustic_embeds: jnp.ndarray  # (B, U, D)
    token_num: jnp.ndarray  # (B,) float
    alphas: jnp.ndarray  # (B, T') per-frame weights (incl. tail frame)
    fires: jnp.ndarray  # (B, T') cif peak track
    peaks: jnp.ndarray  # (B, T') bool fire indicator


@tables.register("predictor_classes", "CifPredictorV2")
class CifPredictorV2(nn.Module):
    idim: int
    l_order: int = 1
    r_order: int = 1
    threshold: float = 1.0
    dropout: float = 0.1
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0
    tail_threshold: float = 0.45
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,  # (B, T, D) encoder output
        lengths: jnp.ndarray,  # (B,)
        max_tokens: int,
        target_length: Optional[jnp.ndarray] = None,  # (B,) float, training
        deterministic: bool = True,
    ) -> PredictorOutput:
        B, T, D = hidden.shape
        # alpha head runs in f32 (reference wraps it in autocast(False))
        h = hidden.astype(jnp.float32)
        kernel = self.param(
            "cif_conv1d",
            nn.initializers.lecun_normal(),
            (self.l_order + self.r_order + 1, D, D),
            self.param_dtype,
        )
        conv_bias = self.param("cif_conv1d_bias", nn.initializers.zeros, (D,),
                               self.param_dtype)
        q = lax.conv_general_dilated(
            h, kernel.astype(jnp.float32),
            window_strides=(1,), padding=[(self.l_order, self.r_order)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + conv_bias
        q = nn.relu(q)
        q = nn.Dropout(self.dropout)(q, deterministic=deterministic)
        out = nn.Dense(1, name="cif_output", dtype=jnp.float32,
                       param_dtype=self.param_dtype)(q)
        alphas = nn.sigmoid(out[..., 0])
        alphas = nn.relu(alphas * self.smooth_factor - self.noise_threshold)

        mask = sequence_mask(lengths, T, dtype=jnp.float32)
        alphas = alphas * mask
        # NOTE: hidden stays UNMASKED, exactly like the reference
        # (tail_process_fn receives the raw encoder output): pad frames have
        # zero alpha so zero interval width — except the tail frame at
        # position ``lengths``, whose 0.45 alpha integrates the real encoder
        # value there (reference cif_predictor.py:91-112 batch semantics).
        hidden_masked = h

        token_num = jnp.sum(alphas, axis=-1)
        if target_length is not None:
            # training: rescale alphas so they integrate to the target length
            scale = target_length.astype(jnp.float32) / jnp.maximum(token_num, 1e-6)
            alphas = alphas * scale[:, None]
            out = cif(hidden_masked, alphas, max_tokens)
            return PredictorOutput(
                out.embeds.astype(self.dtype), token_num, alphas, out.fires, out.peaks
            )

        if self.tail_threshold > 0.0:
            hidden_masked, alphas, tok_floor = cif_tail(
                hidden_masked, alphas, lengths, self.tail_threshold
            )
            token_num = tok_floor
        out = cif(hidden_masked, alphas, max_tokens)
        return PredictorOutput(
            out.embeds.astype(self.dtype), token_num, alphas, out.fires, out.peaks
        )
