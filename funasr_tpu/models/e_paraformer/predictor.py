"""PIF predictor — parallel integrate-and-fire (reference
funasr/models/e_paraformer/pif_predictor.py:18 ``PifPredictor``,
E-Paraformer, Interspeech 2024).

Instead of the sequential CIF fire/scatter, PIF builds a *soft Gaussian
attention* from the token grid onto the cumulative-alpha alignment:

    scores[b, h, u, t] = -((u + 0.5 - cumsum(alpha)[b, t]) * sigma[h])^2 + bias[h]
    embeds = softmax_t(scores) @ hidden_heads

which is exactly one batched matmul + softmax — the natively parallel,
MXU-shaped formulation of integrate-and-fire (no scatter, no scan).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.models.paraformer.predictor import PredictorOutput
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any

NEG_INF = -1e30


@tables.register("predictor_classes", "PifPredictor")
class PifPredictor(nn.Module):
    idim: int
    l_order: int = 1
    r_order: int = 1
    threshold: float = 1.0
    dropout: float = 0.1
    smooth_factor: float = 1.0
    noise_threshold: float = 0.0
    sigma: float = 0.5
    bias: float = 0.0
    sigma_heads: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,  # (B, T, D)
        lengths: jnp.ndarray,  # (B,)
        max_tokens: int,
        target_length: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> PredictorOutput:
        B, T, D = hidden.shape
        h = hidden.astype(jnp.float32)
        # depthwise conv alpha head with residual (pif_predictor.py:62-69)
        kernel = self.param(
            "cif_conv1d", nn.initializers.lecun_normal(),
            (self.l_order + self.r_order + 1, 1, D), self.param_dtype)
        conv_bias = self.param("cif_conv1d_bias", nn.initializers.zeros,
                               (D,), self.param_dtype)
        from funasr_tpu.ops.dwconv import depthwise_conv1d

        q = depthwise_conv1d(h.astype(jnp.float32), kernel,
                             self.l_order, self.r_order) + conv_bias
        q = q + h  # residual
        q = nn.Dropout(self.dropout)(q, deterministic=deterministic)
        q = nn.relu(q)
        out = nn.Dense(1, name="cif_output", dtype=jnp.float32,
                       param_dtype=self.param_dtype)(q)
        alphas = nn.sigmoid(out[..., 0])
        alphas = nn.relu(alphas * self.smooth_factor - self.noise_threshold)
        mask = sequence_mask(lengths, T, dtype=jnp.float32)
        alphas = alphas * mask

        token_num = jnp.sum(alphas, axis=-1)  # pre-normalization (MAE loss)
        if target_length is not None:
            tgt = target_length.astype(jnp.float32)
        else:
            tgt = jnp.round(token_num)
        alphas = alphas * (tgt / jnp.maximum(token_num, 1e-6))[:, None]

        alignment = jnp.cumsum(alphas, axis=-1)  # (B, T)
        fire_pos = jnp.arange(max_tokens, dtype=jnp.float32) + 0.5  # (U,)
        sigma = self.param("sigma",
                           nn.initializers.constant(self.sigma),
                           (self.sigma_heads,), jnp.float32)
        bias = self.param("bias", nn.initializers.constant(self.bias),
                          (self.sigma_heads,), jnp.float32)
        # (B, H, U, T)
        diff = fire_pos[None, None, :, None] - alignment[:, None, None, :]
        scores = -(diff * sigma[None, :, None, None]) ** 2 \
            + bias[None, :, None, None]
        scores = jnp.where(mask[:, None, None, :] > 0, scores, NEG_INF)
        weights = nn.softmax(scores, axis=-1)
        H = self.sigma_heads
        nh = h.reshape(B, T, H, D // H)
        embeds = jnp.einsum("bhut,bthd->buhd", weights, nh).reshape(
            B, max_tokens, D)
        # zero out the grid beyond the (rounded) token count
        u_valid = (jnp.arange(max_tokens)[None, :]
                   < jnp.ceil(tgt)[:, None]).astype(jnp.float32)
        embeds = embeds * u_valid[:, :, None]

        zeros = jnp.zeros_like(alphas)
        return PredictorOutput(embeds.astype(self.dtype), token_num,
                               alphas, zeros, zeros > 0)
