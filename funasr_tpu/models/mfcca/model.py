"""MFCCA: multi-frame cross-channel attention multichannel ASR (reference
funasr/models/mfcca/ — channel fusion by attention across microphones with
multi-frame context, then a standard conformer ASR stack).

Input is (B, C, T, F) multichannel fbank.  Cross-channel attention runs
per frame over the channel axis with a +-1 frame context window (the
"multi-frame" part), then channels are mean-fused and the result feeds the
Conformer hybrid CTC/attention body.  The channel axis is small and
static, so the attention is a (B*T, C, C) batched matmul — MXU-friendly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.conformer import ConformerEncoder
from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.models.transformer.model import _HybridModel
from funasr_tpu.registry import tables

Dtype = Any


class CrossChannelLayer(nn.Module):
    dim: int
    n_head: int = 4
    context: int = 1  # frames of context on each side
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, C, T, D) -> (B, C, T, D): attention over channels, keys built
        from a (2*context+1)-frame window."""
        B, C, T, D = x.shape
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm")(x)
        # multi-frame key/value: concat neighboring frames with ZERO
        # padding at sequence boundaries (jnp.roll would wrap frame 0's
        # "previous frame" to T-1, leaking pad/tail content)
        def shift(arr, s):
            if s == 0:
                return arr
            pad = jnp.zeros_like(arr[:, :, :abs(s)])
            if s > 0:  # context from the past: out[t] = arr[t - s]
                return jnp.concatenate([pad, arr[:, :, :-s]], axis=2)
            return jnp.concatenate([arr[:, :, -s:], pad], axis=2)

        ctxs = [shift(h, s) for s in range(-self.context, self.context + 1)]
        kv = jnp.concatenate(ctxs, axis=-1)  # (B, C, T, D*(2c+1))
        q = nn.Dense(self.dim, name="q", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        k = nn.Dense(self.dim, name="k", dtype=self.dtype,
                     param_dtype=self.param_dtype)(kv)
        v = nn.Dense(self.dim, name="v", dtype=self.dtype,
                     param_dtype=self.param_dtype)(kv)
        d_k = self.dim // self.n_head
        # (B, T, H, C, dk) attention over the channel axis
        qh = q.transpose(0, 2, 1, 3).reshape(B, T, C, self.n_head, d_k)
        kh = k.transpose(0, 2, 1, 3).reshape(B, T, C, self.n_head, d_k)
        vh = v.transpose(0, 2, 1, 3).reshape(B, T, C, self.n_head, d_k)
        scores = jnp.einsum("btchd,btkhd->bthck", qh, kh) * (d_k ** -0.5)
        attn = nn.softmax(scores.astype(jnp.float32), -1).astype(vh.dtype)
        out = jnp.einsum("bthck,btkhd->btchd", attn, vh)
        out = out.reshape(B, T, C, self.dim).transpose(0, 2, 1, 3)
        out = nn.Dense(D, name="out", dtype=self.dtype,
                       param_dtype=self.param_dtype)(out)
        return res + out


class MFCCAEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    channel_dim: int = 128
    channel_layers: int = 2
    channel_heads: int = 4
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, lengths, deterministic: bool = True):
        """xs: (B, C, T, F) multichannel features."""
        h = nn.Dense(self.channel_dim, name="ch_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(xs.astype(self.dtype))
        for i in range(self.channel_layers):
            h = CrossChannelLayer(self.channel_dim, self.channel_heads,
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name=f"cc{i}")(h)
        fused = jnp.mean(h, axis=1)  # (B, T, channel_dim)
        enc = ConformerEncoder(
            input_size=self.channel_dim, output_size=self.output_size,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units, num_blocks=self.num_blocks,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conformer")
        return enc(fused, lengths, deterministic)

    # _HybridModel reads encoder.output_size


@tables.register("model_classes", "MFCCALite")
class MFCCA(_HybridModel):
    """Multichannel hybrid CTC/attention model; ``speech`` is
    (B, C, T, F)."""

    def make_encoder(self):
        conf = dict(self.encoder_conf or {})
        return MFCCAEncoder(input_size=self.input_size, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="encoder",
                            **conf)
