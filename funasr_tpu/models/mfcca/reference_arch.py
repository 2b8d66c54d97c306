"""MFCCA reference architecture: multi-frame cross-channel attention
multi-channel ASR (reference funasr/models/mfcca/).

Layer (encoder_layer_mfcca.py:165 ``EncoderLayer``): a plain-MHA
CROSS-CHANNEL attention — queries are the C channel states of each frame,
keys/values the channels of frames t-2..t+2 (5 time-shifted copies) —
followed by a Conformer block (macaron optional, legacy rel-pos MHA, conv
module, FFN).  Encoder (mfcca_encoder.py:104): espnet Conv2dSubsampling
(x4, pos enc inside ``embed.out``), legacy rel-pos everywhere, then a
4-stage Conv2d CHANNEL-FUSION stack (8->16->32->16->1 over the (T, D)
plane) that collapses the (up to 8, repeated if fewer) channels into one
stream (mfcca_encoder.py:364-372).  e2e (e2e_asr_mfcca.py:41): hybrid
CTC/attention with a standard TransformerDecoder.

Published alimeeting MFCCA checkpoints bind through
convert.mfcca_from_torch; encoder-output parity vs the actual reference
torch modules is pinned in tests/test_mfcca_ref.py.

TPU notes: the 5-shift time window is a stack of rolled views (no
gather); channels fold into the batch axis everywhere except the two
channel-mixing sites, matching the reference's reshape dance; BatchNorm
runs on running stats at inference.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.losses import ctc_loss as ctc_loss_fn
from funasr_tpu.ops.masks import sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


def legacy_rel_pos(T: int, d: int, max_len: int = 5000) -> jnp.ndarray:
    """transformer/embedding.py:215 LegacyRelPositionalEncoding table.

    QUIRK reproduced exactly: the torch module builds the reversed grid
    ONCE at ``max_len`` (positions max_len-1 .. 0) and then slices the
    FIRST T rows — so the effective positions are max_len-1 ..
    max_len-T, not T-1 .. 0 (embedding.py:59 extend_pe never rebuilds
    for shorter inputs)."""
    max_len = max(max_len, T)
    pos = np.arange(max_len - 1, max_len - 1 - T, -1.0)[:, None]
    div = np.exp(np.arange(0, d, 2) * -(np.log(10000.0) / d))
    pe = np.zeros((T, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)


def _legacy_rel_shift(x):
    """attention.py:249 legacy rel_shift on (B, H, T1, T2)."""
    B, H, T1, T2 = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    xp = xp.reshape(B, H, T2 + 1, T1)
    return xp[:, :, 1:, :].reshape(B, H, T1, T2)


class PlainMHA(nn.Module):
    """transformer/attention.py:24 MultiHeadedAttention (fp32 softmax,
    min-value mask fill + post-softmax zero)."""

    n_head: int
    n_feat: int

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask):
        B, T1, _ = q_in.shape
        T2 = k_in.shape[1]
        H, d_k = self.n_head, self.n_feat // self.n_head
        q = nn.Dense(self.n_feat, name="linear_q")(q_in)
        k = nn.Dense(self.n_feat, name="linear_k")(k_in)
        v = nn.Dense(self.n_feat, name="linear_v")(v_in)
        q = q.reshape(B, T1, H, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(B, T2, H, d_k).transpose(0, 2, 3, 1)
        v = v.reshape(B, T2, H, d_k).transpose(0, 2, 1, 3)
        scores = jnp.matmul(q, k) / np.sqrt(d_k)
        if mask is not None:
            bad = mask[:, None] == 0  # (B, 1, *, T2)
            scores = jnp.where(bad, jnp.finfo(jnp.float32).min, scores)
            att = jax.nn.softmax(scores.astype(jnp.float32), -1)
            att = jnp.where(bad, 0.0, att)
        else:
            att = jax.nn.softmax(scores.astype(jnp.float32), -1)
        ctx = jnp.matmul(att.astype(v.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T1, self.n_feat)
        return nn.Dense(self.n_feat, name="linear_out")(ctx)


class LegacyRelPosMHA(nn.Module):
    """attention.py:221 LegacyRelPositionMultiHeadedAttention."""

    n_head: int
    n_feat: int

    @nn.compact
    def __call__(self, x, pos_emb, mask):
        B, T, _ = x.shape
        H, d_k = self.n_head, self.n_feat // self.n_head
        q = nn.Dense(self.n_feat, name="linear_q")(x)
        k = nn.Dense(self.n_feat, name="linear_k")(x)
        v = nn.Dense(self.n_feat, name="linear_v")(x)
        p = nn.Dense(self.n_feat, use_bias=False, name="linear_pos")(
            pos_emb)
        bu = self.param("pos_bias_u", nn.initializers.xavier_uniform(),
                        (H, d_k))
        bv = self.param("pos_bias_v", nn.initializers.xavier_uniform(),
                        (H, d_k))
        q = q.reshape(B, T, H, d_k)
        k = k.reshape(B, T, H, d_k).transpose(0, 2, 3, 1)
        v = v.reshape(B, T, H, d_k).transpose(0, 2, 1, 3)
        p = p.reshape(-1, H, d_k)
        ac = jnp.matmul((q + bu).transpose(0, 2, 1, 3),
                        k)  # (B, H, T, T)
        bd = jnp.einsum("bthd,lhd->bhtl", q + bv, p)
        bd = _legacy_rel_shift(bd)
        scores = (ac + bd) / np.sqrt(d_k)
        if mask is not None:
            bad = mask[:, None] == 0
            scores = jnp.where(bad, jnp.finfo(jnp.float32).min, scores)
            att = jax.nn.softmax(scores.astype(jnp.float32), -1)
            att = jnp.where(bad, 0.0, att)
        else:
            att = jax.nn.softmax(scores.astype(jnp.float32), -1)
        ctx = jnp.matmul(att.astype(v.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, self.n_feat)
        return nn.Dense(self.n_feat, name="linear_out")(ctx)


class MfccaConvModule(nn.Module):
    """mfcca_encoder.py:40 ConvolutionModule (bias, BatchNorm, swish)."""

    channels: int
    kernel_size: int = 15

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(2 * self.channels, name="pointwise_conv1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        pad = (self.kernel_size - 1) // 2
        kernel = self.param("depthwise_conv",
                            nn.initializers.lecun_normal(),
                            (self.kernel_size, 1, self.channels))
        dw_bias = self.param("depthwise_conv_bias", nn.initializers.zeros,
                             (self.channels,))
        from funasr_tpu.ops.dwconv import depthwise_conv1d

        h = depthwise_conv1d(h, kernel, pad, pad) + dw_bias
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         name="norm", dtype=jnp.float32)(h)
        h = h * nn.sigmoid(h)  # swish
        return nn.Dense(self.channels, name="pointwise_conv2")(h)


class MfccaEncoderLayer(nn.Module):
    """encoder_layer_mfcca.py:165: cross-channel MHA + Conformer block."""

    size: int
    n_head: int
    linear_units: int
    cnn_kernel: int = 15
    macaron: bool = False
    use_cnn: bool = True

    @nn.compact
    def __call__(self, x, pos_emb, mask, channel_size: int):
        BC, T, D = x.shape
        B = BC // channel_size
        C = channel_size
        # ---- cross-channel attention (queries: the C channel states of
        # each frame; keys/values: channels of frames t-2..t+2)
        res = x
        h = nn.LayerNorm(epsilon=1e-12, name="norm_mha_cc")(x)
        xn = h.reshape(B, C, T, D).transpose(0, 2, 1, 3)  # (B, T, C, D)
        xp = jnp.pad(xn, ((0, 0), (2, 2), (0, 0), (0, 0)))
        kv = jnp.concatenate([xp[:, j : j + T] for j in range(5)],
                             axis=2)  # (B, T, 5C, D)
        q = xn.reshape(B * T, C, D)
        kv = kv.reshape(B * T, 5 * C, D)
        att = PlainMHA(self.n_head, self.size, name="cc_attn")(q, kv, kv,
                                                               None)
        att = (att.reshape(B, T, C, D).transpose(0, 2, 1, 3)
               .reshape(BC, T, D))
        x = res + att
        # ---- Conformer block (Encoder_Conformer_Layer, cca_pos=0)
        if self.macaron:
            res = x
            h = nn.LayerNorm(epsilon=1e-12, name="norm_ff_macaron")(x)
            h = nn.Dense(self.linear_units, name="ff_macaron_w1")(h)
            h = h * nn.sigmoid(h)
            h = nn.Dense(self.size, name="ff_macaron_w2")(h)
            x = res + 0.5 * h
            ff_scale = 0.5
        else:
            ff_scale = 1.0
        res = x
        h = nn.LayerNorm(epsilon=1e-12, name="norm_mha")(x)
        h = LegacyRelPosMHA(self.n_head, self.size, name="self_attn")(
            h, pos_emb, mask)
        x = res + h
        if self.use_cnn:
            res = x
            h = nn.LayerNorm(epsilon=1e-12, name="norm_conv")(x)
            x = res + MfccaConvModule(self.size, self.cnn_kernel,
                                      name="conv_module")(h)
        res = x
        h = nn.LayerNorm(epsilon=1e-12, name="norm_ff")(x)
        h = nn.Dense(self.linear_units, name="ff_w1")(h)
        h = h * nn.sigmoid(h)  # swish
        h = nn.Dense(self.size, name="ff_w2")(h)
        x = res + ff_scale * h
        if self.use_cnn:
            x = nn.LayerNorm(epsilon=1e-12, name="norm_final")(x)
        return x


class MFCCAEncoder(nn.Module):
    """mfcca_encoder.py:104 (input_layer='conv2d', legacy rel pos)."""

    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 12
    cnn_module_kernel: int = 15
    macaron_style: bool = False
    use_cnn_module: bool = True

    @nn.compact
    def __call__(self, xs, ilens, channel_size: int):
        # espnet Conv2dSubsampling x4 (subsampling.py:49) + x*sqrt(d) +
        # legacy pos table
        h = xs[..., None]
        h = nn.Conv(self.output_size, (3, 3), strides=(2, 2),
                    padding="VALID", name="embed_conv0")(h)
        h = nn.relu(h)
        h = nn.Conv(self.output_size, (3, 3), strides=(2, 2),
                    padding="VALID", name="embed_conv1")(h)
        h = nn.relu(h)
        b2, t2, f2, c2 = h.shape
        x = nn.Dense(self.output_size, name="embed_out")(
            h.transpose(0, 1, 3, 2).reshape(b2, t2, c2 * f2))
        x = x * (self.output_size ** 0.5)
        pos_emb = legacy_rel_pos(t2, self.output_size)[None]
        # mask [:, :-2:2][:, :-2:2]
        olens = ((ilens - 1) // 2 - 1) // 2
        olens = jnp.minimum(jnp.maximum(olens, 0), t2)
        mask = sequence_mask(olens, t2, jnp.float32)[:, None, :]  # (BC,1,T)
        for i in range(self.num_blocks):
            x = MfccaEncoderLayer(
                self.output_size, self.attention_heads, self.linear_units,
                self.cnn_module_kernel, self.macaron_style,
                self.use_cnn_module, name=f"layer_{i}")(
                x, pos_emb, mask, channel_size)
        # ---- channel fusion convs (8 -> 16 -> 32 -> 16 -> 1 over (T, D))
        BC, T, D = x.shape
        B = BC // channel_size
        xc = x.reshape(B, channel_size, T, D)
        if channel_size < 8:
            rep = -(-8 // channel_size)
            xc = jnp.tile(xc, (1, rep, 1, 1))[:, :8]
        xc = xc.transpose(0, 2, 3, 1)  # NHWC: (B, T, D, 8)
        for name, cin, cout in (("conv1", 8, 16), ("conv2", 16, 32),
                                ("conv3", 32, 16), ("conv4", 16, 1)):
            xc = nn.Conv(cout, (5, 7), strides=(1, 1),
                         padding=((2, 2), (3, 3)), name=name)(xc)
        x = xc[..., 0]  # (B, T, D)
        x = nn.LayerNorm(epsilon=1e-12, name="after_norm")(x)
        olens1 = olens.reshape(B, channel_size)[:, 0]
        return x, olens1


@tables.register("model_classes", "MFCCA")
class MFCCAModel(nn.Module):
    """e2e_asr_mfcca.py:41: MFCCA encoder + standard TransformerDecoder +
    CTC hybrid.  ``speech`` arrives channel-flattened (B*C, T, F) with a
    static ``channel_size`` (the reference's _extract_feats does the same
    flatten; train-time random channel dropout lives in the recipe)."""

    vocab_size: int
    input_size: int
    encoder_conf: Optional[Dict] = None
    decoder_conf: Optional[Dict] = None
    ctc_weight: float = 0.5
    sos: int = 1
    eos: int = 2
    blank_id: int = 0
    ignore_id: int = -1

    def setup(self):
        self.encoder = MFCCAEncoder(input_size=self.input_size,
                                    name="encoder",
                                    **(self.encoder_conf or {}))
        from funasr_tpu.models.transformer.decoder import \
            TransformerDecoder

        d = (self.encoder_conf or {}).get("output_size", 256)
        self.decoder = TransformerDecoder(
            vocab_size=self.vocab_size, encoder_output_size=d,
            name="decoder", **(self.decoder_conf or {}))
        self.ctc_lo = nn.Dense(self.vocab_size, name="ctc_lo")

    def encode(self, speech, speech_lengths, channel_size: int):
        return self.encoder(speech, speech_lengths, channel_size)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 channel_size: int = 1, deterministic: bool = True):
        enc, enc_lens = self.encode(speech, speech_lengths, channel_size)
        B, U = text.shape
        ys_in = jnp.concatenate(
            [jnp.full((B, 1), self.sos, text.dtype),
             jnp.where(text == self.ignore_id, self.eos, text)], axis=1)
        ys_out = jnp.concatenate(
            [text, jnp.full((B, 1), self.ignore_id, text.dtype)], axis=1)
        put_eos = (jnp.arange(U + 1)[None, :] == text_lengths[:, None])
        ys_out = jnp.where(put_eos, self.eos, ys_out)
        logits = self.decoder(enc, enc_lens, ys_in, text_lengths + 1,
                              deterministic)
        valid = (jnp.arange(U + 1)[None, :]
                 < (text_lengths + 1)[:, None]).astype(jnp.float32)
        tgt = jnp.where(ys_out == self.ignore_id, 0, ys_out)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        loss_att = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        loss_ctc = ctc_loss_fn(self.ctc_lo(enc).astype(jnp.float32),
                               enc_lens, text, text_lengths,
                               blank_id=self.blank_id)
        loss = (self.ctc_weight * loss_ctc
                + (1.0 - self.ctc_weight) * loss_att)
        return loss, {"loss_att": loss_att, "loss_ctc": loss_ctc}
