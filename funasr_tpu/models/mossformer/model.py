"""MossFormer speech separation (reference funasr/models/mossformer/).

The real reference architecture (mossformer.py:155 ``FLASH_ShareA_FFConvM``):
a learned conv encoder over the raw mixture, a mask net of gated
single-head FLASH blocks — each with joint **quadratic local** (relu²
scores within groups of ``group_size`` frames) and **linear global**
(kᵀv summarised over the whole sequence) attention branches, shared-A
gating ``(att_u·v)·σ(att_v·u)``, token shift, partial rotary embeddings,
and FFConvM projections (ScaleNorm→Linear→SiLU→residual depthwise conv) —
then per-speaker tanh·σ gated 1x1 heads and a transposed-conv overlap-add
decoder (e2e_ss.py:74).  Loss is permutation-invariant negative SI-SNR.

TPU design: everything is batched matmuls over static shapes — the group
split is a reshape (T padded to a multiple of group_size), the quadratic
branch is a (G, n, n) einsum on the MXU, the linear branch two (d, e)
contractions; depth runs under ``nn.scan`` (stacked params, one compiled
layer body); the overlap-add decoder is an explicit (T, K) matmul +
strided add (exact torch ConvTranspose1d semantics without relying on
``lax.conv_transpose`` layout).
"""

from __future__ import annotations

import itertools
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.registry import tables

Dtype = Any


# --------------------------------------------------------------------- loss

def si_snr(est: jnp.ndarray, ref: jnp.ndarray, eps: float = 1e-8
           ) -> jnp.ndarray:
    """Scale-invariant SNR in dB over the last axis."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True) + eps
    proj = dot / energy * ref
    noise = est - proj
    ratio = (jnp.sum(proj ** 2, -1) + eps) / (jnp.sum(noise ** 2, -1) + eps)
    return 10.0 * jnp.log10(ratio)


def pit_si_snr_loss(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """est/ref: (B, S, N) -> scalar mean negative SI-SNR under the best
    speaker permutation (static S! enumeration)."""
    S = est.shape[1]
    perms = list(itertools.permutations(range(S)))

    def perm_snr(perm):
        return jnp.mean(si_snr(est[:, list(perm)], ref), axis=-1)  # (B,)

    snrs = jnp.stack([perm_snr(p) for p in perms])  # (S!, B)
    return -jnp.mean(jnp.max(snrs, axis=0))


# ------------------------------------------------------------------ modules

class ScaleNorm(nn.Module):
    """x / (|x| · d^-1/2).clamp(eps) * g  (transformer/layer_norm.py:157)."""

    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (1,), self.param_dtype)
        scale = x.shape[-1] ** -0.5
        norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                               keepdims=True) * scale
        return (x / jnp.maximum(norm, self.eps).astype(x.dtype)) * g


class GlobalChannelNorm(nn.Module):
    """torch ``nn.GroupNorm(1, C)`` on (B, C, L): one mean/var per sample
    over ALL channels and frames, per-channel affine.  Input here is
    (B, T, C)."""

    eps: float = 1e-8
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


def _rotate_half(x):
    """Interleaved-pair rotation (lucidrains rotary_embedding_torch):
    (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x = x.reshape(x.shape[:-1] + (-1, 2))
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape[:-2] + (-1,))


def apply_partial_rotary(t: jnp.ndarray, rot_dim: int,
                         theta: float = 10000.0) -> jnp.ndarray:
    """GPT-J partial rotary on the first ``rot_dim`` dims of (..., T, D),
    positions along axis -2 (mossformer_encoder.py:58: RotaryEmbedding(
    dim=min(32, query_key_dim)))."""
    T = t.shape[-2]
    inv = 1.0 / (theta ** (np.arange(0, rot_dim, 2) / rot_dim))
    freqs = jnp.asarray(np.arange(T)[:, None] * inv[None, :],
                        jnp.float32)                       # (T, rot/2)
    freqs = jnp.repeat(freqs, 2, axis=-1)                  # (T, rot)
    head, rest = t[..., :rot_dim], t[..., rot_dim:]
    headf = head.astype(jnp.float32)
    head = headf * jnp.cos(freqs) + _rotate_half(headf) * jnp.sin(freqs)
    return jnp.concatenate([head.astype(t.dtype), rest], axis=-1)


class FFConvM(nn.Module):
    """ScaleNorm -> Linear -> SiLU -> residual depthwise conv (k=17)
    (mossformer.py:136; ConvModule:87 is ``x + depthwise(x)``)."""

    dim_out: int
    kernel: int = 17
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = ScaleNorm(param_dtype=self.param_dtype, name="norm")(x)
        h = nn.Dense(self.dim_out, name="proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.silu(h)
        from funasr_tpu.ops.dwconv import GroupedConv1d

        conv = GroupedConv1d(self.dim_out, self.kernel, padding="SAME",
                             feature_group_count=self.dim_out,
                             use_bias=False, name="conv", dtype=self.dtype,
                             param_dtype=self.param_dtype)(h)
        h = h + conv
        return nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)


class FLASHLayer(nn.Module):
    """FLASH_ShareA_FFConvM (mossformer.py:155): token shift, shared-A
    quad(local)+linear(global) attention, ``(att_u·v)·σ(att_v·u)`` gate."""

    dim: int
    group_size: int = 256
    query_key_dim: int = 128
    expansion_factor: float = 4.0
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, n_valid=None, deterministic: bool = True):
        B, T, D = x.shape
        g = self.group_size
        hidden = int(self.dim * self.expansion_factor)

        # token shift: first half channels delayed one frame
        half = D // 2
        shifted = jnp.pad(x[:, :, :half], ((0, 0), (1, 0), (0, 0)))[:, :T]
        normed = jnp.concatenate([shifted, x[:, :, half:]], axis=-1)

        vu = FFConvM(hidden, dropout_rate=self.dropout_rate,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="to_hidden")(normed, deterministic)
        v, u = jnp.split(vu, 2, axis=-1)                    # (B, T, h/2)
        qk = FFConvM(self.query_key_dim, dropout_rate=self.dropout_rate,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="to_qk")(normed, deterministic)

        gamma = self.param("gamma", nn.initializers.normal(0.02),
                           (4, self.query_key_dim), self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros,
                          (4, self.query_key_dim), self.param_dtype)
        offs = qk[:, :, None, :] * gamma + beta             # (B, T, 4, d)
        quad_q, lin_q, quad_k, lin_k = [offs[:, :, i] for i in range(4)]

        rot = min(32, self.query_key_dim)
        quad_q, lin_q, quad_k, lin_k = (
            apply_partial_rotary(t, rot) for t in (quad_q, lin_q,
                                                   quad_k, lin_k))

        # pad to group multiple (static)
        pad = (-T) % g
        if pad:
            pads = ((0, 0), (0, pad), (0, 0))
            quad_q, quad_k, lin_q, lin_k, v_p, u_p = (
                jnp.pad(t, pads) for t in (quad_q, quad_k, lin_q, lin_k,
                                           v, u))
        else:
            v_p, u_p = v, u
        Tp = T + pad
        G = Tp // g

        def grp(t):
            return t.reshape(B, G, g, -1)

        qq, qk_, lq, lk = map(grp, (quad_q, quad_k, lin_q, lin_k))
        vg, ug = grp(v_p), grp(u_p)

        # quadratic (local) branch: relu^2 scores within each group
        sim = jnp.einsum("bgid,bgjd->bgij", qq, qk_) / g
        attn = jnp.square(nn.relu(sim))
        attn = nn.Dropout(self.dropout_rate)(attn,
                                             deterministic=deterministic)
        quad_v = jnp.einsum("bgij,bgjd->bgid", attn, vg)
        quad_u = jnp.einsum("bgij,bgjd->bgid", attn, ug)

        # linear (global) branch, non-causal: one (d, e) summary over the
        # whole sequence (reference divides by the unpadded length n)
        lin_kv = jnp.einsum("bgnd,bgne->bde", lk, vg) / T
        lin_ku = jnp.einsum("bgnd,bgne->bde", lk, ug) / T
        lin_v = jnp.einsum("bgnd,bde->bgne", lq, lin_kv)
        lin_u = jnp.einsum("bgnd,bde->bgne", lq, lin_ku)

        att_v = (quad_v + lin_v).reshape(B, Tp, -1)[:, :T]
        att_u = (quad_u + lin_u).reshape(B, Tp, -1)[:, :T]

        out = (att_u * v) * nn.sigmoid(att_v * u)           # (B, T, h/2)
        return x + FFConvM(self.dim, dropout_rate=self.dropout_rate,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="to_out")(out, deterministic)


class _ScanFLASH(nn.Module):
    """One scanned FLASH step (params stacked over depth)."""

    dim: int
    group_size: int
    query_key_dim: int
    expansion_factor: float
    dropout_rate: float
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, x, deterministic):
        y = FLASHLayer(self.dim, self.group_size, self.query_key_dim,
                       self.expansion_factor, self.dropout_rate,
                       self.dtype, self.param_dtype, name="flash")(
            x, deterministic=deterministic)
        return y, None


class MossFormerM(nn.Module):
    """MossformerBlock stack + final LayerNorm(eps=1e-6)
    (mossformer_encoder.py:296 ``MossFormerM``)."""

    dim: int
    depth: int
    group_size: int = 256
    query_key_dim: int = 128
    expansion_factor: float = 4.0
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        Stack = nn.scan(
            _ScanFLASH,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.depth,
            in_axes=(nn.broadcast,),
        )
        x, _ = Stack(self.dim, self.group_size, self.query_key_dim,
                     self.expansion_factor, self.dropout_rate, self.dtype,
                     self.param_dtype, name="layers")(x, deterministic)
        return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                            param_dtype=self.param_dtype, name="norm")(
            x.astype(jnp.float32)).astype(x.dtype)


class MaskNet(nn.Module):
    """MossFormer_MaskNet (mossformer_encoder.py:84): norm -> 1x1 encode ->
    scaled-sinu pos -> Computation_Block (FLASH stack, GroupNorm, skip) ->
    PReLU -> per-speaker gated 1x1 heads -> masks."""

    in_channels: int
    out_channels: int
    num_blocks: int = 24
    num_spks: int = 2
    group_size: int = 256
    query_key_dim: int = 128
    expansion_factor: float = 4.0
    skip_around_intra: bool = True
    use_global_pos_enc: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """(B, T, in_channels) encoder features -> (B, S, T, in_channels)
        masks (pre-ReLU semantics of the reference: ReLU applied here)."""
        B, T, _ = x.shape
        h = GlobalChannelNorm(param_dtype=self.param_dtype, name="norm")(x)
        h = nn.Dense(self.out_channels, use_bias=False,
                     name="conv1d_encoder", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        if self.use_global_pos_enc:
            scale = self.param("pos_scale", nn.initializers.ones, (1,),
                               self.param_dtype)
            C = self.out_channels
            inv = 1.0 / (10000 ** (np.arange(0, C, 2) / C))
            sinu = jnp.asarray(np.arange(T)[:, None] * inv[None, :],
                               jnp.float32)
            emb = jnp.concatenate([jnp.sin(sinu), jnp.cos(sinu)], axis=-1)
            h = h + (emb * scale).astype(h.dtype)

        intra = MossFormerM(self.out_channels, self.num_blocks,
                            self.group_size, self.query_key_dim,
                            self.expansion_factor, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="mdl")(
            h, deterministic)
        intra = GlobalChannelNorm(param_dtype=self.param_dtype,
                                  name="intra_norm")(intra)
        if self.skip_around_intra:
            intra = intra + h

        alpha = self.param("prelu", nn.initializers.constant(0.25), (1,),
                           self.param_dtype)
        h = jnp.where(intra >= 0, intra, alpha.astype(intra.dtype) * intra)

        h = nn.Dense(self.out_channels * self.num_spks, name="conv1d_out",
                     dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = h.reshape(B, T, self.num_spks, self.out_channels)
        h = jnp.moveaxis(h, 2, 1)                     # (B, S, T, C)
        gate_in = h.reshape(B * self.num_spks, T, self.out_channels)
        out = jnp.tanh(nn.Dense(self.out_channels, name="output",
                                dtype=self.dtype,
                                param_dtype=self.param_dtype)(gate_in))
        gate = nn.sigmoid(nn.Dense(self.out_channels, name="output_gate",
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype)(gate_in))
        h = out * gate
        h = nn.Dense(self.in_channels, use_bias=False, name="conv1_decoder",
                     dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = nn.relu(h)
        return h.reshape(B, self.num_spks, T, self.in_channels)


@tables.register("model_classes", "MossFormer")
class MossFormer(nn.Module):
    """End-to-end separation (e2e_ss.py:11): conv encoder -> MaskNet ->
    per-speaker masking -> transposed-conv overlap-add decoder."""

    num_spks: int = 2
    in_channels: int = 512
    out_channels: int = 512
    num_blocks: int = 24
    kernel_size: int = 16
    group_size: int = 256
    query_key_dim: int = 128
    expansion_factor: float = 4.0
    skip_around_intra: bool = True
    use_global_pos_enc: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mix: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        """(B, N) mixture -> (B, num_spks, N) separated estimates."""
        B, N = mix.shape
        k, s = self.kernel_size, self.kernel_size // 2
        x = mix[:, :, None].astype(self.dtype)
        feat = nn.Conv(self.in_channels, (k,), strides=(s,),
                       padding="VALID", use_bias=False, name="enc",
                       dtype=self.dtype, param_dtype=self.param_dtype)(x)
        feat = nn.relu(feat)                              # (B, T, C)
        T = feat.shape[1]

        masks = MaskNet(self.in_channels, self.out_channels,
                        self.num_blocks, self.num_spks, self.group_size,
                        self.query_key_dim, self.expansion_factor,
                        self.skip_around_intra, self.use_global_pos_enc,
                        self.dtype, self.param_dtype, name="mask_net")(
            feat, deterministic)                          # (B, S, T, C)

        sep = feat[:, None] * masks                       # (B, S, T, C)
        sep = sep.reshape(B * self.num_spks, T, self.in_channels)

        # transposed conv as explicit matmul + overlap-add (exact torch
        # ConvTranspose1d(bias=False) semantics; kernel (C, K))
        dec_w = self.param("dec_kernel", nn.initializers.lecun_normal(),
                           (self.in_channels, k), self.param_dtype)
        y = jnp.einsum("btc,ck->btk", sep, dec_w.astype(sep.dtype))
        n_out = (T - 1) * s + k
        out = jnp.zeros((B * self.num_spks, n_out), y.dtype)
        for j in range(k // s):                           # k = 2s blocks
            block = y[:, :, j * s:(j + 1) * s].reshape(B * self.num_spks,
                                                       T * s)
            out = out.at[:, j * s: j * s + T * s].add(block)

        out = out.reshape(B, self.num_spks, n_out)
        if n_out >= N:
            out = out[..., :N]
        else:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, N - n_out)))
        return out

    def loss(self, params, mix, refs, rngs=None):
        est = self.apply(params, mix, rngs=rngs,
                         deterministic=rngs is None)
        return pit_si_snr_loss(est.astype(jnp.float32),
                               refs.astype(jnp.float32))
