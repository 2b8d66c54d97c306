"""MossFormer speech separation (reference funasr/models/mossformer/ —
gated single-head attention separation network over a learned conv
encoder, masking decoder, SI-SNR objective).

TPU shape: Conv1d encoder (kernel 16, stride 8) -> LN -> gated-attention
transformer blocks (joint local/global attention approximated by the
shared full-attention layer at these frame rates) -> per-speaker ReLU
masks -> transposed-conv overlap-add decoder.  Loss is permutation-
invariant negative SI-SNR with the permutations enumerated statically
(S = 2/3 on the published configs).
"""

from __future__ import annotations

import itertools
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.emotion2vec.model import TransformerLayer
from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.registry import tables

Dtype = Any


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


@tables.register("model_classes", "MossFormer")
class MossFormer(nn.Module):
    num_spks: int = 2
    enc_dim: int = 256
    kernel: int = 16
    stride: int = 8
    n_layers: int = 4
    n_heads: int = 4
    ffn: int = 1024
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mix: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        """(B, N) mixture -> (B, num_spks, N) separated estimates."""
        B, N = mix.shape
        x = mix[:, :, None].astype(self.dtype)
        feat = nn.Conv(self.enc_dim, (self.kernel,), strides=(self.stride,),
                       padding="SAME", name="encoder", dtype=self.dtype,
                       param_dtype=self.param_dtype)(x)
        feat = nn.relu(feat)  # (B, T, C)
        T = feat.shape[1]
        h = LayerNormF32(self.dtype, self.param_dtype, name="in_ln")(feat)
        Stack = nn.scan(
            TransformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.n_layers,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        h, _ = Stack(self.enc_dim, self.n_heads, self.ffn, 0.0, self.dtype,
                     self.param_dtype, name="blocks")(h, None, deterministic)
        masks = nn.Dense(self.enc_dim * self.num_spks, name="mask_head",
                         dtype=self.dtype, param_dtype=self.param_dtype)(h)
        masks = nn.relu(masks).reshape(B, T, self.num_spks, self.enc_dim)
        sep = feat[:, :, None, :] * masks  # (B, T, S, C)
        sep = jnp.moveaxis(sep, 2, 1).reshape(B * self.num_spks, T,
                                              self.enc_dim)
        out = nn.ConvTranspose(1, (self.kernel,), strides=(self.stride,),
                               padding="SAME", name="decoder",
                               dtype=self.dtype,
                               param_dtype=self.param_dtype)(sep)
        out = out[..., 0].reshape(B, self.num_spks, -1)
        # SAME transposed conv returns T*stride samples; trim/pad to N
        if out.shape[-1] >= N:
            out = out[..., :N]
        else:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, N - out.shape[-1])))
        return out

    def loss(self, params, mix, refs, rngs=None):
        est = self.apply(params, mix, rngs=rngs)
        return pit_si_snr_loss(est.astype(jnp.float32),
                               refs.astype(jnp.float32))
