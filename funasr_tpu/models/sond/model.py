"""SOND: speaker overlap-aware neural diarization (reference
funasr/models/sond/ — profile-conditioned diarization: given enrolled
speaker profiles, predict each profile's frame-level activity, overlap
allowed).

Unlike EEND (profile-free, PIT-trained), SOND scores frames against the
given profile matrix, so no permutation search is needed: the encoder
frame states are compared with projected profiles (scaled dot product +
a small joint refinement stack), then per-(frame, profile) sigmoid
activity.  BCE training; segment extraction on host.
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.emotion2vec.model import TransformerLayer
from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.ops.masks import key_mask, sequence_mask
from funasr_tpu.registry import tables

Dtype = Any


class SONDNet(nn.Module):
    feat_dim: int = 80
    n_units: int = 256
    n_heads: int = 4
    n_layers: int = 4
    ffn: int = 1024
    spk_dim: int = 192
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, lengths, profiles, profile_lens,
                 deterministic: bool = True):
        """feats (B, T, F), profiles (B, S, spk_dim) -> (B, T, S) logits."""
        B, T, _ = feats.shape
        S = profiles.shape[1]
        x = nn.Dense(self.n_units, name="in_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(feats.astype(self.dtype))
        mask = key_mask(lengths, T, dtype=jnp.float32)
        Stack = nn.scan(
            TransformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.n_layers,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(self.n_units, self.n_heads, self.ffn, 0.0, self.dtype,
                     self.param_dtype, name="blocks")(x, mask, deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="ln")(x)
        prof = nn.Dense(self.n_units, name="profile_proj", dtype=self.dtype,
                        param_dtype=self.param_dtype)(
            profiles.astype(self.dtype))
        # speaker-conditioned frame scores + joint refinement over the
        # (frame x speaker) score map (the "overlap-aware" post net)
        scores = jnp.einsum("btd,bsd->bts", x, prof) / jnp.sqrt(
            float(self.n_units))
        # zero padded-profile columns BEFORE the joint post net so bias-only
        # projections of zero profiles cannot leak into valid speakers'
        # refined logits.  NOTE: the post net mixes over the speaker axis,
        # so the padded profile count S is fixed by the trained params
        # (pad enrollments to the same S across calls).
        pmask = sequence_mask(profile_lens, S, jnp.bool_)[:, None, :]
        scores = jnp.where(pmask, scores, 0.0)
        h = nn.Dense(self.n_units // 2, name="post1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(scores)
        h = nn.relu(h)
        h = nn.Dense(S, name="post2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        logits = scores + h  # residual refinement
        return jnp.where(pmask, logits, -1e30)


@tables.register("model_classes", "SOND")
class SOND:
    def __init__(self, feat_dim: int = 80, n_units: int = 256,
                 n_heads: int = 4, n_layers: int = 4, ffn: int = 1024,
                 spk_dim: int = 192, threshold: float = 0.5,
                 frame_shift_ms: float = 10.0, params=None, **kwargs):
        self.module = SONDNet(feat_dim=feat_dim, n_units=n_units,
                              n_heads=n_heads, n_layers=n_layers, ffn=ffn,
                              spk_dim=spk_dim)
        self.spk_dim = spk_dim
        self.feat_dim = feat_dim
        self.threshold = threshold
        self.frame_shift_ms = frame_shift_ms
        self.params = params
        self._jit_act = jax.jit(
            lambda p, f, l, pr, pl: jax.nn.sigmoid(self.module.apply(
                p, f, l, pr, pl).astype(jnp.float32)))

    def init_params(self, rng, T: int = 32, S: int = 4):
        self.params = self.module.init(
            rng, jnp.zeros((1, T, self.feat_dim)), jnp.array([T], jnp.int32),
            jnp.zeros((1, S, self.spk_dim)), jnp.array([S], jnp.int32))
        return self.params

    def loss(self, params, feats, lengths, profiles, profile_lens, targets,
             rng=None):
        """BCE over valid (frame, profile) cells; targets (B, T, S)."""
        logits = self.module.apply(params, feats, lengths, profiles,
                                   profile_lens,
                                   deterministic=rng is None,
                                   rngs=None if rng is None
                                   else {"dropout": rng})
        lg = logits.astype(jnp.float32)
        tg = targets.astype(jnp.float32)
        bce = jnp.maximum(lg, 0) - lg * tg + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        T, S = lg.shape[1], lg.shape[2]
        fmask = sequence_mask(lengths, T, jnp.float32)[:, :, None]
        pmask = sequence_mask(profile_lens, S, jnp.float32)[:, None, :]
        m = fmask * pmask
        return jnp.sum(bce * m) / jnp.maximum(jnp.sum(m), 1.0)

    def diarize(self, feats, lengths, profiles, profile_lens
                ) -> List[List[List[float]]]:
        act = np.asarray(self._jit_act(
            self.params, jnp.asarray(feats), jnp.asarray(lengths, jnp.int32),
            jnp.asarray(profiles), jnp.asarray(profile_lens, jnp.int32)))
        out: List[List[List[float]]] = []
        for b in range(act.shape[0]):
            T = int(lengths[b])
            segs: List[List[float]] = []
            for s in range(int(profile_lens[b])):
                on = act[b, :T, s] > self.threshold
                i = 0
                while i < T:
                    if on[i]:
                        j = i
                        while j < T and on[j]:
                            j += 1
                        segs.append([i * self.frame_shift_ms,
                                     j * self.frame_shift_ms, float(s)])
                        i = j
                    else:
                        i += 1
            segs.sort(key=lambda x: x[0])
            out.append(segs)
        return out
