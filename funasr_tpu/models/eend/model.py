"""EEND end-to-end neural diarization (reference funasr/models/eend/ —
EEND-OLA: transformer encoder over fbank, per-frame per-speaker activity
with permutation-invariant training).

TPU design: the PIT objective enumerates the S! speaker permutations as a
static stack (S <= 4 on the standard EEND configs), so the whole loss is
one fused program — no Hungarian host round-trip.  Inference thresholds
the sigmoid activities and extracts [start_ms, end_ms, speaker] segments
on host (control flow, not FLOPs).
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.emotion2vec.model import TransformerLayer
from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.ops.masks import key_mask
from funasr_tpu.registry import tables

Dtype = Any


class EENDEncoder(nn.Module):
    n_units: int = 256
    n_heads: int = 4
    n_layers: int = 4
    ffn: int = 1024
    max_speakers: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, lengths, deterministic: bool = True):
        """(B, T, F) fbank -> (B, T, S) speaker activity logits."""
        T = feats.shape[1]
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
        x = LayerNormF32(self.dtype, self.param_dtype, name="final_ln")(x)
        return nn.Dense(self.max_speakers, name="spk_head",
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)


def pit_bce_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                 lengths: jnp.ndarray) -> jnp.ndarray:
    """Permutation-invariant BCE: min over speaker permutations of the
    frame-level sigmoid cross-entropy.  logits/targets: (B, T, S)."""
    S = logits.shape[-1]
    T = logits.shape[1]
    valid = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
    perms = jnp.asarray(list(itertools.permutations(range(S))), jnp.int32)

    lg = logits.astype(jnp.float32)
    tg = targets.astype(jnp.float32)

    def perm_loss(perm):
        p = tg[:, :, perm]  # (B, T, S) permuted targets
        bce = jnp.maximum(lg, 0) - lg * p + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        per_frame = jnp.mean(bce, axis=-1)  # (B, T)
        return jnp.sum(per_frame * valid, axis=-1) / jnp.maximum(
            jnp.sum(valid, axis=-1), 1.0)  # (B,)

    losses = jax.vmap(perm_loss)(perms)  # (S!, B)
    return jnp.mean(jnp.min(losses, axis=0))


@tables.register("model_classes", "EENDOLA")
class EENDOLA:
    """User-facing EEND model: train loss + segment inference."""

    def __init__(self, feat_dim: int = 80, n_units: int = 256,
                 n_heads: int = 4, n_layers: int = 4, ffn: int = 1024,
                 max_speakers: int = 4, threshold: float = 0.5,
                 median_frames: int = 11, frame_shift_ms: float = 10.0,
                 params=None, **kwargs):
        self.module = EENDEncoder(n_units=n_units, n_heads=n_heads,
                                  n_layers=n_layers, ffn=ffn,
                                  max_speakers=max_speakers)
        self.feat_dim = feat_dim
        self.threshold = threshold
        self.median_frames = median_frames
        self.frame_shift_ms = frame_shift_ms
        self.params = params
        self._jit_act = jax.jit(
            lambda p, f, l: jax.nn.sigmoid(
                self.module.apply(p, f, l).astype(jnp.float32)))

    def init_params(self, rng, T: int = 32):
        self.params = self.module.init(
            rng, jnp.zeros((1, T, self.feat_dim)), jnp.array([T], jnp.int32))
        return self.params

    def loss(self, params, feats, lengths, targets, rng=None):
        logits = self.module.apply(
            params, feats, lengths, deterministic=rng is None,
            rngs=None if rng is None else {"dropout": rng})
        return pit_bce_loss(logits, targets, lengths)

    def diarize(self, feats: np.ndarray, lengths: np.ndarray
                ) -> List[List[List[float]]]:
        """(B, T, F) -> per-utterance [start_ms, end_ms, spk] segments."""
        act = np.asarray(self._jit_act(
            self.params, jnp.asarray(feats), jnp.asarray(lengths, jnp.int32)))
        out: List[List[List[float]]] = []
        k = self.median_frames
        for b in range(act.shape[0]):
            T = int(lengths[b])
            segs: List[List[float]] = []
            for s in range(act.shape[-1]):
                a = act[b, :T, s]
                if k > 1 and T >= k:  # median smoothing
                    pad = k // 2
                    ap = np.pad(a, (pad, pad), mode="edge")
                    a = np.median(
                        np.lib.stride_tricks.sliding_window_view(ap, k), -1)
                on = a > self.threshold
                segs_s = []
                i = 0
                while i < T:
                    if on[i]:
                        j = i
                        while j < T and on[j]:
                            j += 1
                        segs_s.append([i * self.frame_shift_ms,
                                       j * self.frame_shift_ms, float(s)])
                        i = j
                    else:
                        i += 1
                segs.extend(segs_s)
            segs.sort(key=lambda x: x[0])
            out.append(segs)
        return out
