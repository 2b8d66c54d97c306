"""emotion2vec: self-supervised emotion representation + SER head
(reference funasr/models/emotion2vec/model.py:34).

Architecture (upstream emotion2vec is a data2vec-style model over raw
waveforms): a strided conv feature extractor (wav2vec2 layout: 7 conv
layers, ~50 Hz frame rate) -> LayerNorm -> transformer encoder ->
frame-level representations; utterance-level logits come from mean pooling
+ a linear classifier over the emotion inventory.

Inference mirrors the reference contract: ``generate(wav)`` returns
``{"labels": [...], "scores": [...]}`` and optionally the extracted
embedding (granularity utterance/frame, extract_embedding flag,
reference model.py inference path).

SSL pretraining (EMA teacher regression on masked frames, data2vec-style)
is exposed as ``ssl_loss`` — the student predicts the teacher's
frame-averaged top-K layer features at masked positions.

TPU notes: the conv stack and transformer run in one jitted program; raw
audio lengths are padded to quantized buckets by the caller; masking uses
PRNG-keyed static-shape masks (no dynamic shapes).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.sanm import LayerNormF32, masked_softmax
from funasr_tpu.ops.masks import key_mask
from funasr_tpu.registry import tables

Dtype = Any

DEFAULT_EMOTIONS = (
    "angry", "disgusted", "fearful", "happy", "neutral", "other", "sad",
    "surprised", "unknown",
)

# wav2vec2 / data2vec conv feature extractor layout: (dim, kernel, stride)
CONV_LAYERS = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
               (512, 3, 2), (512, 2, 2), (512, 2, 2))


def conv_out_length(n: int, layers=CONV_LAYERS) -> int:
    for _, k, s in layers:
        n = (n - k) // s + 1
    return n


class ConvFeatureExtractor(nn.Module):
    layers: Tuple[Tuple[int, int, int], ...] = CONV_LAYERS
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """(B, N) raw audio -> (B, T, C) ~50 Hz features."""
        x = wav[:, :, None].astype(self.dtype)
        for i, (c, k, s) in enumerate(self.layers):
            x = nn.Conv(c, (k,), strides=(s,), padding="VALID",
                        use_bias=False, name=f"conv{i}", dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)
            if i == 0:
                # wav2vec2 group-norm on the first layer ~ layer norm here
                x = LayerNormF32(self.dtype, self.param_dtype,
                                 name="gn0")(x)
            x = nn.gelu(x)
        return x


class TransformerLayer(nn.Module):
    size: int
    n_head: int
    ffn: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        B, T, _ = x.shape
        d_k = self.size // self.n_head
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm1")(x)
        qkv = nn.Dense(3 * self.size, name="qkv", dtype=self.dtype,
                       param_dtype=self.param_dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.n_head, d_k) * (d_k ** -0.5)
        k = k.reshape(B, T, self.n_head, d_k)
        v = v.reshape(B, T, self.n_head, d_k)
        scores = jnp.einsum("bthd,bshd->bhts", q, k)
        attn = masked_softmax(scores,
                              None if mask is None else mask[:, None, :, :])
        ctx = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
        h = nn.Dense(self.size, name="out", dtype=self.dtype,
                     param_dtype=self.param_dtype)(ctx.reshape(B, T, self.size))
        x = res + nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        res = x
        h = LayerNormF32(self.dtype, self.param_dtype, name="norm2")(x)
        h = nn.Dense(self.ffn, name="fc1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.size, name="fc2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        return res + nn.Dropout(self.dropout_rate)(h,
                                                   deterministic=deterministic), None


class Emotion2vecModule(nn.Module):
    dim: int = 768
    depth: int = 8
    n_head: int = 12
    ffn: int = 3072
    num_classes: int = len(DEFAULT_EMOTIONS)
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, wav, wav_lengths, deterministic: bool = True,
                 return_frames: bool = False, frame_mask=None):
        """``frame_mask`` (B, T) bool: positions replaced by the learned
        mask embedding after the feature extractor (the data2vec student
        corruption; the teacher runs with frame_mask=None)."""
        feats = ConvFeatureExtractor(dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="feature_extractor")(wav)
        T = feats.shape[1]
        flens = jnp.zeros_like(wav_lengths)
        n = wav_lengths
        for _, k, s in CONV_LAYERS:
            n = (n - k) // s + 1
        flens = jnp.maximum(n, 0)
        x = LayerNormF32(self.dtype, self.param_dtype, name="post_extract_ln")(feats)
        x = nn.Dense(self.dim, name="post_extract_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        mask_emb = self.param("mask_emb", nn.initializers.normal(0.02),
                              (self.dim,), self.param_dtype)
        if frame_mask is not None:
            x = jnp.where(frame_mask[:, :, None],
                          mask_emb.astype(x.dtype)[None, None, :], x)
        # conv positional embedding (wav2vec2 style: depthwise-ish conv)
        pos = nn.Conv(self.dim, (19,), padding="SAME", feature_group_count=16,
                      name="pos_conv", dtype=self.dtype,
                      param_dtype=self.param_dtype)(x)
        x = x + nn.gelu(pos)
        mask = key_mask(flens, T, dtype=jnp.float32)
        Stack = nn.scan(
            TransformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.depth,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(self.dim, self.n_head, self.ffn, self.dropout_rate,
                     self.dtype, self.param_dtype, name="blocks")(
            x, mask, deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, name="final_ln")(x)
        # mean pool over valid frames
        m = (jnp.arange(T)[None] < flens[:, None]).astype(x.dtype)[..., None]
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0)
        logits = nn.Dense(self.num_classes, name="classifier",
                          dtype=self.dtype, param_dtype=self.param_dtype)(
            pooled)
        if return_frames:
            return logits, pooled, x, flens
        return logits, pooled

    def classify(self, wav, wav_lengths):
        logits, pooled = self(wav, wav_lengths, deterministic=True)
        return jax.nn.softmax(logits.astype(jnp.float32), -1), pooled


@tables.register("model_classes", "Emotion2vec")
class Emotion2vec:
    """User-facing SER model (reference inference contract)."""

    def __init__(self, labels: Sequence[str] = DEFAULT_EMOTIONS,
                 dim: int = 768, depth: int = 8, n_head: int = 12,
                 ffn: int = 3072, params=None, **kwargs):
        self.labels = list(labels)
        self.module = Emotion2vecModule(
            dim=dim, depth=depth, n_head=n_head, ffn=ffn,
            num_classes=len(self.labels))
        self.params = params
        self._jit_classify = jax.jit(
            lambda p, w, l: self.module.apply(p, w, l,
                                              method=self.module.classify))

    def init_params(self, rng, n: int = 3200):
        self.params = self.module.init(rng, jnp.zeros((1, n)),
                                       jnp.array([n], jnp.int32))
        return self.params

    def generate(self, wavs: Sequence[np.ndarray],
                 extract_embedding: bool = False) -> List[Dict[str, Any]]:
        lens = np.array([len(w) for w in wavs], np.int64)
        pad = 3200 * ((int(lens.max()) + 3199) // 3200)
        batch = np.zeros((len(wavs), pad), np.float32)
        for i, w in enumerate(wavs):
            batch[i, : len(w)] = w
        scores, pooled = self._jit_classify(
            self.params, jnp.asarray(batch), jnp.asarray(lens, jnp.int32))
        scores = np.asarray(scores)
        pooled = np.asarray(pooled)
        out = []
        for i in range(len(wavs)):
            r: Dict[str, Any] = {"labels": self.labels,
                                 "scores": scores[i].tolist()}
            if extract_embedding:
                r["feats"] = pooled[i]
            out.append(r)
        return out

    def ce_loss(self, params, wav, wav_lengths, targets, rng=None):
        logits, _ = self.module.apply(
            params, wav, wav_lengths, deterministic=rng is None,
            rngs=None if rng is None else {"dropout": rng})
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, targets[:, None], -1)[:, 0]
        return jnp.mean(nll)


def ssl_loss(module: Emotion2vecModule, student_params, teacher_params,
             wav, wav_lengths, rng, mask_prob: float = 0.5):
    """data2vec-style SSL objective: student regresses the (stop-gradient)
    EMA teacher's frame features at masked positions (reference
    emotion2vec pretraining; simplified to final-layer targets)."""
    _, _, teacher_frames, flens = module.apply(
        teacher_params, wav, wav_lengths, deterministic=True,
        return_frames=True)
    teacher_frames = jax.lax.stop_gradient(teacher_frames)
    T = teacher_frames.shape[1]
    mask = jax.random.bernoulli(rng, mask_prob, (wav.shape[0], T))
    mask = mask & (jnp.arange(T)[None] < flens[:, None])
    # the student's masked positions are replaced by the learned mask
    # embedding after the feature extractor (the data2vec corruption) —
    # without it the objective is degenerate (student == teacher input)
    _, _, student_frames, _ = module.apply(
        student_params, wav, wav_lengths, deterministic=True,
        return_frames=True, frame_mask=mask)
    diff = (student_frames - teacher_frames) ** 2
    per_frame = jnp.mean(diff, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, per_frame, 0.0)) / denom
