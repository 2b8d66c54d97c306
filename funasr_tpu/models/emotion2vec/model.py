"""emotion2vec: self-supervised emotion representation + SER head
(reference funasr/models/emotion2vec/model.py:35 — a data2vec-2.0 audio
model: wav2vec2 conv feature extractor in "layer_norm" mode, LN+Linear
feature projection, 5-layer grouped conv relative positional encoder,
10 learned extra tokens, symmetric ALiBi bias with a learned per-head
scale, 4 prenet + 8 main post-norm AltBlocks, mean-pool + linear SER
head).

Inference mirrors the reference contract: ``generate(wav)`` returns
``{"labels": [...], "scores": [...]}`` and optionally the utterance
embedding (granularity utterance/frame, extract_embedding flag).

TPU notes: the conv stack and both transformer stacks run in one jitted
program; block stacks use ``nn.scan`` (stacked params); raw audio lengths
are padded to quantized buckets by the caller; batched decode carries a
key-padding mask (the reference runs utterance-at-a-time with none).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.registry import tables

Dtype = Any

DEFAULT_EMOTIONS = (
    "angry", "disgusted", "fearful", "happy", "neutral", "other", "sad",
    "surprised", "unknown",
)

# wav2vec2 / data2vec-2.0 audio feature extractor layout (template.yaml
# feature_encoder_spec): (dim, kernel, stride) — ~50 Hz frame rate
CONV_LAYERS = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
               (512, 3, 2), (512, 2, 2), (512, 2, 2))


def conv_out_length(n: int, layers=CONV_LAYERS) -> int:
    for _, k, s in layers:
        n = (n - k) // s + 1
    return n


def alibi_slopes(heads: int) -> np.ndarray:
    """ALiBi head slopes (reference base.py:486 get_slopes)."""

    def pow2(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * start ** i for i in range(n)]

    if math.log2(heads).is_integer():
        return np.asarray(pow2(heads))
    closest = 2 ** math.floor(math.log2(heads))
    extra = pow2(2 * closest)[0::2][: heads - closest]
    return np.asarray(pow2(closest) + extra)


def symmetric_alibi(T: int, heads: int) -> np.ndarray:
    """(H, T, T) symmetric ALiBi: slope_h * -|i - j| (base.py:512)."""
    pos = -np.abs(np.arange(T)[None, :] - np.arange(T)[:, None])
    return alibi_slopes(heads)[:, None, None] * pos[None]


class ConvFeatureExtractor(nn.Module):
    """wav2vec2 extractor, mode="layer_norm": every conv (no bias) is
    followed by an affine fp32 LayerNorm and GELU (fairseq_modules.py:97)."""

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
            x = LayerNormF32(self.dtype, self.param_dtype, epsilon=1e-5,
                             name=f"ln{i}")(x)
            x = nn.gelu(x, approximate=False)
        return x


class TransformerLayer(nn.Module):
    """Generic pre-norm transformer layer (shared by SOND/EEND/LCBNet
    stacks; not part of the d2v2 emotion2vec graph)."""

    size: int
    n_head: int
    ffn: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        from funasr_tpu.models.sanm import masked_softmax

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


class AltAttention(nn.Module):
    """timm-style attention with additive ALiBi bias and key padding mask
    (timm_modules AltAttention / emotion2vec modules.py:244)."""

    dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, alibi_bias=None, key_mask=None,
                 deterministic: bool = True):
        B, T, C = x.shape
        H = self.num_heads
        d = C // H
        qkv = nn.Dense(3 * C, name="qkv", dtype=self.dtype,
                       param_dtype=self.param_dtype)(x)
        qkv = qkv.reshape(B, T, 3, H, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bthd,bshd->bhts", q * (d ** -0.5), k)
        scores = scores.astype(jnp.float32)
        if alibi_bias is not None:
            scores = scores + alibi_bias
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout_rate)(attn,
                                             deterministic=deterministic)
        ctx = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, C)
        out = nn.Dense(C, name="proj", dtype=self.dtype,
                       param_dtype=self.param_dtype)(ctx)
        return nn.Dropout(self.dropout_rate)(out,
                                             deterministic=deterministic)


class AltBlock(nn.Module):
    """Post-norm AltBlock (layer_norm_first=False, timm_modules.py:225):
    x += attn(x); r = norm1(x); x = norm2(r + mlp(r))."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, alibi_bias=None, key_mask=None,
                 deterministic: bool = True):
        x = x + AltAttention(self.dim, self.num_heads, self.dropout_rate,
                             self.dtype, self.param_dtype, name="attn")(
            x, alibi_bias, key_mask, deterministic)
        r = LayerNormF32(self.dtype, self.param_dtype, epsilon=1e-5,
                         name="norm1")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1",
                     dtype=self.dtype, param_dtype=self.param_dtype)(r)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return LayerNormF32(self.dtype, self.param_dtype, epsilon=1e-5,
                            name="norm2")(r + h)


class _ScanAltBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    dropout_rate: float
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, x, alibi_bias, key_mask, deterministic):
        y = AltBlock(self.dim, self.num_heads, self.mlp_ratio,
                     self.dropout_rate, self.dtype, self.param_dtype,
                     name="block")(x, alibi_bias, key_mask, deterministic)
        # emit the per-layer output too (stacked by nn.scan) so the SSL
        # teacher can average the top-K layers (data2vec-2.0 targets);
        # XLA dead-code-eliminates it on paths that don't consume it
        return y, y


def _alt_stack(depth, name, dim, heads, mlp_ratio, dropout, dtype,
               param_dtype):
    return nn.scan(
        _ScanAltBlock,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        length=depth,
        in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
    )(dim, heads, mlp_ratio, dropout, dtype, param_dtype, name=name)


class Emotion2vecModule(nn.Module):
    """The full d2v2 audio model (reference model.py:35 + audio.py:23 +
    base.py:156 ``contextualized_features``)."""

    dim: int = 768
    depth: int = 8
    prenet_depth: int = 4
    n_head: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = len(DEFAULT_EMOTIONS)
    num_extra_tokens: int = 10
    conv_pos_depth: int = 5
    conv_pos_width: int = 95
    conv_pos_groups: int = 16
    conv_layers: Tuple[Tuple[int, int, int], ...] = CONV_LAYERS
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, wav, wav_lengths, deterministic: bool = True,
                 return_frames: bool = False, frame_mask=None,
                 return_layers: bool = False):
        """``frame_mask`` (B, T) bool: student corruption — masked frames
        zeroed after feature projection (encoder_zero_mask semantics); the
        teacher runs with frame_mask=None."""
        B = wav.shape[0]
        feats = ConvFeatureExtractor(layers=self.conv_layers,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="local_encoder")(wav)
        T = feats.shape[1]
        n = wav_lengths
        for _, k, s in self.conv_layers:
            n = (n - k) // s + 1
        flens = jnp.maximum(n, 0)

        x = LayerNormF32(self.dtype, self.param_dtype, epsilon=1e-5,
                         name="project_ln")(feats)
        x = nn.Dense(self.dim, name="project_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        if frame_mask is not None:
            x = jnp.where(frame_mask[:, :, None], 0.0, x)

        # relative positional encoder: conv_pos_depth grouped convs
        # (k = max(3, width // depth)) each followed by an affine-less LN
        # and GELU (audio.py:54)
        k = max(3, self.conv_pos_width // self.conv_pos_depth)
        pos = x
        for i in range(self.conv_pos_depth):
            from funasr_tpu.ops.dwconv import GroupedConv1d

            pos = GroupedConv1d(self.dim, k, padding="SAME",
                                feature_group_count=self.conv_pos_groups,
                                name=f"pos_conv{i}", dtype=self.dtype,
                                param_dtype=self.param_dtype)(pos)
            pf = pos.astype(jnp.float32)
            mean = jnp.mean(pf, axis=-1, keepdims=True)
            var = jnp.var(pf, axis=-1, keepdims=True)
            pos = ((pf - mean) * jax.lax.rsqrt(var + 1e-5)).astype(
                pos.dtype)
            pos = nn.gelu(pos, approximate=False)
        x = x + pos

        # ALiBi (symmetric) with learned per-head scale; zero bias on the
        # extra-token rows/cols (base.py:258 F.pad)
        ex = self.num_extra_tokens
        alibi = jnp.asarray(symmetric_alibi(T, self.n_head), jnp.float32)
        scale = self.param(
            "alibi_scale", nn.initializers.ones,
            (1, 1, self.n_head, 1, 1), self.param_dtype)
        alibi = alibi[None] * jnp.maximum(
            scale[0].astype(jnp.float32), 0.0)      # (1|B, H, T, T)
        alibi = jnp.pad(alibi, ((0, 0), (0, 0), (ex, 0), (ex, 0)))

        extra = self.param("extra_tokens", nn.initializers.zeros,
                           (1, ex, self.dim), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(extra.astype(x.dtype), (B, ex, self.dim)), x],
            axis=1)
        key_mask = jnp.arange(T + ex)[None] < (flens[:, None] + ex)

        # context encoder (prenet): norm applied BEFORE the blocks when
        # layer_norm_first=False (modules.py:74)
        x = LayerNormF32(self.dtype, self.param_dtype, epsilon=1e-5,
                         name="context_norm")(x)
        x, _ = _alt_stack(self.prenet_depth, "prenet_blocks", self.dim,
                          self.n_head, self.mlp_ratio, self.dropout_rate,
                          self.dtype, self.param_dtype)(
            x, alibi, key_mask, deterministic)

        # main blocks (model.py:141); final norm is None for
        # layer_norm_first=False
        x, layer_outs = _alt_stack(
            self.depth, "blocks", self.dim, self.n_head,
            self.mlp_ratio, self.dropout_rate, self.dtype,
            self.param_dtype)(x, alibi, key_mask, deterministic)

        x = x[:, ex:]                              # remove extra tokens
        m = (jnp.arange(T)[None] < flens[:, None]).astype(x.dtype)[..., None]
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1),
                                                      1.0)
        logits = nn.Dense(self.num_classes, name="proj",
                          dtype=self.dtype, param_dtype=self.param_dtype)(
            pooled)
        if return_layers:
            # (depth, B, T, D) per-layer outputs, extra tokens stripped
            return logits, pooled, x, flens, layer_outs[:, :, ex:]
        if return_frames:
            return logits, pooled, x, flens
        return logits, pooled

    def classify(self, wav, wav_lengths):
        logits, pooled = self(wav, wav_lengths, deterministic=True)
        return jax.nn.softmax(logits.astype(jnp.float32), -1), pooled


def normalize_wav(wav: np.ndarray) -> np.ndarray:
    """Per-utterance layer norm of the raw waveform (reference
    model.py:232: ``F.layer_norm(source, source.shape)``)."""
    mean = wav.mean()
    var = wav.var()
    return (wav - mean) / np.sqrt(var + 1e-5)


@tables.register("model_classes", "Emotion2vec")
class Emotion2vec:
    """User-facing SER model (reference inference contract)."""

    def __init__(self, labels: Sequence[str] = DEFAULT_EMOTIONS,
                 dim: int = 768, depth: int = 8, prenet_depth: int = 4,
                 n_head: int = 12, mlp_ratio: float = 4.0, params=None,
                 normalize: bool = True, ffn: Optional[int] = None,
                 **kwargs):
        self.labels = list(labels)
        self.normalize = normalize
        if ffn is not None:  # legacy surface: ffn width instead of ratio
            mlp_ratio = ffn / dim
        self.module = Emotion2vecModule(
            dim=dim, depth=depth, prenet_depth=prenet_depth, n_head=n_head,
            mlp_ratio=mlp_ratio, num_classes=len(self.labels))
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
            batch[i, : len(w)] = normalize_wav(np.asarray(w, np.float32)) \
                if self.normalize else w
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


def make_d2v_targets(layer_outs: jnp.ndarray, k: int) -> jnp.ndarray:
    """data2vec-2.0 teacher targets (fairseq data2vec2.py ``make_targets``
    with the audio-modality defaults ``instance_norm_target_layer=True``):
    take the top-``k`` block outputs, instance-norm each (per sample, per
    channel, stats over TIME, no affine), and average.

    ``layer_outs``: (depth, B, T, D) stacked per-layer outputs.
    Returns (B, T, D) fp32 targets.
    """
    tl = layer_outs[-k:].astype(jnp.float32)
    mean = jnp.mean(tl, axis=2, keepdims=True)
    var = jnp.var(tl, axis=2, keepdims=True)
    tl = (tl - mean) * jax.lax.rsqrt(var + 1e-5)
    return jnp.mean(tl, axis=0)


def ssl_loss(module: Emotion2vecModule, student_params, teacher_params,
             wav, wav_lengths, rng, mask_prob: float = 0.5,
             average_top_k_layers: int = 8):
    """data2vec-2.0 SSL objective: the student regresses the
    (stop-gradient) EMA teacher's top-K layer-averaged, per-layer
    instance-normed targets at masked positions (fairseq data2vec2
    ``make_targets`` semantics — see ``make_d2v_targets``).  Masked
    frames are zeroed after feature projection (encoder_zero_mask)."""
    _, _, _, flens, layer_outs = module.apply(
        teacher_params, wav, wav_lengths, deterministic=True,
        return_layers=True)
    k = min(average_top_k_layers, layer_outs.shape[0])
    teacher_frames = jax.lax.stop_gradient(
        make_d2v_targets(layer_outs, k))
    T = teacher_frames.shape[1]
    mask = jax.random.bernoulli(rng, mask_prob, (wav.shape[0], T))
    mask = mask & (jnp.arange(T)[None] < flens[:, None])
    _, _, student_frames, _ = module.apply(
        student_params, wav, wav_lengths, deterministic=True,
        return_frames=True, frame_mask=mask)
    diff = (student_frames - teacher_frames) ** 2
    per_frame = jnp.mean(diff, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, per_frame, 0.0)) / denom
