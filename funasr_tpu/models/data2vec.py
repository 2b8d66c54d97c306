"""data2vec SSL pretraining (reference funasr/models/data2vec/ —
wav2vec2-style encoder over FBANK features; the student regresses an EMA
teacher's averaged top-K transformer layer outputs at masked positions).

Architecture (data2vec_encoder.py:30 ``Data2VecEncoder``): a small conv
feature extractor over fbank ("[(512,2,2)] + [(512,2,2)]", GroupNorm on
the first layer in "default" mode), feature LayerNorm + projection to the
encoder dim, a learned ``mask_emb``, a weight-normed conv positional
embedding (k=128, 16 groups, SamePad trims the even-kernel tail), then
post-norm BERT-style layers (fairseq TransformerSentenceEncoderLayer:
self_attn q/k/v/out + self_attn_layer_norm + fc1/fc2 + final_layer_norm,
wav2vec2.py:294) with an encoder-level LayerNorm applied BEFORE the
stack when layer_norm_first=False (wav2vec2.py:235), and a ``final_proj``
regression head.

TPU notes: one jitted program per forward; the layer stack runs under
``nn.scan`` and also emits the per-layer FFN outputs (``layer_results``,
the d2v teacher targets) as a stacked (L, B, T, C) tensor; EMA update is
a pure pytree op.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.registry import tables

Dtype = Any

CONV_LAYERS_DEFAULT = ((512, 2, 2), (512, 2, 2))


class FeatureExtractor(nn.Module):
    """ConvFeatureExtractionModel in "default" mode over (B, T, F) fbank:
    Conv1d (no bias) + GELU per layer, GroupNorm(d, d) after layer 0
    (fairseq_modules.py:108)."""

    layers: Tuple[Tuple[int, int, int], ...] = CONV_LAYERS_DEFAULT
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, (c, k, s) in enumerate(self.layers):
            x = nn.Conv(c, (k,), strides=(s,), padding="VALID",
                        use_bias=False, name=f"conv{i}", dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)
            if i == 0:
                # GroupNorm(dim, dim) == per-channel instance norm over T
                scale = self.param("gn_scale", nn.initializers.ones, (c,),
                                   self.param_dtype)
                bias = self.param("gn_bias", nn.initializers.zeros, (c,),
                                  self.param_dtype)
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=1, keepdims=True)
                var = jnp.var(xf, axis=1, keepdims=True)
                x = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale
                     + bias).astype(x.dtype)
            x = nn.gelu(x, approximate=False)
        return x


class _SentenceLayer(nn.Module):
    """Post-norm BERT layer (wav2vec2.py:294, layer_norm_first=False).
    Returns (x, layer_result) where layer_result is the fc2 output before
    dropout/residual — the data2vec target feature."""

    dim: int
    heads: int
    ffn: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask, deterministic: bool = True):
        B, T, C = x.shape
        H = self.heads
        d = C // H
        res = x
        q = nn.Dense(C, name="q_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        k = nn.Dense(C, name="k_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        v = nn.Dense(C, name="v_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        q = q.reshape(B, T, H, d) * (d ** -0.5)
        k = k.reshape(B, T, H, d)
        v = v.reshape(B, T, H, d)
        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout_rate)(attn,
                                             deterministic=deterministic)
        ctx = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, C)
        x = nn.Dense(C, name="out_proj", dtype=self.dtype,
                     param_dtype=self.param_dtype)(ctx)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, epsilon=1e-5,
                         name="self_attn_layer_norm")(res + x)
        res = x
        h = nn.Dense(self.ffn, name="fc1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="fc2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        layer_result = h
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        x = LayerNormF32(self.dtype, self.param_dtype, epsilon=1e-5,
                         name="final_layer_norm")(res + h)
        return x, layer_result


class _ScanLayer(nn.Module):
    dim: int
    heads: int
    ffn: int
    dropout_rate: float
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, x, key_mask, deterministic):
        return _SentenceLayer(self.dim, self.heads, self.ffn,
                              self.dropout_rate, self.dtype,
                              self.param_dtype, name="layer")(
            x, key_mask, deterministic)


class Data2VecEncoder(nn.Module):
    """Reference Data2VecEncoder graph (inference/extract_features path +
    the masked-student input used by the SSL objective)."""

    input_size: int = 80
    conv_layers: Tuple[Tuple[int, int, int], ...] = CONV_LAYERS_DEFAULT
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        # regression head (student only); setup-declared so the compact
        # __call__ stays the trunk
        self.final_proj = nn.Dense(self.encoder_embed_dim,
                                   name="final_proj", dtype=self.dtype,
                                   param_dtype=self.param_dtype)

    def out_lengths(self, n):
        for _, k, s in self.conv_layers:
            n = (n - k) // s + 1
        return jnp.maximum(n, 0)

    @nn.compact
    def __call__(self, feats, feat_lengths, deterministic: bool = True,
                 frame_mask=None):
        """feats (B, T, F) fbank -> (x (B, T', C), layer_results
        (L, B, T', C), lengths (B,)).  ``frame_mask`` replaces masked
        frames with ``mask_emb`` after projection (the student
        corruption, data2vec_encoder.py:284)."""
        ext_dim = self.conv_layers[-1][0]
        x = FeatureExtractor(self.conv_layers, self.dtype,
                             self.param_dtype,
                             name="feature_extractor")(feats)
        T = x.shape[1]
        lens = self.out_lengths(feat_lengths)
        key_mask = jnp.arange(T)[None] < lens[:, None]

        x = LayerNormF32(self.dtype, self.param_dtype, epsilon=1e-5,
                         name="layer_norm")(x)
        x = nn.Dense(self.encoder_embed_dim, name="post_extract_proj",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)

        mask_emb = self.param("mask_emb",
                              nn.initializers.uniform(scale=1.0),
                              (self.encoder_embed_dim,), self.param_dtype)
        if frame_mask is not None:
            x = jnp.where(frame_mask[:, :, None],
                          mask_emb.astype(x.dtype)[None, None, :], x)

        # zero padding frames, then the weight-normed conv positional
        # embedding (even kernel: SamePad trims the trailing element,
        # wav2vec2.py:101-116)
        x = jnp.where(key_mask[:, :, None], x, 0.0)
        from funasr_tpu.ops.dwconv import GroupedConv1d

        pos = GroupedConv1d(self.encoder_embed_dim, self.conv_pos,
                            padding=((self.conv_pos // 2,
                                      self.conv_pos // 2),),
                            feature_group_count=self.conv_pos_groups,
                            name="pos_conv", dtype=self.dtype,
                            param_dtype=self.param_dtype)(x)
        pos = nn.gelu(pos[:, :T], approximate=False)
        x = x + pos
        # encoder-level LN runs BEFORE the stack when layer_norm_first is
        # False (wav2vec2.py:235)
        x = LayerNormF32(self.dtype, self.param_dtype, epsilon=1e-5,
                         name="encoder_norm")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        Stack = nn.scan(
            _ScanLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.encoder_layers,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, layer_results = Stack(
            self.encoder_embed_dim, self.encoder_attention_heads,
            self.encoder_ffn_embed_dim, self.dropout_rate, self.dtype,
            self.param_dtype, name="layers")(x, key_mask, deterministic)
        return x, layer_results, lens

    def final_projection(self, x):
        return self.final_proj(x)

    def extract_features(self, feats, feat_lengths):
        x, _, lens = self(feats, feat_lengths, deterministic=True)
        return x, lens

    def student_prediction(self, feats, feat_lengths, frame_mask,
                           deterministic: bool = True):
        x, _, lens = self(feats, feat_lengths, deterministic=deterministic,
                          frame_mask=frame_mask)
        return self.final_projection(x), lens


def d2v_targets(layer_results: jnp.ndarray, top_k: int,
                instance_norm: bool = True) -> jnp.ndarray:
    """Teacher targets: average of the top-K layers' FFN outputs, each
    instance-normalized over time (data2vec_encoder.py:455-472 with
    instance_norm_target_layer)."""
    tgt = layer_results[-top_k:]
    if instance_norm:
        mean = jnp.mean(tgt, axis=2, keepdims=True)
        var = jnp.var(tgt, axis=2, keepdims=True)
        tgt = (tgt - mean) * jax.lax.rsqrt(var + 1e-5)
    return jnp.mean(tgt, axis=0)


def ema_update(teacher_params, student_params, decay: float = 0.999):
    """teacher <- decay * teacher + (1 - decay) * student (ema_module.py)."""
    return jax.tree_util.tree_map(
        lambda t, s: decay * t + (1.0 - decay) * s,
        teacher_params, student_params)


def d2v_loss(module: Data2VecEncoder, student_params, teacher_params,
             feats, feat_lengths, rng, mask_prob: float = 0.65,
             top_k: int = 8) -> jnp.ndarray:
    """Masked-frame regression of the EMA teacher's averaged top-K layer
    targets (data2vec_encoder.py forward; smooth-l1 beta=0 -> mse)."""
    _, layer_results, lens = module.apply(
        teacher_params, feats, feat_lengths, True)
    targets = jax.lax.stop_gradient(d2v_targets(layer_results, top_k))
    T = targets.shape[1]
    mask = jax.random.bernoulli(rng, mask_prob, (feats.shape[0], T))
    mask = mask & (jnp.arange(T)[None] < lens[:, None])
    pred, _ = module.apply(student_params, feats, feat_lengths, mask,
                           method=module.student_prediction)
    per_frame = jnp.mean((pred - targets) ** 2, axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, per_frame, 0.0)) / denom


@tables.register("model_classes", "Data2Vec")
class Data2Vec:
    """SSL pretrainer wrapper (reference data2vec.py:33
    Data2VecPretrainModel: frontend + Data2VecEncoder + EMA teacher)."""

    def __init__(self, input_size: int = 80, dim: int = 768,
                 depth: int = 12, n_head: int = 12, ffn: int = 3072,
                 ema_decay: float = 0.999, mask_prob: float = 0.65,
                 average_top_k_layers: int = 8, **kwargs):
        self.module = Data2VecEncoder(
            input_size=input_size, encoder_layers=depth,
            encoder_embed_dim=dim, encoder_ffn_embed_dim=ffn,
            encoder_attention_heads=n_head)
        self.ema_decay = ema_decay
        self.mask_prob = mask_prob
        self.top_k = average_top_k_layers

        @jax.jit
        def _step(student, teacher, feats, lens, rng):
            loss, grads = jax.value_and_grad(
                lambda p: d2v_loss(self.module, p, teacher, feats, lens,
                                   rng, self.mask_prob, self.top_k))(student)
            return loss, grads

        self._step = _step

    def init_params(self, rng, n: int = 32):
        p = self.module.init(rng, jnp.zeros((1, n, self.module.input_size)),
                             jnp.array([n], jnp.int32))
        # final_proj params exist only on the student head
        p2 = self.module.init(
            rng, jnp.zeros((1, n, self.module.input_size)),
            jnp.array([n], jnp.int32),
            jnp.zeros((1, self.module.out_lengths(n)), bool),
            method=self.module.student_prediction)
        return p2, p  # (student incl. final_proj, teacher)

    def pretrain_step(self, student, teacher, feats, lens, rng):
        """-> (loss, grads, None).  Caller applies the optimizer to the
        student then EMA-merges into the teacher."""
        loss, grads = self._step(student, teacher, feats, lens, rng)
        return loss, grads, None

    def update_teacher(self, teacher, student):
        # the teacher mirrors the trunk only (ema_transformer_only);
        # drop the student's final_proj leaf before merging
        trunk = {"params": {k: v for k, v in student["params"].items()
                            if k != "final_proj"}}
        return ema_update(teacher, trunk, self.ema_decay)
