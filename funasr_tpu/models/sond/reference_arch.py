"""SOND reference architecture: speaker overlap-aware neural diarization
with power-set encoding output.

Reference: funasr/models/sond/e2e_diar_sond.py:40 ``DiarSondModel`` and its
sub-encoders:
- speech encoder ``ResNet34Diar`` / ``ResNet34SpL2RegDiar``
  (sond/encoder/resnet34_encoder.py:269/:367 — tf-"same" padded BasicBlocks
  + windowed statistic pooling + resnet1/resnet2 heads, embedding_node
  selectable),
- speaker (profile) encoder + context-dependent scorer
  ``SelfAttentionEncoder`` (sond/encoder/self_attention_encoder.py:119 —
  fused linear_q_k_v attention, pre-norm, optional out_units head),
- context-independent scorers ``DotScorer``/``CosScorer``
  (sond/encoder/ci_scorers.py),
- post-net ``FsmnEncoder`` (sond/encoder/fsmn_encoder.py:80 —
  FsmnFeedForward + depthwise memory blocks + DNN layers + 1x1 out conv),
- PSE output: vocab = power-set codes in ``token_list``; frame argmax
  decodes to per-speaker binary activity via the code's bits
  (e2e_diar_sond.py:126 generate_pse_embedding / :154 forward labels).

Published checkpoints bind through convert.sond_from_torch; logit parity
vs the actual reference torch modules is pinned in tests/test_sond_ref.py.

TPU-first notes: BatchNorms run on running stats at inference (the
``batch_stats`` collection); the N-speaker axis is folded into the batch
for the cd scorer exactly like the reference's reshape; windowed
statistic pooling is one gather + masked moments instead of the per-chunk
python loop.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.ops.posenc import sinusoidal_encoding
from funasr_tpu.registry import tables

Dtype = Any


def _bn(name: str):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                        momentum=0.5, name=name, dtype=jnp.float32)


class SondBasicLayer(nn.Module):
    """resnet34_encoder.py:11 BasicLayer — pre-activation residual with
    tf-"same" proper_padding (stride-2 pads (size%2, 1))."""

    in_filters: int
    filters: int
    stride: int

    @nn.compact
    def __call__(self, x, ilens):
        # x: (B, T, F, C)
        identity = x
        if self.in_filters != self.filters or self.stride > 1:
            identity = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               padding="VALID", use_bias=False,
                               name="conv_sc")(x)
            identity = _bn("bn_sc")(identity)
        h = nn.relu(_bn("bn1")(x))
        h = self._pad(h, self.stride)
        h = nn.Conv(self.filters, (3, 3),
                    strides=(self.stride, self.stride), padding="VALID",
                    use_bias=False, name="conv1")(h)
        h = nn.relu(_bn("bn2")(h))
        h = self._pad(h, 1)
        h = nn.Conv(self.filters, (3, 3), strides=(1, 1), padding="VALID",
                    use_bias=False, name="conv2")(h)
        if self.stride == 2:
            ilens = (ilens + 1) // self.stride
        return h + identity, ilens

    @staticmethod
    def _pad(x, stride):
        if stride == 1:
            return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        T, F = x.shape[1], x.shape[2]
        return jnp.pad(x, ((0, 0), (T % 2, 1), (F % 2, 1), (0, 0)))


class SondResNet34(nn.Module):
    """resnet34_encoder.py:80 trunk (head conv + 4 blocks)."""

    layers_in_block: Tuple[int, ...] = (3, 4, 6, 3)
    filters_in_block: Tuple[int, ...] = (32, 64, 128, 256)
    use_head_conv: bool = True

    @nn.compact
    def __call__(self, x, ilens):
        # x: (B, T, F) -> (B, T/8, F/8, C)
        h = x[..., None]
        if self.use_head_conv:
            h = nn.Conv(self.filters_in_block[0], (3, 3), strides=(1, 1),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name="pre_conv")(h)
            h = nn.relu(_bn("pre_conv_bn")(h))
        for i, (n, f) in enumerate(zip(self.layers_in_block,
                                       self.filters_in_block)):
            in_f = (self.filters_in_block[0] if self.use_head_conv else 1) \
                if i == 0 else self.filters_in_block[i - 1]
            for j in range(n):
                h, ilens = SondBasicLayer(
                    in_f if j == 0 else f, f,
                    (1 if i == 0 else 2) if j == 0 else 1,
                    name=f"block_{i}_layer_{j}")(h, ilens)
        return h, ilens


def windowed_statistic_pooling(x: jnp.ndarray, pool_size: int = 20,
                               stride: int = 1) -> jnp.ndarray:
    """pooling/statistic_pooling.py:73: per output frame, mean/std over a
    replicate-padded window of ``pool_size`` frames (and the freq axis for
    4-D inputs).  x: (B, T, F, C) or (B, T, C) -> (B, ceil(T/stride), 2C).
    """
    T = x.shape[1]
    n_out = -(-T // stride)
    pad = pool_size // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)) + ((0, 0),) * (x.ndim - 2),
                 mode="edge")
    idx = (jnp.arange(n_out)[:, None] * stride
           + jnp.arange(pool_size)[None, :])  # (n_out, W)
    win = xp[:, idx]  # (B, n_out, W, [F,] C)
    axes = tuple(range(2, win.ndim - 1))  # W [, F]
    mean = jnp.mean(win, axis=axes)
    var = jnp.mean((win - jnp.mean(win, axis=axes, keepdims=True)) ** 2,
                   axis=axes)
    var = jnp.maximum(var, 1e-12)
    return jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)


class ResNet34DiarEncoder(nn.Module):
    """resnet34_encoder.py:269 ResNet34Diar (sp_l2reg=False) / :367
    ResNet34SpL2RegDiar (sp_l2reg=True): trunk + (2d or flattened-1d)
    resnet0 head + windowed statistic pooling + resnet1/resnet2 dense-bn
    pairs; ``embedding_node`` picks the output tap."""

    input_size: int
    sp_l2reg: bool = True
    num_nodes_pooling_layer: int = 256
    num_nodes_resnet1: int = 256
    num_nodes_last_layer: int = 256
    layers_in_block: Tuple[int, ...] = (3, 4, 6, 3)
    filters_in_block: Tuple[int, ...] = (32, 64, 128, 256)
    embedding_node: str = "resnet1_dense"
    pool_size: int = 20
    stride: int = 1

    @nn.compact
    def __call__(self, x, ilens):
        h, olens = SondResNet34(self.layers_in_block,
                                self.filters_in_block, name="trunk")(
            x, ilens)
        if self.sp_l2reg:
            # (B, T, F, C) -> (B, T, F*C) -> 1x1 conv (dense) -> bn1d
            B, T, F, C = h.shape
            h2 = h.reshape(B, T, F * C)
            h2 = nn.Dense(self.num_nodes_pooling_layer,
                          name="resnet0_dense")(h2)
            h2 = nn.relu(h2)
            h2 = _bn("resnet0_bn")(h2)
            pooled = windowed_statistic_pooling(h2, self.pool_size,
                                                self.stride)
        else:
            h2 = nn.Dense(self.num_nodes_pooling_layer,
                          name="resnet0_dense")(h)  # 1x1 conv2d == dense
            h2 = nn.relu(h2)
            h2 = _bn("resnet0_bn")(h2)
            pooled = windowed_statistic_pooling(h2, self.pool_size,
                                                self.stride)
        if self.stride > 1:
            olens = -(-olens // self.stride)  # num_chunk = ceil(T/stride)
        endpoints = {"pooling": pooled}
        f1 = nn.Dense(self.num_nodes_resnet1, name="resnet1_dense")(pooled)
        endpoints["resnet1_dense"] = f1
        f1r = nn.relu(f1)
        endpoints["resnet1_relu"] = f1r
        f1b = _bn("resnet1_bn")(f1r)
        endpoints["resnet1_bn"] = f1b
        f2 = nn.Dense(self.num_nodes_last_layer, name="resnet2_dense")(f1b)
        endpoints["resnet2_dense"] = f2
        f2r = nn.relu(f2)
        endpoints["resnet2_relu"] = f2r
        f2b = _bn("resnet2_bn")(f2r)
        endpoints["resnet2_bn"] = f2b
        return endpoints[self.embedding_node], olens


class SondSelfAttention(nn.Module):
    """sond/attention.py:216 MultiHeadSelfAttention (fused q_k_v)."""

    n_head: int
    in_feat: int
    n_feat: int

    @nn.compact
    def __call__(self, x, mask):
        B, T, _ = x.shape
        d_k = self.n_feat // self.n_head
        qkv = nn.Dense(3 * self.n_feat, name="linear_q_k_v")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.n_head, d_k).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.n_head, d_k).transpose(0, 2, 3, 1)
        v = v.reshape(B, T, self.n_head, d_k).transpose(0, 2, 1, 3)
        scores = jnp.matmul(q * (d_k ** -0.5), k)
        if mask is not None:
            bad = (mask[:, None, None, :] == 0)
            scores = jnp.where(bad, jnp.finfo(jnp.float32).min, scores)
            att = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            att = jnp.where(bad, 0.0, att)
        else:
            att = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        ctx = jnp.matmul(att.astype(v.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, self.n_feat)
        return nn.Dense(self.n_feat, name="linear_out")(ctx)


class SondSANEncoder(nn.Module):
    """sond/encoder/self_attention_encoder.py:119 (linear positionwise,
    pre-norm, input_layer in {None, "pe", "linear"}, optional out_units).
    """

    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    input_layer: Optional[str] = None
    out_units: Optional[int] = None

    @nn.compact
    def __call__(self, x, ilens):
        T = x.shape[1]
        mask = (jnp.arange(T)[None, :] < ilens[:, None]).astype(
            jnp.float32)
        x = x * (self.output_size ** 0.5)
        if self.input_layer == "pe":
            x = x + sinusoidal_encoding(T, x.shape[-1],
                                        dtype=jnp.float32)[None]
        elif self.input_layer == "linear":
            x = nn.Dense(self.output_size, name="embed_0")(x)
            x = nn.LayerNorm(epsilon=1e-12, name="embed_1")(x)
            x = nn.relu(x)
            x = x + sinusoidal_encoding(T, self.output_size,
                                        dtype=jnp.float32)[None]
        elif self.input_layer == "null":
            pass  # no embed: layer 0's attention projects in->out itself
        elif self.input_layer is None:
            if self.input_size != self.output_size:
                x = nn.Dense(self.output_size, name="embed")(x)
        else:
            raise NotImplementedError(self.input_layer)
        in_size = (self.input_size
                   if self.input_layer in ("pe", "null")
                   or (self.input_layer is None
                       and self.input_size == self.output_size)
                   else self.output_size)
        for i in range(self.num_blocks):
            layer_in = in_size if i == 0 else self.output_size
            res = x
            h = nn.LayerNorm(epsilon=1e-12, name=f"l{i}_norm1")(x)
            h = SondSelfAttention(self.attention_heads, layer_in,
                                  self.output_size,
                                  name=f"l{i}_self_attn")(h, mask)
            x = (res + h) if layer_in == self.output_size else h
            res = x
            h = nn.LayerNorm(epsilon=1e-12, name=f"l{i}_norm2")(x)
            h = nn.Dense(self.linear_units, name=f"l{i}_ff_w1")(h)
            h = nn.relu(h)
            h = nn.Dense(self.output_size, name=f"l{i}_ff_w2")(h)
            x = res + h
        x = nn.LayerNorm(epsilon=1e-12, name="after_norm")(x)
        if self.out_units is not None:
            x = nn.Dense(self.out_units, name="output_linear")(x)
        return x, ilens


class SondFsmnEncoder(nn.Module):
    """sond/encoder/fsmn_encoder.py:80: [FsmnFeedForward + memory block]
    x fsmn_num_layers, then FsmnFeedForward x dnn_num_layers, optional
    1x1 out conv."""

    in_units: int
    filter_size: int = 11
    fsmn_num_layers: int = 4
    dnn_num_layers: int = 1
    num_memory_units: int = 512
    ffn_inner_dim: int = 2048
    shift: int = 0
    out_units: Optional[int] = None

    def _ffn(self, x, out_dim, name):
        h = nn.Dense(self.ffn_inner_dim, name=f"{name}_w1")(x)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-12, name=f"{name}_norm")(h)
        return nn.Dense(out_dim, use_bias=False, name=f"{name}_w2")(h)

    @nn.compact
    def __call__(self, x, ilens):
        T = x.shape[1]
        mask = (jnp.arange(T)[None, :] < ilens[:, None]).astype(
            x.dtype)[:, :, None]
        for i in range(self.fsmn_num_layers):
            ctx = self._ffn(x, self.num_memory_units, f"fsmn{i}_ffn")
            # memory block (FsmnBlock): mask -> depthwise conv -> +res
            m = ctx * mask
            left = (self.filter_size - 1) // 2 + max(self.shift, 0)
            right = self.filter_size - 1 - left
            kernel = self.param(f"fsmn{i}_mem",
                                nn.initializers.lecun_normal(),
                                (self.filter_size, 1,
                                 self.num_memory_units))
            from funasr_tpu.ops.dwconv import depthwise_conv1d

            y = depthwise_conv1d(m, kernel, left, right) + m
            y = y * mask
            x = (y + x) if (self.in_units if i == 0
                            else self.num_memory_units) \
                == self.num_memory_units else y
        for j in range(self.dnn_num_layers):
            x = self._ffn(x, self.num_memory_units, f"dnn{j}")
        if self.out_units is not None:
            x = nn.Dense(self.out_units, name="conv1d_out")(x)
        return x, ilens


class _SondNet(nn.Module):
    """prediction_forward wiring (e2e_diar_sond.py:446)."""

    speech_encoder_conf: Dict
    speaker_encoder_conf: Optional[Dict]
    cd_scorer_conf: Dict
    post_net_conf: Dict
    max_spk_num: int = 16
    ci_scorer: str = "cos"  # "cos" | "dot"
    normalize_speech_speaker: bool = False

    def setup(self):
        self.encoder = ResNet34DiarEncoder(**self.speech_encoder_conf,
                                           name="encoder")
        self.speaker_encoder = (
            SondSANEncoder(**self.speaker_encoder_conf,
                           name="speaker_encoder")
            if self.speaker_encoder_conf is not None else None)
        self.cd_scorer = SondSANEncoder(**self.cd_scorer_conf,
                                        name="cd_scorer")
        self.post_net = SondFsmnEncoder(**self.post_net_conf,
                                        name="post_net")

    def __call__(self, speech, speech_lengths, profile, profile_lengths):
        """speech (B, T, F) fbank; profile (B, N<=max_spk, D) -> PSE
        logits (B, T', V)."""
        sph, olens = self.encoder(speech, speech_lengths)
        tmask = (jnp.arange(sph.shape[1])[None, :]
                 < olens[:, None]).astype(sph.dtype)[:, :, None]
        sph = sph * tmask
        # speaker profiles (e2e_diar_sond.py:373 encode_speaker)
        N = self.max_spk_num
        pad_n = N - profile.shape[1]
        if pad_n > 0:
            profile = jnp.pad(profile, ((0, 0), (0, pad_n), (0, 0)))
        pmask = (jnp.linalg.norm(profile, axis=2, keepdims=True)
                 > 0).astype(profile.dtype)
        prof = profile / jnp.maximum(
            jnp.linalg.norm(profile, axis=2, keepdims=True), 1e-12)
        if self.speaker_encoder is not None:
            prof, _ = self.speaker_encoder(prof, profile_lengths)
            prof = prof * pmask
        # similarity (calc_similarity, e2e_diar_sond.py:413)
        B, T, Ds = sph.shape
        sphn, profn = sph, prof
        if self.normalize_speech_speaker:
            sphn = sph / jnp.maximum(
                jnp.linalg.norm(sph, axis=2, keepdims=True), 1e-12)
            profn = prof / jnp.maximum(
                jnp.linalg.norm(prof, axis=2, keepdims=True), 1e-12)
        ge = jnp.concatenate([
            jnp.broadcast_to(sphn[:, None], (B, N, T, Ds)),
            jnp.broadcast_to(profn[:, :, None],
                             (B, N, T, prof.shape[-1]))], axis=3)
        ge = ge.reshape(B * N, T, Ds + prof.shape[-1])
        ge_len = jnp.broadcast_to(olens[:, None], (B, N)).reshape(B * N)
        cd, _ = self.cd_scorer(ge, ge_len)  # (B*N, T, 1)
        cd = cd.reshape(B, N, T).transpose(0, 2, 1)  # (B, T, N)
        if self.ci_scorer == "dot":
            ci = jnp.matmul(sph, jnp.swapaxes(prof, 1, 2))
        else:  # cosine (torch F.cosine_similarity: eps=1e-8 norm floor)
            sn = sph / jnp.maximum(
                jnp.linalg.norm(sph, axis=2, keepdims=True), 1e-8)
            pn = prof / jnp.maximum(
                jnp.linalg.norm(prof, axis=2, keepdims=True), 1e-8)
            ci = jnp.matmul(sn, jnp.swapaxes(pn, 1, 2))
        simi = jnp.concatenate([cd, ci], axis=2)  # (B, T, 2N)
        logits, _ = self.post_net(simi, olens)
        return logits, olens, (ci, cd)


@tables.register("model_classes", "DiarSondModel")
class DiarSondModel:
    """Reference-architecture SOND (e2e_diar_sond.py:40).  ``token_list``
    holds the power-set codes as ints; inference decodes argmax labels to
    per-speaker binary activity via the code bits."""

    def __init__(self, token_list: List, max_spk_num: int = 16,
                 speech_encoder_conf: Optional[Dict] = None,
                 speaker_encoder_conf: Optional[Dict] = None,
                 cd_scorer_conf: Optional[Dict] = None,
                 post_net_conf: Optional[Dict] = None,
                 ci_scorer: str = "cos",
                 normalize_speech_speaker: bool = False,
                 lsm_weight: float = 0.1, params=None, **kwargs):
        self.token_list = [int(t) for t in token_list]
        self.int_tokens = np.asarray(self.token_list, np.int64)
        self.max_spk_num = max_spk_num
        self.lsm_weight = lsm_weight
        self.module = _SondNet(
            speech_encoder_conf=dict(speech_encoder_conf or {}),
            speaker_encoder_conf=(dict(speaker_encoder_conf)
                                  if speaker_encoder_conf else None),
            cd_scorer_conf=dict(cd_scorer_conf or {}),
            post_net_conf=dict(post_net_conf or {}),
            max_spk_num=max_spk_num, ci_scorer=ci_scorer,
            normalize_speech_speaker=normalize_speech_speaker)
        self.params = params
        self._jit_fwd = jax.jit(lambda p, s, sl, pr, pl: self.module.apply(
            p, s, sl, pr, pl))

    def init_params(self, rng, T: int = 32, feat_dim: int = 80,
                    profile_dim: int = 192):
        self.params = self.module.init(
            rng, jnp.zeros((1, T, feat_dim)), jnp.asarray([T], jnp.int32),
            jnp.zeros((1, self.max_spk_num, profile_dim)),
            jnp.asarray([self.max_spk_num], jnp.int32))
        return self.params

    def prediction(self, speech, speech_lengths, profile, profile_lengths):
        logits, olens, _ = self._jit_fwd(
            self.params, jnp.asarray(speech),
            jnp.asarray(speech_lengths, jnp.int32), jnp.asarray(profile),
            jnp.asarray(profile_lengths, jnp.int32))
        return np.asarray(logits), np.asarray(olens)

    def diarize(self, speech, speech_lengths, profile, profile_lengths
                ) -> List[np.ndarray]:
        """-> per-utterance (T_i, max_spk_num) binary activity from the
        PSE argmax (pse_embedding decode, e2e_diar_sond.py:126)."""
        logits, olens = self.prediction(speech, speech_lengths, profile,
                                        profile_lengths)
        out = []
        for b in range(logits.shape[0]):
            lab = logits[b, : int(olens[b])].argmax(-1)
            codes = self.int_tokens[lab]
            bits = (codes[:, None]
                    >> np.arange(self.max_spk_num)[None, :]) & 1
            out.append(bits.astype(np.float32))
        return out

    def loss(self, params, speech, speech_lengths, profile,
             profile_lengths, pse_labels):
        """Label-smoothed PSE CE (classification_loss,
        e2e_diar_sond.py:306); the speaker-discrimination and inter-score
        terms follow the reference weights when enabled."""
        logits, olens, _ = self.module.apply(
            params, jnp.asarray(speech),
            jnp.asarray(speech_lengths, jnp.int32), jnp.asarray(profile),
            jnp.asarray(profile_lengths, jnp.int32))
        V = logits.shape[-1]
        T = min(logits.shape[1], pse_labels.shape[1])
        logits = logits[:, :T]
        labels = jnp.asarray(pse_labels)[:, :T]
        valid = (jnp.arange(T)[None, :] < olens[:, None]).astype(
            jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        smooth = self.lsm_weight
        nll = -(1.0 - smooth) * jnp.take_along_axis(
            logp, labels[..., None], -1)[..., 0] \
            - smooth * jnp.mean(logp, axis=-1)
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
