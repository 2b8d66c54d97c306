"""CAM++ speaker embedding model (reference funasr/models/campplus/
model.py:38 ``CAMPPlus``, components.py).

D-TDNN with context-aware masking: FCM (2D residual front-end over the mel
axis) -> TDNN -> three dense blocks of CAM-TDNN layers (dense concatenation,
growth 32) with transit layers -> stats pooling -> 192-d embedding.

Layout: channel-last everywhere ((B, T, C); FCM uses (B, F, T, C) NHWC), so
convs are ``lax.conv_general_dilated`` NHC/NHWC and matmuls hit the MXU.
BatchNorm runs with running stats (``batch_stats`` collection) — this model
is used inference-only for diarization embeddings.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.registry import tables

Dtype = Any


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, name="bn",
                            dtype=jnp.float32)(x)


def conv1d(x, features, kernel, stride=1, dilation=1, bias=False, name=None):
    return nn.Conv(features, (kernel,), strides=(stride,),
                   kernel_dilation=(dilation,),
                   padding=[( (kernel - 1) // 2 * dilation,) * 2] if kernel > 1 else "VALID",
                   use_bias=bias, name=name)(x)


class BasicResBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, F, T, C); stride applies to the F axis only."""
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, 1),
                    padding=1, use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=(1, 1), padding=1,
                    use_bias=False, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2",
                         dtype=jnp.float32)(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, 1),
                         use_bias=False, name="shortcut_conv")(x)
            sc = nn.BatchNorm(use_running_average=not train,
                              name="shortcut_bn", dtype=jnp.float32)(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class FCM(nn.Module):
    m_channels: int = 32
    feat_dim: int = 80

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, feat_dim) -> (B, T, m_channels * feat_dim//8)."""
        h = jnp.swapaxes(x, 1, 2)[..., None]  # (B, F, T, 1)
        h = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=jnp.float32)(h)
        h = nn.relu(h)
        for i, stride in enumerate([2, 1]):
            h = BasicResBlock(self.m_channels, stride, name=f"layer1_{i}")(h, train)
        for i, stride in enumerate([2, 1]):
            h = BasicResBlock(self.m_channels, stride, name=f"layer2_{i}")(h, train)
        h = nn.Conv(self.m_channels, (3, 3), strides=(2, 1), padding=1,
                    use_bias=False, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2",
                         dtype=jnp.float32)(h)
        h = nn.relu(h)
        B, F_, T, C = h.shape
        # channel-major flatten (torch reshape(B, C*F, T), components.py:76):
        # feature index = c * F + f
        return jnp.transpose(h, (0, 2, 3, 1)).reshape(B, T, C * F_)


class CAMLayer(nn.Module):
    bn_channels: int
    out_channels: int
    kernel: int
    dilation: int
    reduction: int = 2
    seg_len: int = 100

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, T, bn_channels)."""
        y = conv1d(x, self.out_channels, self.kernel,
                   dilation=self.dilation, name="linear_local")
        glob = jnp.mean(x, axis=1, keepdims=True)  # (B, 1, C)
        # segment pooling: mean over 100-frame segments, broadcast back.
        # The tail segment averages over its ACTUAL length (the reference
        # uses avg_pool1d(ceil_mode=True), components.py:172-175), so the
        # zero-padded sum is divided by the true per-segment frame count.
        B, T, C = x.shape
        pad = (-T) % self.seg_len
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        nseg = xp.shape[1] // self.seg_len
        counts = jnp.clip(T - jnp.arange(nseg) * self.seg_len, 1, self.seg_len)
        seg = (xp.reshape(B, nseg, self.seg_len, C).sum(axis=2)
               / counts[None, :, None])
        seg = jnp.repeat(seg, self.seg_len, axis=1)[:, :T]
        context = glob + seg
        m = nn.relu(nn.Conv(self.bn_channels // self.reduction, (1,),
                            name="linear1")(context))
        m = nn.sigmoid(nn.Conv(self.out_channels, (1,), name="linear2")(m))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    out_channels: int
    bn_channels: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=jnp.float32)(x)
        h = nn.relu(h)
        h = conv1d(h, self.bn_channels, 1, name="linear1")
        h = nn.BatchNorm(use_running_average=not train, name="bn2",
                         dtype=jnp.float32)(h)
        h = nn.relu(h)
        return CAMLayer(self.bn_channels, self.out_channels, self.kernel,
                        self.dilation, name="cam_layer")(h, train)


@tables.register("model_classes", "CAMPPlus")
class CAMPPlus(nn.Module):
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    blocks: Tuple[Tuple[int, int, int], ...] = ((12, 3, 1), (24, 3, 2), (16, 3, 2))

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: (B, T, feat_dim) fbank -> (B, embedding_size)."""
        x = FCM(feat_dim=self.feat_dim, name="head")(feats, train)
        # tdnn: kernel 5, stride 2
        x = nn.Conv(self.init_channels, (5,), strides=(2,), padding=2,
                    use_bias=False, name="tdnn_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="tdnn_bn",
                         dtype=jnp.float32)(x)
        x = nn.relu(x)
        for bi, (num_layers, kernel, dilation) in enumerate(self.blocks):
            for li in range(num_layers):
                y = CAMDenseTDNNLayer(
                    self.growth_rate, self.bn_size * self.growth_rate,
                    kernel, dilation, name=f"block{bi+1}_tdnnd{li+1}",
                )(x, train)
                x = jnp.concatenate([x, y], axis=-1)
            # transit: BN-relu + 1x1 conv halving channels
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"transit{bi+1}_bn", dtype=jnp.float32)(x)
            x = nn.relu(x)
            x = conv1d(x, x.shape[-1] // 2, 1, bias=False,
                       name=f"transit{bi+1}_linear")
        x = nn.BatchNorm(use_running_average=not train, name="out_bn",
                         dtype=jnp.float32)(x)
        x = nn.relu(x)
        # stats pooling over time (unbiased std, eps like the reference)
        mean = jnp.mean(x, axis=1)
        var = jnp.var(x, axis=1, ddof=1)
        std = jnp.sqrt(jnp.maximum(var, 1e-10))
        stats = jnp.concatenate([mean, std], axis=-1)
        emb = nn.Dense(self.embedding_size, use_bias=False,
                       name="dense_linear")(stats)
        emb = nn.BatchNorm(use_running_average=not train, use_bias=False,
                           use_scale=False, name="dense_bn",
                           dtype=jnp.float32)(emb)
        return emb
