"""ERes2Net speaker-embedding model (reference funasr/models/eres2net/
ERes2Net.py: Res2Net blocks + attentional local feature fusion + temporal
statistics pooling).

Input is (B, T, F) fbank treated as a 1-channel 2D map (NHWC: time x mel);
four stages of Res2Net blocks (channel widths m, 2m, 4m, 8m, stride-2
downsampling from stage 2), bottom-up attentional feature fusion (AFF)
between consecutive stage outputs, then temporal statistics pooling and a
linear embedding head.

TPU notes: all convs are NHWC ``nn.Conv`` (XLA lowers to MXU convolutions);
BatchNorm stats live in ``batch_stats``; the Res2Net hierarchical split is
a static unroll over ``scale`` groups (compile-time constant).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.registry import tables

Dtype = Any


class _ConvBN(nn.Module):
    ch: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.ch, self.kernel, strides=self.stride, padding="SAME",
                    use_bias=False, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, name="bn",
                            dtype=jnp.float32)(x)


class Res2NetBlock(nn.Module):
    """BasicBlockERes2Net: 1x1 reduce -> hierarchical 3x3 group convs
    (Res2Net) -> 1x1 expand, residual with projection on stride/width
    change."""

    ch: int
    stride: int = 1
    scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.ch // self.scale
        h = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, name="reduce")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=jnp.float32)(h)
        h = nn.relu(h)
        groups = jnp.split(h, self.scale, axis=-1)
        outs = []
        prev = None
        for i, g in enumerate(groups):
            if i == 0:
                outs.append(g)
                prev = None
                continue
            inp = g if prev is None else g + prev
            o = _ConvBN(width, name=f"conv{i}")(inp, train)
            o = nn.relu(o)
            outs.append(o)
            prev = o
        h = jnp.concatenate(outs, axis=-1)
        h = nn.Conv(self.ch, (1, 1), use_bias=False, name="expand")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn3",
                         dtype=jnp.float32)(h)
        if x.shape[-1] != self.ch or self.stride != 1:
            x = _ConvBN(self.ch, (1, 1), (self.stride, self.stride),
                        name="shortcut")(x, train)
        return nn.relu(h + x)


class AFF(nn.Module):
    """Attentional feature fusion (fusion.py AFF): gate = MLP over the sum;
    out = gate * a + (1 - gate) * b."""

    ch: int
    r: int = 4

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        s = a + b
        g = nn.Conv(max(1, self.ch // self.r), (1, 1), name="att1")(s)
        g = nn.BatchNorm(use_running_average=not train, name="bn",
                         dtype=jnp.float32)(g)
        g = nn.relu(g)
        g = nn.Conv(self.ch, (1, 1), name="att2")(g)
        g = nn.sigmoid(g)
        return a * g + b * (1.0 - g)


def stats_pooling(x: jnp.ndarray) -> jnp.ndarray:
    """Temporal statistics pooling over axis 1: concat(mean, std)."""
    mean = jnp.mean(x, axis=1)
    var = jnp.maximum(jnp.mean(jnp.square(x), axis=1) - jnp.square(mean), 1e-7)
    return jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)


@tables.register("model_classes", "ERes2Net")
class ERes2Net(nn.Module):
    feat_dim: int = 80
    embedding_size: int = 192
    m_channels: int = 32
    scale: int = 2
    layers: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: (B, T, feat_dim) -> (B, embedding_size)."""
        x = feats[..., None]  # (B, T, F, 1)
        x = _ConvBN(self.m_channels, name="stem")(x, train)
        x = nn.relu(x)
        stage_outs = []
        for si, n_blocks in enumerate(self.layers):
            ch = self.m_channels * (2 ** si)
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                x = Res2NetBlock(ch, stride if bi == 0 else 1, self.scale,
                                 name=f"layer{si+1}_block{bi+1}")(x, train)
            stage_outs.append(x)
        # bottom-up local feature fusion: downsample earlier stage output and
        # fuse with the next (ERes2Net.py forward: fuse_out12/123/1234)
        fused = stage_outs[0]
        for si in range(1, len(stage_outs)):
            ch = stage_outs[si].shape[-1]
            down = _ConvBN(ch, (3, 3), (2, 2), name=f"down{si}")(fused, train)
            down = nn.relu(down)
            fused = AFF(ch, name=f"fuse{si}")(stage_outs[si], down, train)
        B, T, F, C = fused.shape
        h = fused.reshape(B, T, F * C)
        h = stats_pooling(h)
        return nn.Dense(self.embedding_size, name="embedding")(h)
