"""ERes2Net speaker-embedding model (reference funasr/models/eres2net/
eres2net.py + fusion.py, 3D-Speaker): Res2Net blocks (expansion 2, all
scale groups convolved), attentional feature fusion (AFF) both inside the
layer3/4 blocks and bottom-up between stage outputs, temporal statistics
pooling (unbiased variance), and a linear embedding head.

Layout: the (B, T, F) fbank map runs as NHWC with H=F (mel) and W=T, the
transpose of the reference's (B, 1, F, T) NCHW — kernel weights convert
with a plain (out,in,kh,kw)->(kh,kw,in,out) permutation.

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
        # explicit torch-style padding (k-1)//2 per side: "SAME" with
        # stride 2 pads asymmetrically and shifts every window vs torch
        pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel)
        x = nn.Conv(self.ch, self.kernel, strides=self.stride, padding=pad,
                    use_bias=False, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, name="bn",
                            dtype=jnp.float32)(x)


class AFF(nn.Module):
    """Attentional feature fusion (reference fusion.py:8): the gate comes
    from a Conv(2C->C/r) -> BN -> SiLU -> Conv(C/r->C) -> BN stack over the
    CONCATENATION of the two inputs; att = 1 + tanh(...) in (0, 2) and
    out = x * att + ds_y * (2 - att)."""

    ch: int
    r: int = 4

    @nn.compact
    def __call__(self, x, ds_y, train: bool = False):
        xa = jnp.concatenate([x, ds_y], axis=-1)
        h = nn.Conv(max(1, self.ch // self.r), (1, 1), name="att1")(xa)
        h = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Conv(self.ch, (1, 1), name="att2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2",
                         dtype=jnp.float32)(h)
        att = 1.0 + jnp.tanh(h)
        return x * att + ds_y * (2.0 - att)


class Res2NetBlock(nn.Module):
    """BasicBlockERes2Net / BasicBlockERes2Net_diff_AFF (reference
    eres2net.py:43,105): 1x1 reduce to width*scale -> hierarchical 3x3
    group convs where EVERY group is convolved (group i>0 merges the
    previous group's output by sum, or by an intra-block AFF when
    ``use_aff``) -> 1x1 expand to planes*EXPANSION(=2), projected residual.
    """

    planes: int
    stride: int = 1
    scale: int = 2
    base_width: int = 32
    use_aff: bool = False
    EXPANSION: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * self.base_width / 64.0)
        h = nn.Conv(width * self.scale, (1, 1),
                    strides=(self.stride, self.stride),
                    use_bias=False, name="reduce")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1",
                         dtype=jnp.float32)(h)
        h = nn.relu(h)
        groups = jnp.split(h, self.scale, axis=-1)
        outs = []
        sp = None
        for i, g in enumerate(groups):
            if i == 0:
                sp = g
            elif self.use_aff:
                sp = AFF(width, name=f"fuse{i-1}")(sp, g, train)
            else:
                sp = sp + g
            sp = _ConvBN(width, name=f"conv{i}")(sp, train)
            sp = nn.relu(sp)
            outs.append(sp)
        h = jnp.concatenate(outs, axis=-1)
        out_ch = self.planes * self.EXPANSION
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="expand")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn3",
                         dtype=jnp.float32)(h)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = _ConvBN(out_ch, (1, 1), (self.stride, self.stride),
                        name="shortcut")(x, train)
        return nn.relu(h + x)


def stats_pooling(x: jnp.ndarray) -> jnp.ndarray:
    """Temporal statistics pooling over axis 1: concat(mean, std) with the
    reference TSTP's UNBIASED variance + 1e-8 (pooling_layers.py:53)."""
    T = x.shape[1]
    mean = jnp.mean(x, axis=1)
    ss = jnp.sum(jnp.square(x - mean[:, None]), axis=1)
    var = ss / jnp.maximum(T - 1, 1)
    return jnp.concatenate([mean, jnp.sqrt(var + 1e-8)], axis=-1)


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
        m = self.m_channels
        # NHWC with H=F, W=T (transpose of the reference's (B,1,F,T))
        x = jnp.swapaxes(feats, 1, 2)[..., None]  # (B, F, T, 1)
        x = _ConvBN(m, name="stem")(x, train)
        x = nn.relu(x)
        stage_outs = []
        n_aff_from = 2  # layer3/layer4 use the intra-block AFF variant
        for si, n_blocks in enumerate(self.layers):
            planes = m * (2 ** si)
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                x = Res2NetBlock(planes, stride if bi == 0 else 1, self.scale,
                                 use_aff=(si >= n_aff_from),
                                 name=f"layer{si+1}_block{bi+1}")(x, train)
            stage_outs.append(x)  # channels = planes * 2
        # bottom-up fusion (eres2net.py:239-246): bare stride-2 conv (no
        # norm/activation) into an AFF with the next stage's output
        fused = stage_outs[0]
        for si in range(1, len(stage_outs)):
            ch = stage_outs[si].shape[-1]
            down = nn.Conv(ch, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)),
                           use_bias=False, name=f"down{si}")(fused)
            fused = AFF(ch, name=f"fuse{si}")(stage_outs[si], down, train)
        # TSTP: stats over TIME per (C, F'), flattened CHANNEL-major
        # (c*F+f) like the torch (B, C, F, T) flatten
        B, Fr, T, C = fused.shape
        h = jnp.transpose(fused, (0, 2, 3, 1)).reshape(B, T, C * Fr)
        h = stats_pooling(h)
        return nn.Dense(self.embedding_size, name="embedding")(h)
