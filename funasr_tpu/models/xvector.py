"""x-vector speaker embedding (reference funasr/models/xvector: TDNN stack
+ statistics pooling + segment-level linears).

Five dilated 1-D TDNN layers over (B, T, F) fbank, temporal statistics
pooling, then two segment-level Dense layers; the first segment layer's
output is the speaker embedding.  Convs are grouped into MXU-friendly
``nn.Conv`` calls; BatchNorm in ``batch_stats``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as nn

from funasr_tpu.models.eres2net import stats_pooling
from funasr_tpu.registry import tables

Dtype = Any


class _TDNN(nn.Module):
    ch: int
    kernel: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.ch, (self.kernel,), kernel_dilation=(self.dilation,),
                    padding="SAME", use_bias=True, name="conv")(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=not train, name="bn",
                            dtype=jnp.float32)(x)


@tables.register("model_classes", "XVector")
class XVector(nn.Module):
    feat_dim: int = 80
    embedding_size: int = 512
    channels: Tuple[int, ...] = (512, 512, 512, 512, 1500)
    kernels: Tuple[int, ...] = (5, 3, 3, 1, 1)
    dilations: Tuple[int, ...] = (1, 2, 3, 1, 1)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: (B, T, feat_dim) -> (B, embedding_size)."""
        x = feats
        for i, (c, k, d) in enumerate(
                zip(self.channels, self.kernels, self.dilations)):
            x = _TDNN(c, k, d, name=f"tdnn{i+1}")(x, train)
        h = stats_pooling(x)
        emb = nn.Dense(self.embedding_size, name="segment6")(h)
        # second segment layer participates in training classifiers only;
        # keeps parity with the reference head structure
        _ = nn.Dense(self.embedding_size, name="segment7")(nn.relu(emb))
        return emb
