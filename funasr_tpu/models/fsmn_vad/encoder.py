"""FSMN scorer network for VAD (reference
funasr/models/fsmn_vad_streaming/encoder.py:200 ``FSMN``).

Structure: affine -> affine -> relu -> [linear -> depthwise memory conv ->
affine -> relu] x L -> affine -> affine -> softmax.  The memory block is a
causal depthwise conv over ``lorder`` past frames (+ optional ``rorder``
future frames), exactly the shape XLA fuses well; streaming keeps an
``(lorder-1)`` frame cache per layer as an explicit pytree.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.registry import tables

Dtype = Any


class FsmnBasicBlock(nn.Module):
    linear_dim: int
    proj_dim: int
    lorder: int
    rorder: int
    lstride: int = 1
    rstride: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Optional[jnp.ndarray] = None):
        """x: (B, T, linear_dim); cache: (B, (lorder-1)*lstride, proj_dim)."""
        p = nn.Dense(self.proj_dim, use_bias=False, name="linear",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        left_hist = (self.lorder - 1) * self.lstride
        if cache is not None:
            ctx = jnp.concatenate([cache.astype(p.dtype), p], axis=1)
            new_cache = ctx[:, -left_hist:, :] if left_hist > 0 else cache
            pad_left = 0
        else:
            ctx = p
            new_cache = None
            pad_left = left_hist
        kernel_l = self.param(
            "conv_left", nn.initializers.lecun_normal(),
            (self.lorder, 1, self.proj_dim), self.param_dtype,
        )
        from funasr_tpu.ops.dwconv import conv1d_grouped

        mem = conv1d_grouped(ctx.astype(p.dtype), kernel_l, pad_left, 0,
                             self.proj_dim, self.lstride)
        out = p + mem
        if self.rorder > 0:
            kernel_r = self.param(
                "conv_right", nn.initializers.lecun_normal(),
                (self.rorder, 1, self.proj_dim), self.param_dtype,
            )
            # right context: frames t+rstride .. t+rorder*rstride
            shifted = jnp.pad(p, ((0, 0), (0, self.rorder * self.rstride), (0, 0)))
            shifted = shifted[:, self.rstride:, :]
            mem_r = conv1d_grouped(shifted.astype(p.dtype), kernel_r,
                                   0, 0, self.proj_dim, self.rstride)
            out = out + mem_r[:, : out.shape[1], :]
        h = nn.Dense(self.linear_dim, name="affine",
                     dtype=self.dtype, param_dtype=self.param_dtype)(out)
        return nn.relu(h), new_cache


@tables.register("encoder_classes", "FSMN")
class FSMN(nn.Module):
    input_dim: int
    input_affine_dim: int
    fsmn_layers: int
    linear_dim: int
    proj_dim: int
    lorder: int
    rorder: int
    lstride: int
    rstride: int
    output_affine_dim: int
    output_dim: int
    use_softmax: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cache: Optional[List[jnp.ndarray]] = None):
        """x: (B, T, input_dim) -> (B, T, output_dim) state posteriors.

        cache: list of per-layer (B, (lorder-1)*lstride, proj_dim) tensors
        for streaming, or None for full-utterance scoring.
        """
        h = nn.Dense(self.input_affine_dim, name="in_linear1",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = nn.Dense(self.linear_dim, name="in_linear2",
                     dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = nn.relu(h)
        new_caches = []
        for i in range(self.fsmn_layers):
            c = cache[i] if cache is not None else None
            h, nc = FsmnBasicBlock(
                self.linear_dim, self.proj_dim, self.lorder, self.rorder,
                self.lstride, self.rstride, self.dtype, self.param_dtype,
                name=f"fsmn_{i}",
            )(h, c)
            new_caches.append(nc)
        h = nn.Dense(self.output_affine_dim, name="out_linear1",
                     dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = nn.Dense(self.output_dim, name="out_linear2",
                     dtype=self.dtype, param_dtype=self.param_dtype)(h)
        if self.use_softmax:
            h = nn.softmax(h.astype(jnp.float32), axis=-1)
        if cache is not None:
            return h, new_caches
        return h

    def init_cache(self, batch_size: int = 1):
        left_hist = (self.lorder - 1) * self.lstride
        return [
            jnp.zeros((batch_size, left_hist, self.proj_dim), jnp.float32)
            for _ in range(self.fsmn_layers)
        ]
