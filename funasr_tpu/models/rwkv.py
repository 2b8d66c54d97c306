"""RWKV encoder + BAT (boundary-aware transducer) variants (reference
funasr/models/rwkv_bat/ — RWKV time-mix/channel-mix blocks as the
transducer encoder; funasr/models/bat is the boundary-aware transducer).

The WKV linear-attention recurrence is a numerically-stabilized
``lax.scan`` over time (running log-sum-exp state per channel) — O(T)
state instead of O(T^2) attention, the RWKV trade.  Channel mixing and the
projections are plain MXU matmuls.  Blocks stack under ``nn.scan``.

BAT here = the Transducer model body with this RWKV encoder (the
reference's blank-skip/pruned-lattice loss is a training-cost
optimization over the same architecture; the scan-based full-lattice loss
in funasr_tpu/ops/rnnt.py remains the objective).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from funasr_tpu.models.sanm import LayerNormF32
from funasr_tpu.models.transducer.model import Transducer
from funasr_tpu.registry import tables

Dtype = Any


def wkv_scan(k: jnp.ndarray, v: jnp.ndarray, w: jnp.ndarray,
             u: jnp.ndarray) -> jnp.ndarray:
    """RWKV WKV recurrence. k, v: (B, T, C); w (decay, >0), u: (C,).

    Returns (B, T, C).  Stabilized with a running max exponent (pp).
    """
    B, T, C = k.shape

    def step(state, kv):
        aa, bb, pp = state
        kt, vt = kv
        ww = u + kt
        p = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - p)
        e2 = jnp.exp(ww - p)
        out = (e1 * aa + e2 * vt) / (e1 * bb + e2)
        ww2 = pp - w
        p2 = jnp.maximum(ww2, kt)
        e1 = jnp.exp(ww2 - p2)
        e2 = jnp.exp(kt - p2)
        return (e1 * aa + e2 * vt, e1 * bb + e2, p2), out

    init = (jnp.zeros((B, C)), jnp.zeros((B, C)),
            jnp.full((B, C), -1e30))
    _, out = lax.scan(step, init, (jnp.moveaxis(k, 1, 0),
                                   jnp.moveaxis(v, 1, 0)))
    return jnp.moveaxis(out, 0, 1)


def _token_shift(x: jnp.ndarray) -> jnp.ndarray:
    """x_{t-1} (zeros at t=0) — RWKV's 1-step temporal shift."""
    return jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]


class TimeMix(nn.Module):
    dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        prev = _token_shift(xf)
        mu_k = self.param("mu_k", nn.initializers.uniform(1.0), (self.dim,))
        mu_v = self.param("mu_v", nn.initializers.uniform(1.0), (self.dim,))
        mu_r = self.param("mu_r", nn.initializers.uniform(1.0), (self.dim,))
        xk = xf * mu_k + prev * (1 - mu_k)
        xv = xf * mu_v + prev * (1 - mu_v)
        xr = xf * mu_r + prev * (1 - mu_r)
        k = nn.Dense(self.dim, use_bias=False, name="key")(xk)
        v = nn.Dense(self.dim, use_bias=False, name="value")(xv)
        r = nn.sigmoid(nn.Dense(self.dim, use_bias=False, name="recept")(xr))
        decay = self.param("time_decay", nn.initializers.zeros, (self.dim,))
        u = self.param("time_first", nn.initializers.zeros, (self.dim,))
        wkv = wkv_scan(k, v, jnp.exp(decay), u)
        return nn.Dense(self.dim, use_bias=False, name="output")(r * wkv)


class ChannelMix(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        xf = x.astype(jnp.float32)
        prev = _token_shift(xf)
        mu_k = self.param("mu_k", nn.initializers.uniform(1.0), (self.dim,))
        mu_r = self.param("mu_r", nn.initializers.uniform(1.0), (self.dim,))
        xk = xf * mu_k + prev * (1 - mu_k)
        xr = xf * mu_r + prev * (1 - mu_r)
        k = nn.Dense(self.hidden, use_bias=False, name="key")(xk)
        k = jnp.square(nn.relu(k))
        r = nn.sigmoid(nn.Dense(self.dim, use_bias=False, name="recept")(xr))
        return r * nn.Dense(self.dim, use_bias=False, name="value")(k)


class RWKVBlock(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x, _inputs, deterministic: bool = True):
        h = LayerNormF32(jnp.float32, jnp.float32, name="ln1")(x)
        x = x + TimeMix(self.dim, name="att")(h)
        h = LayerNormF32(jnp.float32, jnp.float32, name="ln2")(x)
        x = x + ChannelMix(self.dim, self.hidden, name="ffn")(h)
        return x, None


@tables.register("encoder_classes", "RWKVEncoder")
class RWKVEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    num_blocks: int = 6
    linear_units: int = 1024
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, lengths, deterministic: bool = True):
        x = nn.Dense(self.output_size, name="embed")(
            xs.astype(jnp.float32))
        x = LayerNormF32(jnp.float32, jnp.float32, name="ln_in")(x)
        Stack = nn.scan(
            RWKVBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_blocks,
            in_axes=(nn.broadcast, nn.broadcast),
        )
        x, _ = Stack(self.output_size, self.linear_units, name="blocks")(
            x, None, deterministic)
        x = LayerNormF32(jnp.float32, jnp.float32, name="ln_out")(x)
        return x.astype(self.dtype), lengths


@tables.register("model_classes", "BAT")
@tables.register("model_classes", "RWKVBAT")
class RWKVBAT(Transducer):
    """Transducer with the RWKV encoder (causal linear-attention — the
    streaming-friendly BAT encoder)."""

    def make_encoder(self):
        conf = dict(self.encoder_conf or {})
        for k in ("attention_heads", "cnn_module_kernel",
                  "attention_dropout_rate", "dropout_rate", "input_layer"):
            conf.pop(k, None)
        return RWKVEncoder(input_size=self.input_size, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="encoder",
                           **conf)
