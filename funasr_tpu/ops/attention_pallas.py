"""Pallas TPU kernel: fused masked-softmax attention.

The XLA path of the SANM/transformer encoders materializes the (B*H, T, T)
score matrix in HBM three times per layer (bf16 scores -> f32 softmax ->
bf16 weights) and inserts (B,T,H,d) <-> (B,H,T,d) layout copies around the
two attention matmuls.  For offline ASR shapes (T <= ~1k after LFR) one
(query-block, key-set) tile fits VMEM, so this kernel computes

    out[b, :, h, :] = softmax(q[b, :, h, :] @ k[b, :, h, :]^T + bias[b]) @ v

entirely on-chip per (batch, head) grid cell: the score matrix never
touches HBM and the inputs stay in their natural (B, T, H*d) layout (the
head split is a free minor-dim reshape), eliminating the transposes.

Masking: ``key_bias`` is a (B, T) float32 additive row (0 for valid keys,
-1e30 for padding), the same semantics as the XLA path's
masked_fill(-inf)->softmax (models/sanm.py masked_softmax) for utterances
with >= 1 valid frame.

Constraints honored for this sandbox's remote mosaic compiler: plain
BlockSpec-pipelined VMEM inputs only (no manual async copies), no 1D->2D
vector reshapes.  Equivalence vs. the XLA path is tested in
tests/test_attention_pallas.py (interpret mode on CPU + the encoder-level
contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_head: int):
    # block shapes: q/o (1, U, D), k/v (1, T, D); bias (1, 1, T).  Heads
    # are static 128-wide column slices of D, looped (unrolled) inside the
    # cell — mosaic requires the trailing block dims be (8, 128)-aligned,
    # which rules out size-1 head blocks.
    D = q_ref.shape[-1]
    d = D // n_head
    bias = bias_ref[0]  # (1, T) broadcasts over query rows
    for h in range(n_head):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl]  # (U, d)
        k = k_ref[0, :, sl]  # (T, d)
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (U, T) f32, never leaves HBM
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    key_bias: jnp.ndarray, n_head: int,
                    *, interpret: bool = False):
    """q: (B, U, D), k/v: (B, T, D) with D = n_head * d_head (scale
    pre-applied to q); key_bias: (B, T) f32 additive scores row (0 valid /
    -1e30 padding).  Self-attention is the U == T case.  Returns (B, U, D)
    in q.dtype."""
    B, U, D = q.shape
    T = k.shape[1]
    q_spec = pl.BlockSpec((1, U, D), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    # (B, 1, T) so the block's trailing dims equal the array's (mosaic
    # alignment rule: trailing block dims must be (8,128)-divisible or
    # equal to the array dims)
    key_bias = key_bias[:, None, :]
    bias_spec = pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    flops = 2 * 2 * U * T * D  # two matmuls per cell across heads
    return pl.pallas_call(
        functools.partial(_attn_kernel, n_head=n_head),
        grid=(B,),
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, U, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops * B, transcendentals=U * T * B * n_head,
            bytes_accessed=(B * U * D * 2 + 2 * B * T * D)
            * q.dtype.itemsize),
        interpret=interpret,
    )(q, k, v, key_bias)


def enabled() -> bool:
    """Kernel path is on for real TPU backends (off on CPU, where tests
    exercise the XLA path; set FUNASR_TPU_DISABLE_PALLAS_ATTN=1 to force
    the XLA path everywhere)."""
    import os

    if os.environ.get("FUNASR_TPU_DISABLE_PALLAS_ATTN"):
        return False
    return jax.devices()[0].platform != "cpu"


def supported(Tq: int, d_head: int, dtype, attn_mask,
              Tk: int = None) -> bool:
    """Shape/config gate for the kernel path: bf16/f32 inputs, no per-query
    structure mask, head dim a lane multiple, query/key frame counts
    sublane multiples that keep the (Tq, Tk) f32 tile in VMEM."""
    if attn_mask is not None:
        return False
    if d_head % 128 != 0:
        return False
    for t in (Tq, Tq if Tk is None else Tk):
        if t % 16 != 0 or t > 1024:
            return False
    return dtype in (jnp.bfloat16, jnp.float32)
