"""Pallas TPU kernel: fused position-wise FFN (w_2(relu(w_1(x)))).

XLA fuses the bias+relu into the first matmul, but it cannot avoid
materializing the (M, H) hidden activations in HBM between the two matmuls
— for the flagship encoder shape (M = 64x384 rows, H = 2048, bf16) that is
~96 MB written + read per layer, x50 layers, ~16% of encoder time.  This
kernel keeps the hidden tile in VMEM: per M-tile it computes

    out = relu(x @ W1 + b1) @ W2 + b2

with both weight stripes resident across the grid (index_map pinned to
block 0, fetched once), so HBM traffic is exactly one read of x and one
write of out.

An int8 variant quantizes the activation rows in VMEM (dynamic per-row
scales, per-channel weight scales pre-computed outside) and runs both
contractions on the int8 MXU (~1.8x bf16) — the quantization costs no HBM
traffic, unlike the XLA dynamic-quant formulation (ops/quant.py).

Inference-path kernel: the flax modules route through it only when the
surrounding dropout is off; training uses the XLA path (autodiff).
Sandbox constraints honored: BlockSpec-pipelined VMEM inputs only, no
1D->2D vector reshapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIMS = (((1,), (0,)), ((), ()))


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    h = jax.lax.dot_general(x_ref[:], w1_ref[:], _DIMS,
                            preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0).astype(x_ref.dtype)
    o = jax.lax.dot_general(h, w2_ref[:], _DIMS,
                            preferred_element_type=jnp.float32)
    o_ref[:] = (o + b2_ref[:]).astype(o_ref.dtype)


from funasr_tpu.ops.quant import rowquant_kernel as _rowquant  # noqa: E402


def _ffn_kernel_int8(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                     o_ref):
    q, s = _rowquant(x_ref[:].astype(jnp.float32))
    h = jax.lax.dot_general(q, w1_ref[:], _DIMS,
                            preferred_element_type=jnp.int32)
    h = jnp.maximum(h.astype(jnp.float32) * s * s1_ref[:] + b1_ref[:], 0.0)
    q2, s2 = _rowquant(h)
    o = jax.lax.dot_general(q2, w2_ref[:], _DIMS,
                            preferred_element_type=jnp.int32)
    o_ref[:] = (o.astype(jnp.float32) * s2 * s2_ref[:]
                + b2_ref[:]).astype(o_ref.dtype)


def _pick_tm(M: int, K: int, H: int, N: int, wgt_itemsize: int,
             act_itemsize: int = 2) -> int:
    budget = 13 * 1024 * 1024
    wgt = K * H * wgt_itemsize + H * N * wgt_itemsize + (H + N) * 4
    for tm in (1024, 512, 256, 128):
        if M % tm:
            continue
        stream = 2 * tm * (K + N) * act_itemsize  # double-buffered x/out
        hidden = tm * H * 4                       # f32 hidden tile
        if wgt + stream + hidden <= budget:
            return tm
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ffn_call(x2, w1, b1, w2, b2, *, interpret: bool = False):
    M, K = x2.shape
    H = w1.shape[1]
    N = w2.shape[1]
    TM = _pick_tm(M, K, H, N, x2.dtype.itemsize,
                  x2.dtype.itemsize)
    row = lambda m: (0, 0)
    return pl.pallas_call(
        _ffn_kernel,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * H + 2 * M * H * N, transcendentals=0,
            bytes_accessed=(M * K + M * N + K * H + H * N) * 2),
        interpret=interpret,
    )(x2, w1, b1, w2, b2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ffn_call_int8(x2, w1q, s1, b1, w2q, s2, b2, *, interpret: bool = False):
    M, K = x2.shape
    H = w1q.shape[1]
    N = w2q.shape[1]
    TM = _pick_tm(M, K, H, N, 1, x2.dtype.itemsize)
    row = lambda m: (0, 0)
    return pl.pallas_call(
        _ffn_kernel_int8,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), row, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * H + 2 * M * H * N, transcendentals=0,
            bytes_accessed=M * K * 2 + M * N * 2 + K * H + H * N),
        interpret=interpret,
    )(x2, w1q, s1, b1, w2q, s2, b2)


def enabled() -> bool:
    """On for real TPU backends (FUNASR_TPU_DISABLE_PALLAS_FFN=1 forces the
    XLA path everywhere)."""
    if os.environ.get("FUNASR_TPU_DISABLE_PALLAS_FFN"):
        return False
    return jax.devices()[0].platform != "cpu"


def supported(m: int, k: int, h: int, n: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if k % 128 or h % 128 or n % 128 or m % 128 or m < 128:
        return False
    return _pick_tm(m, k, h, n, itemsize, itemsize) > 0


def fused_ffn(x, w1, b1, w2, b2, *, int8: bool = False,
              interpret: bool = False):
    """x (..., K) -> relu(x @ w1 + b1) @ w2 + b2, hidden kept in VMEM.

    ``int8``: dynamic per-row activation quant + per-channel weight quant
    on both contractions (the serving ``quantize=True`` path).
    """
    *lead, K = x.shape
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    b1 = b1.reshape(1, -1).astype(jnp.float32)
    b2 = b2.reshape(1, -1).astype(jnp.float32)
    if int8:
        from funasr_tpu.ops.quant import quantize_rows

        w1q, s1 = quantize_rows(w1, axis=0)
        w2q, s2 = quantize_rows(w2, axis=0)
        out = _ffn_call_int8(x2, w1q, s1, b1, w2q, s2, b2,
                             interpret=interpret)
    else:
        dt = x.dtype
        out = _ffn_call(x2, w1.astype(dt), b1, w2.astype(dt), b2,
                        interpret=interpret)
    return out.reshape(*lead, w2.shape[1])
