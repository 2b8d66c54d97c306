"""Pallas TPU kernel: fused dynamic-int8 matmul.

The XLA formulation of dynamic quantization (ops/quant.py
``int8_dot_general``) loses its MXU win to memory traffic: the per-row
absmax is one full pass over the activations and the round/clip/store is a
second, so the ~1.8x int8 MXU speedup is spent re-reading activations
(measured: (16k,512)x(512,2048) bf16 0.174 ms, int8-pre 0.095 ms, XLA
dynamic 0.188 ms).

This kernel keeps the whole recipe on-chip: each (TM, K) activation tile is
read from HBM once, row-quantized in VMEM at the first N-step of the grid
(scales + int8 values stashed in scratch, reused by every N-tile), then fed
to int8 x int8 -> int32 MXU dots against pre-quantized per-channel weights;
the (row scale x column scale) rescale fuses into the output write.  One
activation read, one output write — the quantization itself costs no HBM
traffic.

Weights are quantized per output channel with plain XLA ops in the wrapper
(loop-invariant: XLA hoists it in serving loops; otherwise it is one cheap
elementwise pass over the weights per forward).

Sandbox constraints honored: BlockSpec-pipelined VMEM inputs + scratch only
(no manual async copies), no 1D->2D vector reshapes (scales are kept 2D).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, w_ref, sw_ref, o_ref, q_scr, s_scr):
    """Blocks: x (TM, K) float, w (K, TN) int8, sw (1, TN) f32,
    o (TM, TN); scratch q (TM, K) int8, s (TM, 128) f32 (scale replicated
    across lanes so every store/load stays (8,128)-tileable)."""

    @pl.when(pl.program_id(1) == 0)
    def _quantize_rows():
        from funasr_tpu.ops.quant import rowquant_kernel

        q, scale = rowquant_kernel(x_ref[:].astype(jnp.float32))
        q_scr[:] = q
        s_scr[:] = jnp.broadcast_to(scale, s_scr.shape)

    acc = jax.lax.dot_general(
        q_scr[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (TM, TN) int32
    out = acc.astype(jnp.float32) * s_scr[:, :1] * sw_ref[:]
    o_ref[:] = out.astype(o_ref.dtype)


def _pick_tiles(M: int, K: int, N: int, itemsize: int = 2):
    """Largest tiles that fit the VMEM budget: per-grid-step overhead
    dominates below ~2k tiles (measured sweep: (2048, 2048) 0.138 ms vs
    (256, 512) 0.257 ms on (16k, 512, 2048)), so go as big as fits.
    ``itemsize`` is the activation/output element size (4 for float32)."""
    TN = N if N <= 2048 else 1024  # N <= 2048: a single n-step per row tile
    budget = 14 * 1024 * 1024
    for TM in (2048, 1024, 512, 256, 128):
        if M % TM:
            continue
        # pipelined blocks are double-buffered; scratch is single
        stream = TM * K * itemsize + K * TN + TN * 4 + TM * TN * itemsize
        scratch = TM * K + TM * 512
        if 2 * stream + scratch <= budget:
            return TM, TN
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _qmm(x2, w8, s_w, *, interpret: bool = False):
    """x2 (M, K) float, w8 (K, N) int8, s_w (1, N) f32 -> (M, N) x2.dtype.
    M % TM == 0, K % 128 == 0, N % TN == 0 guaranteed by the caller."""
    M, K = x2.shape
    N = w8.shape[1]
    TM, TN = _pick_tiles(M, K, N, x2.dtype.itemsize)
    grid = (M // TM, N // TN)
    return pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, K), lambda m, n: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda m, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda m, n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda m, n: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((TM, K), jnp.int8),
            pltpu.VMEM((TM, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            transcendentals=0,
            bytes_accessed=M * K * x2.dtype.itemsize + K * N
            + M * N * x2.dtype.itemsize,
        ),
        interpret=interpret,
    )(x2, w8, s_w)


def enabled() -> bool:
    """Opt-in (FUNASR_TPU_PALLAS_QMM=1) and TPU-only.  Standalone the
    kernel beats the XLA bf16 dot (0.138 vs 0.185 ms on (16k,512,2048)),
    but inside encoder stacks it displaces XLA's bias/relu epilogue
    fusions and loses more than the MXU gains; the default int8 path is
    the shape-gated XLA dynamic quant in ops/quant.py."""
    if os.environ.get("FUNASR_TPU_PALLAS_QMM") != "1":
        return False
    return jax.devices()[0].platform != "cpu"


def supported(m: int, k: int, n: int, itemsize: int = 2) -> bool:
    """Shape gate: row tiles and the full-K stripe must tile VMEM cleanly.
    K capped so (TM, K) bf16 + int8 scratch stay well under VMEM with
    double buffering; misfits fall back to the XLA dynamic path."""
    if not (k % 128 == 0 and k <= 4096 and m % 128 == 0 and m >= 128
            and n >= 128):
        return False
    TN = n if n <= 2048 else 1024
    np_ = -(-n // TN) * TN if n > 2048 else -(-n // 128) * 128
    return _pick_tiles(m, k, np_, itemsize) is not None


def quant_matmul(x, w, *, interpret: bool = False):
    """Dense-shaped dynamic-int8 contraction: x (..., K) @ w (K, N).

    Quantizes w per output channel here (XLA, loop-invariant) and runs the
    fused activation-quant matmul kernel.  N is padded to the next tile
    multiple with zero columns (weights only — activations are never
    copied); the pad is sliced off the result.
    """
    from funasr_tpu.ops.quant import quantize_rows

    *lead, K = x.shape
    N = w.shape[1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    q_w, s_w = quantize_rows(w, axis=0)     # (K, N) int8, (1, N) f32
    # N <= 2048: one n-step, pad to the lane multiple; larger: 1024 tiles
    Np = -(-N // 128) * 128 if N <= 2048 else -(-N // 1024) * 1024
    if Np != N:
        q_w = jnp.pad(q_w, ((0, 0), (0, Np - N)))
        s_w = jnp.pad(s_w, ((0, 0), (0, Np - N)), constant_values=1.0)
    out = _qmm(x2, q_w, s_w, interpret=interpret)
    if Np != N:
        out = out[:, :N]
    return out.reshape(*lead, N)
