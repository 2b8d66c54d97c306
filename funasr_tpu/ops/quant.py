"""Dynamic int8 quantization for the MXU.

The reference's fastest serving configs are int8: onnxruntime dynamic
quantization of every MatMul (runtime/docs/benchmark_onnx_cpp.md:69-81 —
RTF 0.0283 int8 vs 0.0590 fp32 at unchanged CER 1.95, :63-65).  The TPU
equivalent implemented here: int8 x int8 -> int32 ``lax.dot_general``
(1.8x bf16 MXU throughput on the bench chip) with

- per-row activation scales computed on the fly (absmax over the
  contracting axis — the "dynamic" in dynamic quantization), and
- per-output-channel weight scales.

Weights are quantized inside the jitted program; XLA hoists the
loop-invariant weight quantization out of serving loops, and the extra
elementwise pass is HBM-bound and tiny next to the matmuls it feeds.

Usage: models pass :func:`maybe_int8_dot_general` as ``nn.Dense``'s
``dot_general``; the mode is a trace-time switch flipped by
:func:`enable` / the :func:`quantized` context manager (AutoModel's
``quantize=True``).  Engines must be built (first call traced) with the
flag in its final state.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp
from jax import lax

# Process-global (not thread-local): jit tracing may happen on a server's
# batcher worker thread, long after AutoModel(quantize=True) flipped it.
_INT8 = False


def enabled() -> bool:
    return _INT8


def enable(on: bool = True) -> None:
    global _INT8
    _INT8 = bool(on)


@contextlib.contextmanager
def quantized(on: bool = True):
    prev = enabled()
    enable(on)
    try:
        yield
    finally:
        enable(prev)


def quantize_rows(x: jnp.ndarray, axis: int = -1):
    """Symmetric int8 quantization with one scale per slice along ``axis``.

    Returns ``(q, scale)`` with ``x ~= q * scale`` and ``q`` in [-127, 127].
    All-zero slices (padding rows) get scale eps and q = 0.
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


import os

_MIN_M = int(os.environ.get("FUNASR_TPU_INT8_MIN_M", "1024"))
_MIN_N = int(os.environ.get("FUNASR_TPU_INT8_MIN_N", "1024"))


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None, min_m: int = None,
                     min_n: int = None):
    """``lax.dot_general`` drop-in computing the contraction on the int8 MXU.

    Handles the Dense-shaped contraction (last lhs dim x first rhs dim, no
    batch dims); anything else falls back to the float path unchanged.
    ``min_m``/``min_n`` gate the shapes worth quantizing (pass 0 to force).
    """
    if min_m is None:
        min_m = _MIN_M
    if min_n is None:
        min_n = _MIN_N
    (lc, rc), (lb, rb) = dimension_numbers
    dense_shaped = (
        tuple(lc) == (lhs.ndim - 1,) and tuple(rc) == (0,)
        and not lb and not rb and rhs.ndim == 2
        and jnp.issubdtype(lhs.dtype, jnp.floating)
        and jnp.issubdtype(rhs.dtype, jnp.floating)
    )
    if not dense_shaped:
        return lax.dot_general(lhs, rhs, dimension_numbers,
                               precision=precision,
                               preferred_element_type=preferred_element_type)
    out_dtype = preferred_element_type or lhs.dtype
    m = 1
    for d in lhs.shape[:-1]:
        m *= d
    n = rhs.shape[1]
    # XLA dynamic quant pays for its activation passes only when the MXU
    # saving is large enough: saving ~ flops/2 = m*k*n/350e12 vs overhead
    # ~ 5 bytes * m*k / 8e11 -> requires n >~ 1000 (and enough rows that
    # the matmul is compute-bound at all).  The gate applies to the Pallas
    # variant below too: both are the same int8 recipe and must quantize
    # the same set of layers.
    if n < min_n or m < min_m:
        return lax.dot_general(lhs, rhs, dimension_numbers,
                               precision=precision,
                               preferred_element_type=preferred_element_type)
    if preferred_element_type is None or preferred_element_type == lhs.dtype:
        # fused Pallas path (opt-in): activation tiles quantized in VMEM,
        # int8 MXU dots, rescale at the output write (ops/quant_pallas.py).
        # Off by default: standalone it beats the XLA dot, but it breaks
        # XLA's bias/activation epilogue fusions around nn.Dense, which
        # costs more than the MXU saves in full encoder stacks (measured).
        from funasr_tpu.ops import quant_pallas as QP

        if QP.enabled() and QP.supported(m, lhs.shape[-1], n,
                                         lhs.dtype.itemsize):
            return QP.quant_matmul(lhs, rhs)
    q_x, s_x = quantize_rows(lhs, axis=-1)        # (..., K), (..., 1)
    q_w, s_w = quantize_rows(rhs, axis=0)         # (K, N),  (1, N)
    acc = lax.dot_general(q_x, q_w, dimension_numbers,
                          preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * s_x * s_w
    return out.astype(out_dtype)


def maybe_int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                           preferred_element_type=None):
    """Trace-time switch: int8 path when :func:`enabled`, else float dot."""
    if enabled():
        return int8_dot_general(lhs, rhs, dimension_numbers,
                                precision=precision,
                                preferred_element_type=preferred_element_type)
    return lax.dot_general(lhs, rhs, dimension_numbers, precision=precision,
                           preferred_element_type=preferred_element_type)


def QDense(*args, **kwargs):
    """``nn.Dense`` with the switchable int8 contraction (hot-path layers)."""
    import flax.linen as nn

    kwargs.setdefault("dot_general", maybe_int8_dot_general)
    return nn.Dense(*args, **kwargs)


def rowquant_kernel(xf):
    """Per-row symmetric int8 quantization of a 2D float32 tile — the
    kernel-side (Pallas-safe) specialization of :func:`quantize_rows` used
    by every fused kernel (single definition so the recipe cannot drift)."""
    absmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale
