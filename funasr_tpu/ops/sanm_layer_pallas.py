"""Pallas TPU kernel: fully fused SAN-M encoder layer (int8 serving path).

One kernel call computes the whole pre-norm SANM layer
(reference funasr/models/sanm/encoder.py:44 ``EncoderLayerSANM`` +
attention.py:140 ``MultiHeadedAttentionSANM`` + forward_fsmn:207):

    h   = LN1(x)
    qkv = h @ Wqkv + bqkv ; q,k,v = split(qkv)
    mem = (depthwise_conv(v*valid, fsmn) + v*valid) * valid
    ctx = softmax(q k^T / sqrt(d) + keymask) v          (per head)
    x   = x + ctx @ Wout + bout + mem
    y   = LN2(x)
    x   = x + relu(y @ W1 + b1) @ W2 + b2

entirely in VMEM per (batch) grid cell.  Rationale: the XLA pipeline for
this layer makes ~8 HBM round-trips of the (T, D) activation per layer
(two f32 layernorms, qkv, attention context, fsmn conv, ffn hidden) — at
Paraformer-large shapes that traffic, not the MXU, sets the per-layer
floor.  Here HBM sees exactly one read of x and one write of the layer
output; every matmul contracts on the int8 MXU (~1.8x bf16) with dynamic
per-row activation scales and per-channel weight scales, the same numerics
as ops/quant.py (the serving ``quantize=True`` path, reference
runtime default funasr-wss-server.cpp:54).

Masking: the kernel takes per-utterance ``lengths`` (SMEM scalar per grid
cell) and rebuilds the contiguous-prefix key mask with iota — identical
semantics to the (B, 1, T) key_mask of the XLA path for valid rows; padded
*query* rows hold garbage (they are masked downstream, and the FSMN/key
masks stop them from leaking into valid rows).

Sandbox constraints honored: BlockSpec-pipelined VMEM inputs only, no
1D->2D vector reshapes (all intermediates stay 2D), no async copies.
Equivalence vs. the module's XLA path is tested in
tests/test_sanm_layer_pallas.py (interpret mode on CPU + TPU compile).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIMS = (((1,), (0,)), ((), ()))       # (M,K) @ (K,N)
_DIMS_T = (((1,), (1,)), ((), ()))     # (M,K) @ (N,K)^T


from funasr_tpu.ops.quant import rowquant_kernel as _rowquant  # noqa: E402


def _ln(xf, scale_ref, bias_ref, eps=1e-12):
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale_ref[:] + bias_ref[:]


def _shift_rows(x, s, T):
    """x shifted so out[t] = x[t + s] (zeros outside), static s."""
    if s == 0:
        return x
    zeros = jnp.zeros((abs(s), x.shape[1]), x.dtype)
    if s > 0:
        return jnp.concatenate([x[s:T], zeros], axis=0)
    return jnp.concatenate([zeros, x[:T + s]], axis=0)


def _sanm_layer_kernel(len_ref, x_ref,
                       ln1s, ln1b, wqkv, sqkv, bqkv, fsmn,
                       wout, sout, bout, ln2s, ln2b,
                       w1, s1, b1, w2, s2, b2, o_ref,
                       *, n_head: int, left: int, right: int,
                       int8_attn: bool = False):
    T, D = x_ref.shape[1], x_ref.shape[2]
    K = fsmn.shape[0]
    d = D // n_head
    L = len_ref[pl.program_id(0)]

    x = x_ref[0].astype(jnp.float32)                      # (T, D)
    valid = (jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
             < L).astype(jnp.float32)

    # ---- LN1 -> int8 qkv projection
    h = _ln(x, ln1s, ln1b)
    hq, hs = _rowquant(h)
    qkv = jax.lax.dot_general(hq, wqkv[:], _DIMS,
                              preferred_element_type=jnp.int32)
    qkv = qkv.astype(jnp.float32) * hs * sqkv[:] + bqkv[:]  # (T, 3D)

    # ---- FSMN memory on v (mask -> depthwise conv -> +v -> mask)
    vm = qkv[:, 2 * D:3 * D] * valid
    vmb = vm.astype(jnp.bfloat16)
    mem = vm
    for j in range(K):
        s = j - left
        tap = fsmn[j:j + 1, :].astype(jnp.float32)        # (1, D)
        mem = mem + tap * _shift_rows(vm, s, T)
    mem = mem * valid

    # ---- attention (f32 softmax), per 128-wide head slice.  Scores on
    # the int8 MXU when int8_attn: per-row scales for q and k factor out
    # of the dot as an outer product (s_ij = int_dot * qs_i * ks_j).
    colmask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (T, T), 1) < L, 0.0, -1e30)
    scale = d ** -0.5
    ctx = []
    for hd in range(n_head):
        sl = slice(hd * d, (hd + 1) * d)
        if int8_attn:
            q8, qs = _rowquant(qkv[:, sl] * scale)
            k8, ks = _rowquant(qkv[:, D + hd * d:D + (hd + 1) * d])
            sc = jax.lax.dot_general(q8, k8, _DIMS_T,
                                     preferred_element_type=jnp.int32)
            sc = sc.astype(jnp.float32) * qs * jnp.transpose(ks)
        else:
            qh = (qkv[:, sl] * scale).astype(jnp.bfloat16)
            kh = qkv[:, D + hd * d:D + (hd + 1) * d].astype(jnp.bfloat16)
            sc = jax.lax.dot_general(qh, kh, _DIMS_T,
                                     preferred_element_type=jnp.float32)
        vh = vmb[:, sl]
        sc = sc + colmask
        m = jnp.max(sc, axis=1, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        ctx.append(jax.lax.dot_general(p.astype(jnp.bfloat16), vh, _DIMS,
                                       preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx, axis=1)                    # (T, D) f32

    # ---- int8 output projection + residual (out + mem, attention.py:166)
    cq, cs = _rowquant(ctx)
    out = jax.lax.dot_general(cq, wout[:], _DIMS,
                              preferred_element_type=jnp.int32)
    x = x + out.astype(jnp.float32) * cs * sout[:] + bout[:] + mem

    # ---- LN2 -> int8 fused FFN + residual
    h2 = _ln(x, ln2s, ln2b)
    h2q, h2s = _rowquant(h2)
    hid = jax.lax.dot_general(h2q, w1[:], _DIMS,
                              preferred_element_type=jnp.int32)
    hid = jnp.maximum(hid.astype(jnp.float32) * h2s * s1[:] + b1[:], 0.0)
    hq2, hs2 = _rowquant(hid)
    y = jax.lax.dot_general(hq2, w2[:], _DIMS,
                            preferred_element_type=jnp.int32)
    x = x + y.astype(jnp.float32) * hs2 * s2[:] + b2[:]
    o_ref[0] = x.astype(o_ref.dtype)


def _vmem_bytes(T: int, D: int, H: int) -> int:
    wgt = D * 3 * D + D * D + D * H + H * D               # int8 weights
    act = (T * D * 4 * 6        # x, h, vm, mem, ctx, x1 (f32)
           + T * 3 * D * 4      # qkv
           + T * H * 4          # ffn hidden
           + 2 * T * T * 4      # scores + mask
           + 2 * T * D * 2 * 2) # in/out double buffer (bf16)
    return wgt + act


def enabled() -> bool:
    """On for real TPU backends (FUNASR_TPU_DISABLE_PALLAS_SANM=1 forces
    the XLA path everywhere)."""
    if os.environ.get("FUNASR_TPU_DISABLE_PALLAS_SANM"):
        return False
    return jax.devices()[0].platform != "cpu"


def supported(T: int, D: int, H: int, n_head: int) -> bool:
    if D % n_head or (D // n_head) % 128:
        return False
    if T % 8 or D % 128 or H % 128:
        return False
    return _vmem_bytes(T, D, H) <= 13 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=("n_head", "left", "right", "interpret",
                                    "int8_attn"))
def _call(x, lengths, ln1s, ln1b, wqkv8, sqkv, bqkv, fsmn, wout8, sout, bout,
          ln2s, ln2b, w18, s1, b1, w28, s2, b2,
          *, n_head: int, left: int, right: int, interpret: bool = False,
          int8_attn: bool = False):
    B, T, D = x.shape
    H = w18.shape[1]
    row = lambda b: (0, 0)
    vec = lambda n: pl.BlockSpec((1, n), row, memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), row, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sanm_layer_kernel, n_head=n_head, left=left,
                          right=right, int8_attn=int8_attn),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(D), vec(D),                        # ln1
            mat(D, 3 * D), vec(3 * D), vec(3 * D),  # qkv
            pl.BlockSpec(fsmn.shape, row, memory_space=pltpu.VMEM),
            mat(D, D), vec(D), vec(D),             # out proj
            vec(D), vec(D),                        # ln2
            mat(D, H), vec(H), vec(H),             # ffn w1
            mat(H, D), vec(D), vec(D),             # ffn w2
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (3 * D * D + D * D + 2 * D * H + 2 * T * D),
            transcendentals=B * n_head * T * T,
            bytes_accessed=2 * B * T * D * 2 + 4 * D * D + 2 * D * H),
        interpret=interpret,
    )(lengths, x, ln1s, ln1b, wqkv8, sqkv, bqkv, fsmn, wout8, sout, bout,
      ln2s, ln2b, w18, s1, b1, w28, s2, b2)


def fused_sanm_layer(x, lengths, ln1, qkv_kernel, qkv_bias, fsmn_kernel,
                     out_kernel, out_bias, ln2, w1, b1, w2, b2,
                     *, n_head: int, left: int, right: int,
                     interpret: bool = False, int8_attn: bool = None):
    """Full SANM encoder layer, int8 MXU, one HBM round-trip.

    x: (B, T, D) bf16/f32; lengths: (B,) int32 valid frame counts.
    ln1/ln2: (scale, bias) tuples; weights in nn.Dense layout (K, N);
    fsmn_kernel: (K, 1, D) depthwise taps.
    """
    from funasr_tpu.ops.quant import quantize_rows

    B, T, D = x.shape
    wqkv8, sqkv = quantize_rows(qkv_kernel, axis=0)
    wout8, sout = quantize_rows(out_kernel, axis=0)
    w18, s1 = quantize_rows(w1, axis=0)
    w28, s2 = quantize_rows(w2, axis=0)
    if int8_attn is None:
        int8_attn = os.environ.get("FUNASR_TPU_INT8_ATTN", "0") == "1"
    r = lambda v: v.reshape(1, -1).astype(jnp.float32)
    return _call(
        x, lengths.astype(jnp.int32),
        r(ln1[0]), r(ln1[1]), wqkv8, sqkv, r(qkv_bias),
        fsmn_kernel.reshape(fsmn_kernel.shape[0], D).astype(jnp.float32),
        wout8, sout, r(out_bias), r(ln2[0]), r(ln2[1]),
        w18, s1, r(b1), w28, s2, r(b2),
        n_head=n_head, left=left, right=right, interpret=interpret,
        int8_attn=int8_attn)
