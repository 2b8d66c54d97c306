"""Pallas TPU kernel: fully fused Paraformer SANM decoder layer (int8).

One kernel call per layer computes the whole pre-norm decoder layer
(reference funasr/models/paraformer/decoder.py:26 ``DecoderLayerSANM``,
sanm/attention.py:471 decoder FSMN, :568 cross-attention):

    h   = LN_ffn(w_1_relu -> LN -> w_2)(LN1(x))          (FeedForwardDecoderSANM)
    m   = (depthwise_conv(LN2(h)*valid_u, fsmn) + .) * valid_u
    x   = x + m                                          (self FSMN branch)
    q   = LN3(x) @ Wq ; k,v = memory @ Wkv
    x   = x + softmax(q k^T / sqrt(d) + memmask) v @ Wout

per grid cell, with the decoder hidden states and the attention scores
never leaving VMEM.  All contractions run on the int8 MXU with dynamic
per-row activation scales and per-channel weight scales — identical
numerics to ops/quant.py (the serving ``quantize=True`` path).

Each grid cell processes ``g`` batch items (default 2): the decoder's
token grid is short (U ~ 128 rows), so a one-item cell is latency-bound —
batching items per cell amortizes the fixed per-cell cost and doubles the
M dimension of the row-wise matmuls.  The FSMN shifts, the attention, and
the per-item K/V projection still run per item (they must not mix items).

The encoder memory (B, T, D) is re-read per layer (its per-layer K/V
projections differ); that is the same HBM traffic the XLA path pays.

Same sandbox constraints as ops/sanm_layer_pallas.py.  Equivalence vs. the
module path is tested in tests/test_decoder_layer_pallas.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from funasr_tpu.ops.sanm_layer_pallas import _ln, _rowquant, _shift_rows

_DIMS = (((1,), (0,)), ((), ()))
_DIMS_T = (((1,), (1,)), ((), ()))


def _i8dot(xf, w_ref, s_ref):
    q, s = _rowquant(xf)
    acc = jax.lax.dot_general(q, w_ref[:], _DIMS,
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s * s_ref[:]


def _dec_layer_kernel(tlen_ref, mlen_ref, x_ref, mem_ref,
                      ln1s, ln1b, w1, s1, b1, flns, flnb, w2, s2,
                      ln2s, ln2b, fsmn, ln3s, ln3b,
                      wq, sq, bq, wkv, skv, bkv, wout, so, bo, o_ref,
                      *, n_head: int, left: int, right: int):
    G, U, D = x_ref.shape
    T = mem_ref.shape[1]
    K = fsmn.shape[0]
    d = D // n_head
    pid = pl.program_id(0)

    x = jnp.concatenate([x_ref[j].astype(jnp.float32) for j in range(G)],
                        axis=0)                          # (G*U, D)

    # ---- FeedForwardDecoderSANM: w_1 -> relu -> LN -> w_2 (no bias)
    h = _ln(x, ln1s, ln1b)
    hid = jnp.maximum(_i8dot(h, w1, s1) + b1[:], 0.0)    # (G*U, H)
    hid = _ln(hid, flns, flnb)
    h = _i8dot(hid, w2, s2)                              # (G*U, D)

    # ---- FSMN self-memory on LN2(h), residual from the layer input
    #      (per item: the depthwise taps must not leak across items)
    h2 = _ln(h, ln2s, ln2b)
    mems = []
    for j in range(G):
        Lt = tlen_ref[pid * G + j]
        valid = (jax.lax.broadcasted_iota(jnp.int32, (U, D), 0)
                 < Lt).astype(jnp.float32)
        vm = h2[j * U:(j + 1) * U] * valid
        mem = vm
        for t in range(K):
            tap = fsmn[t:t + 1, :].astype(jnp.float32)
            mem = mem + tap * _shift_rows(vm, t - left, U)
        mems.append(mem * valid)
    x = x + jnp.concatenate(mems, axis=0)

    # ---- cross-attention over the encoder memory
    h3 = _ln(x, ln3s, ln3b)
    q = _i8dot(h3, wq, sq) + bq[:]                       # (G*U, D)
    scale = d ** -0.5
    ctx = []
    for j in range(G):
        Lm = mlen_ref[pid * G + j]
        kv = _i8dot(mem_ref[j].astype(jnp.float32), wkv, skv) + bkv[:]
        colmask = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (U, T), 1) < Lm, 0.0, -1e30)
        heads = []
        for hd in range(n_head):
            sl = slice(hd * d, (hd + 1) * d)
            qh = (q[j * U:(j + 1) * U, sl] * scale).astype(jnp.bfloat16)
            kh = kv[:, hd * d:(hd + 1) * d].astype(jnp.bfloat16)
            vh = kv[:, D + hd * d:D + (hd + 1) * d].astype(jnp.bfloat16)
            sc = jax.lax.dot_general(qh, kh, _DIMS_T,
                                     preferred_element_type=jnp.float32)
            sc = sc + colmask
            m = jnp.max(sc, axis=1, keepdims=True)
            p = jnp.exp(sc - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            heads.append(jax.lax.dot_general(
                p.astype(jnp.bfloat16), vh, _DIMS,
                preferred_element_type=jnp.float32))
        ctx.append(jnp.concatenate(heads, axis=1))
    ctx = jnp.concatenate(ctx, axis=0)                   # (G*U, D)
    x = x + _i8dot(ctx, wout, so) + bo[:]
    for j in range(G):
        o_ref[j] = x[j * U:(j + 1) * U].astype(o_ref.dtype)


def _vmem_bytes(U: int, T: int, D: int, H: int, g: int) -> int:
    wgt = D * H + H * D + D * D + D * 2 * D + D * D
    act = g * (U * D * 4 * 6 + U * H * 4 + T * D * 2 * 2 + T * 2 * D * 4
               + 2 * U * T * 4 + 2 * U * D * 2 * 2)
    return wgt + act


def enabled() -> bool:
    if os.environ.get("FUNASR_TPU_DISABLE_PALLAS_SANM"):
        return False
    return jax.devices()[0].platform != "cpu"


def _pick_g(B: int, U: int, T: int, D: int, H: int) -> int:
    for g in (4, 2, 1):
        if B % g == 0 and _vmem_bytes(U, T, D, H, g) <= 13 * 1024 * 1024:
            return g
    return 0


def supported(B: int, U: int, T: int, D: int, H: int, n_head: int) -> bool:
    if D % n_head or (D // n_head) % 128:
        return False
    if U % 8 or T % 8 or D % 128 or H % 128:
        return False
    return _pick_g(B, U, T, D, H) > 0


@functools.partial(jax.jit,
                   static_argnames=("n_head", "left", "right", "interpret"))
def _call(x, memory, tgt_lens, mem_lens,
          ln1s, ln1b, w18, s1, b1, flns, flnb, w28, s2,
          ln2s, ln2b, fsmn, ln3s, ln3b,
          wq8, sq, bq, wkv8, skv, bkv, wout8, so, bo,
          *, n_head: int, left: int, right: int, interpret: bool = False):
    B, U, D = x.shape
    T = memory.shape[1]
    H = w18.shape[1]
    G = _pick_g(B, U, T, D, H)
    row = lambda b: (0, 0)
    vec = lambda n: pl.BlockSpec((1, n), row, memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), row, memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((B,), lambda b: (0,), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_dec_layer_kernel, n_head=n_head, left=left,
                          right=right),
        grid=(B // G,),
        in_specs=[
            smem, smem,
            pl.BlockSpec((G, U, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(D), vec(D),                         # ln1
            mat(D, H), vec(H), vec(H),              # ffn w_1
            vec(H), vec(H),                         # ffn inner norm
            mat(H, D), vec(D),                      # ffn w_2 (no bias)
            vec(D), vec(D),                         # ln2
            pl.BlockSpec(fsmn.shape, row, memory_space=pltpu.VMEM),
            vec(D), vec(D),                         # ln3
            mat(D, D), vec(D), vec(D),              # linear_q
            mat(D, 2 * D), vec(2 * D), vec(2 * D),  # linear_k_v
            mat(D, D), vec(D), vec(D),              # linear_out
        ],
        out_specs=pl.BlockSpec((G, U, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, U, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (U * D * (2 * H + 2 * D) + T * D * 2 * D
                           + 2 * U * T * D),
            transcendentals=B * n_head * U * T,
            bytes_accessed=B * (2 * U * D + T * D) * 2
            + 2 * D * H + 4 * D * D),
        interpret=interpret,
    )(tgt_lens, mem_lens, x, memory,
      ln1s, ln1b, w18, s1, b1, flns, flnb, w28, s2,
      ln2s, ln2b, fsmn, ln3s, ln3b,
      wq8, sq, bq, wkv8, skv, bkv, wout8, so, bo)
