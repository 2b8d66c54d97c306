"""Pallas TPU kernel for the CTC prefix-scoring frame recurrence.

The espnet CTC prefix recurrence (reference scorers/ctc_prefix_score.py:12
``CTCPrefixScoreTH``; ops/beam_search._ctc_recurrence here)::

    r_nb[t] = xg[t] + logaddexp(r_nb[t-1], phi_shift[t])
    r_b[t]  = xb[t] + logaddexp(r_b[t-1],  r_nb[t-1])

is a strictly sequential chain over encoder frames.  As a ``lax.scan`` it
compiles to T tiny fused kernels whose per-launch latency dominates (the
per-step tensors are only (B, K, W) floats) — measured at 62% of the whole
hybrid-beam step before r4.  Here the WHOLE chain runs inside ONE Pallas
kernel: rows (= B*K*W candidate slots) live on lanes, frames stream
through VMEM in BlockSpec-pipelined (BT, R) tiles, and the carry persists
across sequential grid steps in VMEM scratch.  HBM traffic is the
unavoidable 5x(T, R) tile stream; the serial chain costs VPU adds only.

An associative-scan alternative was measured and documented in
ops/beam_search.py — this kernel beats both formulations by removing the
launch-per-frame overhead instead of the (true) serial dependency.

Numerics match ``_ctc_recurrence`` exactly: same finite ``NEG_INF``
sentinel, same two-term logaddexp; parity is pinned in
tests/test_ctc_prefix_pallas.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e10


def _logaddexp(a, b):
    mx = jnp.maximum(jnp.maximum(a, b), NEG_INF)
    return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(b - mx))


def _kernel(xg_ref, phi_ref, xb_ref, onb_ref, ob_ref, snb_ref, sb_ref,
            *, block_t: int):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        snb_ref[...] = jnp.full(snb_ref.shape, NEG_INF, jnp.float32)
        sb_ref[...] = jnp.full(sb_ref.shape, NEG_INF, jnp.float32)

    def body(i, _):
        r_nb = snb_ref[0, :]
        r_b = sb_ref[0, :]
        new_nb = xg_ref[i, :] + _logaddexp(r_nb, phi_ref[i, :])
        new_b = xb_ref[i, :] + _logaddexp(r_b, r_nb)
        snb_ref[0, :] = new_nb
        sb_ref[0, :] = new_b
        onb_ref[i, :] = new_nb
        ob_ref[i, :] = new_b
        return 0

    # mosaic supports only unroll=1 or full; the in-kernel loop is cheap
    # (no per-step dispatch), full unroll just bloats compile time
    lax.fori_loop(0, block_t, body, 0)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("block_t", "block_r",
                                             "interpret"))
def ctc_recurrence(xg: jnp.ndarray, xb: jnp.ndarray, phi_shift: jnp.ndarray,
                   *, block_t: int = 128, block_r: int = 1024,
                   interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.beam_search._ctc_recurrence.

    xg, phi_shift (B, K, W, T); xb (B, T).  Returns (r_nb, r_b) both
    (B, K, W, T) fp32.
    """
    B, K, W, T = xg.shape
    R = B * K * W
    xbb = jnp.broadcast_to(xb[:, None, None, :], (B, K, W, T))
    # time-major (T, R) layout so frame tiles stream while rows sit on lanes
    xg2 = xg.astype(jnp.float32).reshape(R, T).T
    phi2 = phi_shift.astype(jnp.float32).reshape(R, T).T
    xb2 = xbb.astype(jnp.float32).reshape(R, T).T

    Tp = _pad_to(T, block_t)
    Rp = _pad_to(R, 128)
    rb = Rp if Rp <= block_r else block_r
    Rp = _pad_to(Rp, rb)
    if Tp != T or Rp != R:
        pad = ((0, Tp - T), (0, Rp - R))
        xg2 = jnp.pad(xg2, pad, constant_values=NEG_INF)
        phi2 = jnp.pad(phi2, pad, constant_values=NEG_INF)
        xb2 = jnp.pad(xb2, pad, constant_values=0.0)

    spec = pl.BlockSpec((block_t, rb), lambda r, t: (t, r),
                        memory_space=pltpu.VMEM)
    onb, ob = pl.pallas_call(
        functools.partial(_kernel, block_t=block_t),
        grid=(Rp // rb, Tp // block_t),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((Tp, Rp), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((1, rb), jnp.float32),
                        pltpu.VMEM((1, rb), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * Tp * Rp, transcendentals=2 * Tp * Rp,
            bytes_accessed=5 * 4 * Tp * Rp),
        interpret=interpret,
    )(xg2, phi2, xb2)
    r_nb = onb[:T, :R].T.reshape(B, K, W, T)
    r_b = ob[:T, :R].T.reshape(B, K, W, T)
    return r_nb, r_b


def enabled() -> bool:
    """On for real TPU backends (FUNASR_TPU_DISABLE_PALLAS_CTC=1 forces
    the lax.scan recurrence everywhere)."""
    if os.environ.get("FUNASR_TPU_DISABLE_PALLAS_CTC"):
        return False
    return jax.devices()[0].platform != "cpu"
