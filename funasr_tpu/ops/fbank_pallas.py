"""Pallas TPU kernel: fully-fused kaldi fbank.

Key observation: every per-frame preprocessing step of kaldi fbank with
dither=0 is *linear* in the samples — DC removal (P = I - J/400),
preemphasis (bidiagonal L with the first sample duplicated), and the hamming
window (diagonal W).  So the windowed-frame DFT is one fixed matrix::

    spectrum = frames_raw @ (P^T L^T W C)

precomputed on the host in float64.  A frame is three consecutive 160-sample
hops, so the 400-sample contraction splits into three (TILE,160)x(160,257)
MXU matmuls (the third matrix zero-padded past sample 80) — the kernel needs
NO frame gather and NO elementwise preprocessing.

The three hop-aligned views (offset 0/1/2 hops) are passed as three inputs
so plain BlockSpec pipelining covers the overlapping windows (the sandbox's
mosaic backend rejects manual HBM DMA).  Per grid step: six matmuls (re/im),
power, mel matmul, log — ~3x the waveform bytes read vs. 150x for the XLA
path's materialized (B, T, 400) frame tensor.

Equivalence with ops.fbank.fbank (dither=0) is tested in
tests/test_fbank_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from funasr_tpu.ops.fbank import (
    _dft_matrices,
    _window,
    kaldi_mel_banks,
    num_fbank_frames,
)

_LOG_EPS = float(np.finfo(np.float32).eps)

FRAME_LEN = 400
FRAME_SHIFT = 160
PADDED = 512


@functools.lru_cache(maxsize=4)
def _fused_dft(preemph: float = 0.97):
    """(A_re, A_im): (3, 160, 257) per-hop blocks of the fused
    (preprocess + window + DFT) operator."""
    n = FRAME_LEN
    cos_m, sin_m = _dft_matrices(n, PADDED)  # (400, 257)
    P = np.eye(n) - np.ones((n, n)) / n
    L = np.eye(n)
    for i in range(1, n):
        L[i, i - 1] -= preemph
    L[0, 0] -= preemph  # first sample duplicated (kaldi semantics)
    W = np.diag(_window("hamming", n))
    M = W @ L @ P  # (400, 400)
    A_re = M.T @ cos_m  # (400, 257)
    A_im = M.T @ sin_m
    tail_pad = FRAME_SHIFT - (n - 2 * FRAME_SHIFT)  # 160 - 80
    # drop the Nyquist bin (index 256): its mel weight is exactly 0 (the
    # top filter's right edge sits on it), and 256 bins keep the matmul
    # lane-aligned (257 would pad to 384 lanes, +50% MXU work).  re and im
    # are concatenated into one (160, 512) operand so each hop is a single
    # aligned matmul.
    nb = PADDED // 2  # 256
    blocks = []
    for a_re_b, a_im_b in (
        (A_re[0:160], A_im[0:160]),
        (A_re[160:320], A_im[160:320]),
        (np.pad(A_re[320:n], ((0, tail_pad), (0, 0))),
         np.pad(A_im[320:n], ((0, tail_pad), (0, 0)))),
    ):
        blocks.append(np.concatenate(
            [a_re_b[:, :nb], a_im_b[:, :nb]], axis=1))
    return np.stack(blocks).astype(np.float32)


def _dft_precision() -> str:
    """DFT matmul precision mode: "high" (default, manual bf16x3 — ~1e-6
    relative power-spectrum error, far below the int8 serving noise floor,
    at half the MXU passes of "highest"), "highest" (f32, 6 bf16 passes),
    or "default" (1 bf16 pass, ~0.4% power error).
    FUNASR_TPU_FBANK_PRECISION overrides.  Tests compare in interpret mode
    on CPU, where every mode is exact f32."""
    import os

    return os.environ.get("FUNASR_TPU_FBANK_PRECISION", "high").lower()


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fbank_kernel(h0, h1, h2, a_hi, a_lo, mel_ref, out_ref, *, precision):
    # bf16x3 DFT: waveform w = whi + wlo (bf16 split, cheap — tile only),
    # basis A = a_hi + a_lo (pre-split OUTSIDE the kernel: per-cell basis
    # splitting was measured as the kernel's VPU bottleneck).
    # w@A ~ whi@a_hi + whi@a_lo + wlo@a_hi; the wlo@a_lo term is below f32
    # roundoff.  One (tile, 160) x (160, 512) matmul triple per hop;
    # columns are [re | im].  "highest" keeps full-f32 MXU dots (a_hi is
    # the unsplit f32 basis there); "default" is the 1-pass bf16 DFT.
    ri = None
    for j, h in enumerate((h0, h1, h2)):
        w = h[0]
        if precision == "highest":
            acc = jax.lax.dot_general(
                w, a_hi[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            whi = w.astype(jnp.bfloat16)
            acc = _dot(whi, a_hi[j])
            if precision != "default":
                wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
                acc = acc + _dot(whi, a_lo[j]) + _dot(wlo, a_hi[j])
        ri = acc if ri is None else ri + acc
    nb = ri.shape[1] // 2
    power = ri[:, :nb] * ri[:, :nb] + ri[:, nb:] * ri[:, nb:]
    if precision == "highest":
        mel = jax.lax.dot_general(
            power, mel_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    else:
        # mel is a positive triangle average: 1-pass bf16 (~0.4% rel) is
        # below the log-feature noise floor
        mel = _dot(power.astype(jnp.bfloat16), mel_ref[:, :])
    out_ref[0, :, :] = jnp.log(jnp.maximum(mel, _LOG_EPS))


def fbank_pallas(
    waveform: jnp.ndarray,  # (B, N) float in [-1, 1]
    lengths: jnp.ndarray,  # (B,)
    num_mel_bins: int = 80,
    tile_t: int = 128,
    preemph: float = 0.97,
    precision: str = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused kaldi fbank (hamming, dither=0, 25ms/10ms, snip_edges).

    ``precision``: see :func:`_dft_precision` (resolved here, OUTSIDE jit,
    so the env override is honored per call, not per trace)."""
    return _fbank_pallas(waveform, lengths, num_mel_bins, tile_t, preemph,
                         precision or _dft_precision())


@functools.partial(jax.jit, static_argnames=("num_mel_bins", "tile_t",
                                             "preemph", "precision"))
def _fbank_pallas(waveform, lengths, num_mel_bins, tile_t, preemph,
                  precision):
    B, N = waveform.shape
    T = num_fbank_frames(N, FRAME_LEN, FRAME_SHIFT)
    if T == 0:
        return (jnp.zeros((B, 0, num_mel_bins), jnp.float32),
                jnp.zeros((B,), jnp.int32))
    n_tiles = (T + tile_t - 1) // tile_t
    H = n_tiles * tile_t + 2  # hops needed incl. 2-hop lookahead
    need = (H + 1) * FRAME_SHIFT
    wav = jnp.pad(waveform.astype(jnp.float32),
                  ((0, 0), (0, max(0, need - N)))) * float(1 << 15)
    # three hop-aligned views: view k starts at hop k
    hops0 = wav[:, : H * FRAME_SHIFT].reshape(B, H, FRAME_SHIFT)
    hops1 = wav[:, FRAME_SHIFT:(H + 1) * FRAME_SHIFT].reshape(B, H, FRAME_SHIFT)
    hops2 = wav[:, 2 * FRAME_SHIFT:].reshape(B, -1, FRAME_SHIFT)[:, :H]

    a_ri = _fused_dft(preemph)
    nb = PADDED // 2  # Nyquist bin dropped (mel weight 0, see _fused_dft)
    mel = kaldi_mel_banks(num_mel_bins, PADDED, 16000.0)[:nb]
    if precision == "highest":
        a_hi = jnp.asarray(a_ri, jnp.float32)
        a_lo = jnp.zeros_like(a_hi, jnp.bfloat16)
        basis_dt = jnp.float32
    else:
        hi = a_ri.astype(np.float32).astype(jnp.bfloat16)
        a_hi = jnp.asarray(hi)
        a_lo = jnp.asarray((a_ri - np.asarray(hi, np.float32))
                           .astype(np.float32)).astype(jnp.bfloat16)
        basis_dt = jnp.bfloat16

    hop_spec = pl.BlockSpec((1, tile_t, FRAME_SHIFT), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    basis_spec = pl.BlockSpec((3, FRAME_SHIFT, 2 * nb), lambda b, t: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fbank_kernel, precision=precision),
        grid=(B, n_tiles),
        in_specs=[
            hop_spec, hop_spec, hop_spec,
            basis_spec, basis_spec,
            pl.BlockSpec((nb, num_mel_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, num_mel_bins),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile_t, num_mel_bins),
                                       jnp.float32),
    )(
        hops0, hops1, hops2,
        a_hi.astype(basis_dt), a_lo,
        jnp.asarray(mel, jnp.float32).astype(
            jnp.float32 if precision == "highest" else jnp.bfloat16),
    )
    feat_lengths = num_fbank_frames(
        lengths.astype(jnp.int32), FRAME_LEN, FRAME_SHIFT
    ).astype(jnp.int32)
    return out[:, :T, :], feat_lengths
