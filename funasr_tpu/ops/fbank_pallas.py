"""Pallas TPU kernel: fully-fused kaldi fbank.

Key observation: every per-frame preprocessing step of kaldi fbank with
dither=0 is *linear* in the samples — DC removal (P = I - J/400),
preemphasis (bidiagonal L with the first sample duplicated), and the hamming
window (diagonal W).  So the windowed-frame DFT is one fixed matrix::

    spectrum = frames_raw @ (P^T L^T W C)

precomputed on the host in float64.  The caller builds a 512-padded frame
tensor with one XLA concat of three hop-aligned views (HBM-bound, ~3x the
waveform bytes), and the kernel is a single deep (TILE, 512) x (512, 512)
MXU matmul per bf16x3 pass — NO in-kernel frame gather, NO elementwise
preprocessing, and a full MXU pipeline (three shallow K=160 hop matmuls
measured ~35% slower end to end).  Plain BlockSpec pipelining only (the
sandbox's mosaic backend rejects manual HBM DMA).  Re and im DFT columns
are concatenated into one operand; the Nyquist bin is dropped (mel weight
exactly 0) so the 256 bins stay lane-aligned.

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
    del tail_pad
    # one deep (512, 512) operator: rows are the 400 frame samples padded
    # to 512 (the caller builds the matching padded frame tensor); a single
    # K=512 matmul keeps the MXU pipeline full, unlike three shallow K=160
    # hop matmuls (~3x faster measured).
    A = np.concatenate([A_re[:, :nb], A_im[:, :nb]], axis=1)  # (400, 512)
    return np.pad(A, ((0, PADDED - n), (0, 0))).astype(np.float32)


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


def _fbank_kernel(fr, a_hi, a_lo, mel_ref, out_ref, *, precision,
                  with_energy=False):
    # bf16x3 DFT: frames w = whi + wlo (bf16 split, cheap — tile only),
    # basis A = a_hi + a_lo (pre-split OUTSIDE the kernel: per-cell basis
    # splitting was measured as the kernel's VPU bottleneck).
    # w@A ~ whi@a_hi + whi@a_lo + wlo@a_hi; the wlo@a_lo term is below f32
    # roundoff.  One deep (tile, 512) x (512, 512) matmul (columns
    # [re | im]) per bf16 pass.  "highest" keeps full-f32 MXU dots (a_hi
    # is the unsplit f32 basis there); "default" is the 1-pass bf16 DFT.
    w = fr[0]
    if precision == "highest":
        ri = jax.lax.dot_general(
            w, a_hi[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    else:
        whi = w.astype(jnp.bfloat16)
        ri = _dot(whi, a_hi[:, :])
        if precision != "default":
            wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
            ri = ri + _dot(whi, a_lo[:, :]) + _dot(wlo, a_hi[:, :])
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
    logmel = jnp.log(jnp.maximum(mel, _LOG_EPS))
    if with_energy:
        # VAD frame decibels for free: the raw (pre-preemph, pre-window)
        # frame samples are already in VMEM (cols 400..511 are zero pad,
        # so the full-row sum IS the 400-sample energy) — replaces a
        # separate 2.6 ms XLA block-sum pass over the 600 s waveform
        # (models/fsmn_vad/model.py compute_decibel semantics)
        e = jnp.sum(w * w, axis=1, keepdims=True)
        db = 10.0 * (jnp.log(e + 1e-6) / np.log(10.0).astype(np.float32))
        logmel = jnp.concatenate([logmel, db], axis=1)
    out_ref[0, :, :] = logmel


def fbank_pallas(
    waveform: jnp.ndarray,  # (B, N) float in [-1, 1]
    lengths: jnp.ndarray,  # (B,)
    num_mel_bins: int = 80,
    tile_t: int = 512,  # A/B on 600 s (r5): 512 beats 256 by ~17%; 2048
    # exceeds the 16 MB VMEM scoped limit on v5e
    preemph: float = 0.97,
    precision: str = None,
    with_energy: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Fused kaldi fbank (hamming, dither=0, 25ms/10ms, snip_edges).

    ``precision``: see :func:`_dft_precision` (resolved here, OUTSIDE jit,
    so the env override is honored per call, not per trace).
    ``with_energy=True`` additionally returns the per-frame RAW-sample
    decibel track (VAD compute_decibel semantics) as a third output —
    computed inside the kernel from the frame rows already in VMEM."""
    return _fbank_pallas(waveform, lengths, num_mel_bins, tile_t, preemph,
                         precision or _dft_precision(), with_energy)


@functools.partial(jax.jit, static_argnames=("num_mel_bins", "tile_t",
                                             "preemph", "precision",
                                             "with_energy"))
def _fbank_pallas(waveform, lengths, num_mel_bins, tile_t, preemph,
                  precision, with_energy=False):
    B, N = waveform.shape
    T = num_fbank_frames(N, FRAME_LEN, FRAME_SHIFT)
    if T == 0:
        z = (jnp.zeros((B, 0, num_mel_bins), jnp.float32),
             jnp.zeros((B,), jnp.int32))
        return z + (jnp.zeros((B, 0), jnp.float32),) if with_energy else z
    n_tiles = (T + tile_t - 1) // tile_t
    H = n_tiles * tile_t + 2  # hops needed incl. 2-hop lookahead
    need = (H + 2) * FRAME_SHIFT
    wav = jnp.pad(waveform.astype(jnp.float32),
                  ((0, 0), (0, max(0, need - N)))) * float(1 << 15)
    # padded frame tensor (B, H, 512): frame t = samples [160t, 160t+400)
    # zero-padded to 512 — one XLA concat (HBM-bound, ~0.3 ms at B=64x15s)
    # buys a single deep K=512 MXU matmul in the kernel instead of three
    # shallow K=160 hop matmuls
    hops0 = wav[:, : H * FRAME_SHIFT].reshape(B, H, FRAME_SHIFT)
    hops1 = wav[:, FRAME_SHIFT:(H + 1) * FRAME_SHIFT].reshape(B, H, FRAME_SHIFT)
    hops2 = wav[:, 2 * FRAME_SHIFT:].reshape(B, -1, FRAME_SHIFT)[:, :H]
    frames = jnp.concatenate(
        [hops0, hops1, hops2[:, :, :FRAME_LEN - 2 * FRAME_SHIFT],
         jnp.zeros((B, H, PADDED - FRAME_LEN), jnp.float32)], axis=2)

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

    frame_spec = pl.BlockSpec((1, tile_t, PADDED), lambda b, t: (b, t, 0),
                              memory_space=pltpu.VMEM)
    basis_spec = pl.BlockSpec((PADDED, 2 * nb), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    n_out = num_mel_bins + (1 if with_energy else 0)
    out = pl.pallas_call(
        functools.partial(_fbank_kernel, precision=precision,
                          with_energy=with_energy),
        grid=(B, n_tiles),
        in_specs=[
            frame_spec,
            basis_spec, basis_spec,
            pl.BlockSpec((nb, num_mel_bins), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, n_out),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile_t, n_out),
                                       jnp.float32),
    )(
        frames,
        a_hi.astype(basis_dt), a_lo,
        jnp.asarray(mel, jnp.float32).astype(
            jnp.float32 if precision == "highest" else jnp.bfloat16),
    )
    feat_lengths = num_fbank_frames(
        lengths.astype(jnp.int32), FRAME_LEN, FRAME_SHIFT
    ).astype(jnp.int32)
    if with_energy:
        return out[:, :T, :num_mel_bins], feat_lengths, out[:, :T,
                                                            num_mel_bins]
    return out[:, :T, :], feat_lengths
