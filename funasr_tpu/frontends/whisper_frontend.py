"""Whisper log-mel frontend (reference funasr/frontends/whisper_frontend.py
``WhisperFrontend`` wraps openai-whisper's log_mel_spectrogram).

Whisper semantics: n_fft=400, hop=160, Hann window, center-padded
(reflect), n_mels=80 (128 for large-v3), Slaney-scale mel filterbank,
``log10(max(S, 1e-10))`` clamped to ``max-8`` then ``(x+4)/4``.

TPU form: the framing + DFT is the same matmul trick as the kaldi fbank op
(two (n_fft, n_fft/2+1) DFT matrices folded with the window), one jitted
function, static output length T_mel = ceil(N/hop).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from funasr_tpu.registry import tables

N_FFT = 400
HOP = 160


def _slaney_mel_banks(n_mels: int, n_fft: int = N_FFT, fs: int = 16000
                      ) -> np.ndarray:
    """librosa-style (Slaney) mel filterbank, matching whisper's
    mel_filters asset."""
    n_freqs = n_fft // 2 + 1
    fmin, fmax = 0.0, fs / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        mel = f / (200.0 / 3)
        log_t = f >= min_log_hz
        mel = np.where(log_t, min_log_mel
                       + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                       mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        f = m * (200.0 / 3)
        log_t = m >= min_log_mel
        return np.where(log_t, min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        f)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    freqs = np.linspace(0, fs / 2, n_freqs)
    banks = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        banks[i] = np.maximum(0.0, np.minimum(up, down))
        # Slaney normalization: constant energy per band
        banks[i] *= 2.0 / (hi - lo)
    return banks.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels", "pad_to"))
def log_mel_spectrogram(wav: jnp.ndarray, n_mels: int = 80,
                        pad_to: Optional[int] = None) -> jnp.ndarray:
    """(B, N) float waveform -> (B, n_mels, T) whisper log-mel.

    T = N // HOP (whisper drops the last frame).  ``pad_to`` right-pads the
    time axis with the floor value to a static length (whisper uses 3000
    for 30 s windows).
    """
    B, N = wav.shape
    # center reflect pad by n_fft//2
    half = N_FFT // 2
    x = jnp.pad(wav, ((0, 0), (half, half)), mode="reflect")
    T = N // HOP + 1
    idx = (jnp.arange(T)[:, None] * HOP + jnp.arange(N_FFT)[None, :])
    frames = x[:, idx]  # (B, T, n_fft)
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    frames = frames * window[None, None, :]
    n_freqs = N_FFT // 2 + 1
    k = np.arange(N_FFT)[:, None] * np.arange(n_freqs)[None, :]
    cos_m = jnp.asarray(np.cos(2 * np.pi * k / N_FFT).astype(np.float32))
    sin_m = jnp.asarray(-np.sin(2 * np.pi * k / N_FFT).astype(np.float32))
    re = frames @ cos_m
    im = frames @ sin_m
    power = re * re + im * im  # (B, T, n_freqs)
    power = power[:, :-1]  # whisper: magnitudes[..., :-1]
    banks = jnp.asarray(_slaney_mel_banks(n_mels))
    mel = jnp.einsum("btf,mf->bmt", power, banks)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec,
                           jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    if pad_to is not None and pad_to > log_spec.shape[-1]:
        pad = pad_to - log_spec.shape[-1]
        log_spec = jnp.pad(log_spec, ((0, 0), (0, 0), (0, pad)),
                           constant_values=-1.0)
    return log_spec


@tables.register("frontend_classes", "WhisperFrontend")
class WhisperFrontend:
    def __init__(self, n_mels: int = 80, fs: int = 16000,
                 chunk_seconds: int = 30, **kwargs):
        self.n_mels = n_mels
        self.fs = fs
        self.chunk_samples = chunk_seconds * fs
        self.pad_to = self.chunk_samples // HOP

    def __call__(self, wav: np.ndarray) -> jnp.ndarray:
        """Mono waveform -> (1, n_mels, 3000) whisper input features."""
        w = np.zeros((self.chunk_samples,), np.float32)
        n = min(len(wav), self.chunk_samples)
        w[:n] = wav[:n]
        return log_mel_spectrogram(jnp.asarray(w[None]), self.n_mels,
                                   pad_to=self.pad_to)
