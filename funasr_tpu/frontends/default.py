"""DefaultFrontend: espnet-style STFT -> power -> mel (reference
funasr/frontends/default.py:24 ``DefaultFrontend``; used by data2vec-style
models).

Semantics: periodic-Hann STFT (torch.hann_window; n_fft 512, hop 128,
center reflect padding), power spectrum, librosa SLANEY mel filterbank
(fmin=0, htk=False — reference frontends/utils/log_mel.py:49), ``log``.
Jittable static-shape function + a thin registered class.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from funasr_tpu.frontends.whisper_frontend import _slaney_mel_banks
from funasr_tpu.registry import tables


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_mels", "fs"))
def stft_log_mel(wav: jnp.ndarray, lengths: jnp.ndarray, n_fft: int = 512,
                 hop: int = 128, n_mels: int = 80, fs: int = 16000
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N) -> ((B, T, n_mels) log-mel, frame lengths)."""
    B, N = wav.shape
    half = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (half, half)), mode="reflect")
    T = N // hop + 1
    idx = jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]
    # torch.hann_window is PERIODIC (0.5 - 0.5*cos(2*pi*n/N)); np.hanning
    # is symmetric and differs at every sample
    n = np.arange(n_fft)
    window = jnp.asarray(
        (0.5 - 0.5 * np.cos(2 * np.pi * n / n_fft)).astype(np.float32))
    frames = frames * window
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_fft)[:, None] * np.arange(n_freqs)[None, :]
    cos_m = jnp.asarray(np.cos(2 * np.pi * k / n_fft).astype(np.float32))
    sin_m = jnp.asarray(-np.sin(2 * np.pi * k / n_fft).astype(np.float32))
    re = frames @ cos_m
    im = frames @ sin_m
    power = re * re + im * im
    banks = jnp.asarray(_slaney_mel_banks(n_mels, n_fft, fs).T)  # (F, M)
    mel = power @ banks
    feats = jnp.log(jnp.maximum(mel, 1e-10))
    flens = lengths // hop + 1
    return feats, flens


@tables.register("frontend_classes", "DefaultFrontend")
class DefaultFrontend:
    def __init__(self, fs: int = 16000, n_fft: int = 512, hop_length: int = 128,
                 n_mels: int = 80, **kwargs):
        self.fs = fs
        self.n_fft = n_fft
        self.hop = hop_length
        self.n_mels = n_mels

    def __call__(self, wav: jnp.ndarray, lengths: jnp.ndarray):
        return stft_log_mel(wav, lengths, self.n_fft, self.hop,
                            self.n_mels, self.fs)
