"""WavFrontendMel23: the EEND-OLA diarization frontend.

Reference: funasr/frontends/wav_frontend.py:500 ``WavFrontendMel23`` +
funasr/frontends/eend_ola_feature.py — librosa STFT (centered, periodic
hann, next-pow2 fft), 23 slaney-mel log10 power bands with per-utterance
mean subtraction, context splice, and frame subsampling.  librosa isn't
in this image, so the STFT and the slaney mel filterbank are
re-implemented in numpy with librosa's exact conventions (centered
reflect padding, window zero-padded to n_fft, slaney scale + norm).

Host-side numpy like the reference (diarization feature prep is cheap
relative to the EEND stack); the output feeds models/eend.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from funasr_tpu.registry import tables


def _hann_periodic(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def stft(data: np.ndarray, frame_size: int = 1024,
         frame_shift: int = 256) -> np.ndarray:
    """librosa.stft(data, n_fft=next_pow2(frame_size),
    win_length=frame_size, hop_length=frame_shift).T with the
    reference's trailing-frame trim when len(data) % shift == 0
    (eend_ola_feature.py:40)."""
    fft_size = 1 << (int(frame_size) - 1).bit_length()
    win = np.zeros(fft_size)
    off = (fft_size - frame_size) // 2
    win[off: off + frame_size] = _hann_periodic(frame_size)
    pad = fft_size // 2
    x = np.pad(np.asarray(data, np.float64), pad, mode="reflect")
    n_frames = 1 + (len(x) - fft_size) // frame_shift
    idx = (np.arange(n_frames)[:, None] * frame_shift
           + np.arange(fft_size)[None, :])
    frames = x[idx] * win[None, :]
    spec = np.fft.rfft(frames, n=fft_size, axis=1)  # (T, F)
    if len(data) % frame_shift == 0:
        spec = spec[:-1]
    return spec


def _hz_to_mel_slaney(hz):
    hz = np.asarray(hz, np.float64)
    f_sp = 200.0 / 3
    mel = hz / f_sp
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    log_t = hz >= min_log_hz
    mel = np.where(log_t,
                   (min_log_hz / f_sp) + np.log(np.maximum(hz, 1e-10)
                                                / min_log_hz) / logstep,
                   mel)
    return mel


def _mel_to_hz_slaney(mel):
    mel = np.asarray(mel, np.float64)
    f_sp = 200.0 / 3
    hz = mel * f_sp
    min_log_mel = 1000.0 / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mel >= min_log_mel
    return np.where(log_t, 1000.0 * np.exp(logstep * (mel - min_log_mel)),
                    hz)


def mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """librosa.filters.mel(sr, n_fft, n_mels): slaney scale + slaney
    norm, fmin 0, fmax sr/2.  Returns (n_mels, 1 + n_fft // 2)."""
    fmax = sr / 2.0
    mels = np.linspace(_hz_to_mel_slaney(0.0), _hz_to_mel_slaney(fmax),
                       n_mels + 2)
    hz = _mel_to_hz_slaney(mels)
    fft_freqs = np.linspace(0, fmax, 1 + n_fft // 2)
    fdiff = np.diff(hz)
    ramps = hz[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz[2: n_mels + 2] - hz[:n_mels])
    return weights * enorm[:, None]


def transform(Y: np.ndarray, dtype=np.float32) -> np.ndarray:
    """|Y|^2 -> 23 slaney mel (sr=8000) -> log10 -> per-utt mean
    subtraction (eend_ola_feature.py:10)."""
    Y = np.abs(np.asarray(Y))
    n_fft = 2 * (Y.shape[1] - 1)
    basis = mel_filterbank(8000, n_fft, 23)
    Y = np.dot(Y ** 2, basis.T)
    Y = np.log10(np.maximum(Y, 1e-10))
    return (Y - np.mean(Y, axis=0)).astype(dtype)


def splice(Y: np.ndarray, context_size: int = 0) -> np.ndarray:
    """Frame context splice: (T, D) -> (T, D * (2c + 1))."""
    c = int(context_size)
    Yp = np.pad(Y, [(c, c), (0, 0)], "constant")
    T, D = Y.shape
    out = np.empty((T, D * (2 * c + 1)), Y.dtype)
    for j in range(2 * c + 1):
        out[:, j * D: (j + 1) * D] = Yp[j: j + T]
    return out


@tables.register("frontend_classes", "WavFrontendMel23")
class WavFrontendMel23:
    """Reference wav_frontend.py:500: per-utterance stft -> 23-mel log
    power -> splice(lfr_m) -> subsample(lfr_n); batch padded to the
    longest utterance."""

    def __init__(self, fs: int = 16000, frame_length: int = 25,
                 frame_shift: int = 10, lfr_m: int = 1, lfr_n: int = 1,
                 **kwargs):
        self.fs = fs
        self.frame_length = frame_length
        self.frame_shift = frame_shift
        self.lfr_m = lfr_m
        self.lfr_n = lfr_n
        self.n_mels = 23

    def output_size(self) -> int:
        return self.n_mels * (2 * self.lfr_m + 1)

    def __call__(self, wavs, lengths) -> Tuple[np.ndarray, np.ndarray]:
        """wavs (B, N) float; lengths (B,).  Returns (feats (B, T, D),
        feat_lengths (B,))."""
        wavs = np.asarray(wavs)
        lengths = np.asarray(lengths)
        feats = []
        for i in range(wavs.shape[0]):
            w = wavs[i, : int(lengths[i])]
            mat = stft(w, self.frame_length, self.frame_shift)
            mat = transform(mat)
            mat = splice(mat, context_size=self.lfr_m)
            feats.append(mat[:: self.lfr_n])
        flens = np.asarray([f.shape[0] for f in feats], np.int32)
        T = max(int(flens.max()), 1)
        out = np.zeros((len(feats), T, self.output_size()), np.float32)
        for i, f in enumerate(feats):
            out[i, : f.shape[0]] = f
        return out, flens
