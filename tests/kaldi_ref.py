"""Independent NumPy implementation of kaldi fbank / LFR / CMVN.

Written directly from the Kaldi feature-extraction definition (compute-fbank
semantics as documented in kaldi/src/feat) as a test oracle for the JAX
frontend.  Deliberately simple and loop-based; NOT derived from the reference
repo's code.
"""

import numpy as np


def hz_to_mel(hz):
    return 1127.0 * np.log1p(np.asarray(hz, dtype=np.float64) / 700.0)


def fbank_single(
    wav: np.ndarray,
    fs: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    window: str = "hamming",
    preemph: float = 0.97,
    remove_dc: bool = True,
    low_freq: float = 20.0,
) -> np.ndarray:
    """(N,) waveform (already scaled) -> (T, num_mel_bins) log-mel, dither=0."""
    wav = np.asarray(wav, dtype=np.float64)
    frame_len = int(fs * frame_length_ms / 1000)
    shift = int(fs * frame_shift_ms / 1000)
    padded = 1
    while padded < frame_len:
        padded *= 2
    num_frames = max(0, (len(wav) - frame_len) // shift + 1)

    n = np.arange(frame_len)
    if window == "hamming":
        win = 0.54 - 0.46 * np.cos(2 * np.pi * n / (frame_len - 1))
    elif window == "povey":
        win = (0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_len - 1))) ** 0.85
    else:
        raise ValueError(window)

    # mel banks on fft bin centre freqs; nyquist bin unused
    nyquist = fs / 2.0
    mel_low, mel_high = hz_to_mel(low_freq), hz_to_mel(nyquist)
    delta = (mel_high - mel_low) / (num_mel_bins + 1)
    bin_freqs = hz_to_mel(np.arange(padded // 2) * fs / padded)
    banks = np.zeros((num_mel_bins, padded // 2 + 1))
    for m in range(num_mel_bins):
        left, center, right = mel_low + m * delta, mel_low + (m + 1) * delta, mel_low + (m + 2) * delta
        for k, f in enumerate(bin_freqs):
            if left < f < right:
                banks[m, k] = (f - left) / (center - left) if f <= center else (right - f) / (right - center)

    out = np.zeros((num_frames, num_mel_bins))
    for t in range(num_frames):
        frame = wav[t * shift : t * shift + frame_len].copy()
        if remove_dc:
            frame -= frame.mean()
        if preemph:
            frame[1:] -= preemph * frame[:-1]
            frame[0] -= preemph * frame[0]
        frame *= win
        spec = np.fft.rfft(frame, n=padded)
        power = np.abs(spec) ** 2
        mel = banks @ power
        out[t] = np.log(np.maximum(mel, np.finfo(np.float32).eps))
    return out.astype(np.float32)


def apply_lfr_single(feats: np.ndarray, lfr_m: int, lfr_n: int) -> np.ndarray:
    """(T, D) -> (ceil(T/n), m*D); left-pad (m-1)//2 first-frame copies,
    replicate last frame at the tail."""
    T, D = feats.shape
    left = (lfr_m - 1) // 2
    T_out = int(np.ceil(T / lfr_n))
    padded = np.concatenate([np.repeat(feats[:1], left, 0), feats], axis=0)
    rows = []
    for i in range(T_out):
        idx = np.minimum(i * lfr_n + np.arange(lfr_m), len(padded) - 1)
        rows.append(padded[idx].reshape(-1))
    return np.stack(rows).astype(np.float32)
