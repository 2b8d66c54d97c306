"""Streaming fbank+LFR+CMVN frontend (reference
funasr/frontends/wav_frontend.py:212 ``WavFrontendOnline``).

State (host-side, per stream): leftover samples below a frame boundary, and
the LFR splice cache of fbank frames not yet consumed by a complete LFR
window.  Chunked output is bit-identical to the offline frontend on the same
audio (verified in tests/test_streaming.py), with the same left-pad
(first-frame replication) and final-chunk tail replication.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from funasr_tpu.ops import fbank as F


@dataclass
class FrontendState:
    sample_cache: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    splice_cache: Optional[np.ndarray] = None  # (n_cached, n_mels)
    first: bool = True


class StreamingFrontend:
    def __init__(self, fs=16000, n_mels=80, lfr_m=7, lfr_n=6, cmvn=None,
                 window="hamming", frame_length_ms=25.0, frame_shift_ms=10.0,
                 **kw):
        self.fs = fs
        self.n_mels = n_mels
        self.lfr_m = lfr_m
        self.lfr_n = lfr_n
        self.window = window
        self.frame_len = int(fs * frame_length_ms / 1000)
        self.frame_shift = int(fs * frame_shift_ms / 1000)
        if cmvn is None:
            d = n_mels * lfr_m
            cmvn = np.stack([np.zeros(d, np.float32), np.ones(d, np.float32)])
        self.cmvn = jnp.asarray(cmvn)

    def init_state(self) -> FrontendState:
        return FrontendState()

    def step(
        self, state: FrontendState, samples: np.ndarray, is_final: bool = False
    ) -> Tuple[np.ndarray, FrontendState]:
        """Feed a chunk of samples; returns (lfr_cmvn_feats (T', m*mels), state)."""
        buf = np.concatenate([state.sample_cache, np.asarray(samples, np.float32)])
        n_frames = max(0, (len(buf) - self.frame_len) // self.frame_shift + 1)
        new_frames = np.zeros((0, self.n_mels), np.float32)
        if n_frames > 0:
            consumed = n_frames * self.frame_shift
            state.sample_cache = buf[consumed:]
            feats, _ = F.fbank(
                jnp.asarray(buf[None, : (n_frames - 1) * self.frame_shift
                                + self.frame_len]),
                jnp.asarray([len(buf)], jnp.int32),
                num_mel_bins=self.n_mels, fs=self.fs, window_type=self.window,
                dither=0.0,
            )
            new_frames = np.asarray(feats[0, :n_frames])
        else:
            state.sample_cache = buf

        if self.lfr_m == 1 and self.lfr_n == 1:
            out = new_frames
        else:
            if state.splice_cache is None:
                if len(new_frames) == 0:
                    return np.zeros((0, self.n_mels * self.lfr_m), np.float32), state
                left = (self.lfr_m - 1) // 2
                state.splice_cache = np.repeat(new_frames[:1], left, axis=0)
            frames = np.concatenate([state.splice_cache, new_frames], axis=0)
            T = len(frames)
            if is_final:
                # offline tail semantics: T_lfr windows, replicate last frame
                right = (self.lfr_m - 1) // 2
                T_lfr = max(0, int(np.ceil((T - right) / self.lfr_n)))
                if T_lfr == 0:
                    return (np.zeros((0, self.n_mels * self.lfr_m),
                                     np.float32), state)
                idx = (np.arange(T_lfr)[:, None] * self.lfr_n
                       + np.arange(self.lfr_m)[None, :])
                idx = np.minimum(idx, T - 1)
                out = frames[idx].reshape(T_lfr, -1)
                state.splice_cache = frames[T_lfr * self.lfr_n:]
            else:
                # only complete windows (full right context available)
                T_lfr = max(0, (T - self.lfr_m) // self.lfr_n + 1)
                if T_lfr > 0:
                    idx = (np.arange(T_lfr)[:, None] * self.lfr_n
                           + np.arange(self.lfr_m)[None, :])
                    out = frames[idx].reshape(T_lfr, -1)
                    state.splice_cache = frames[T_lfr * self.lfr_n:]
                else:
                    out = np.zeros((0, self.n_mels * self.lfr_m), np.float32)
                    state.splice_cache = frames
        if len(out):
            out = np.asarray(F.apply_cmvn(jnp.asarray(out[None]), self.cmvn))[0]
        return out.astype(np.float32), state
