"""ctypes binding for the native (C++) VAD endpoint state machine.

The reference runs endpoint detection natively in its serving runtime
(runtime/onnxruntime/src/e2e-vad.h); ``runtime/native/libfta_vad.so`` is
the equivalent here — per-10ms-frame control flow in C++, removing the
Python interpreter from the long-audio path while the FSMN scorer stays on
the TPU.  Semantics are identical to the pure-Python
``funasr_tpu.models.fsmn_vad.model.VadStateMachine`` (asserted in
tests/test_native_vad.py); that class remains the fallback when no C++
toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO = os.path.join(_DIR, "libfta_vad.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _DIR, "libfta_vad.so"],
                           capture_output=True, text=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_DIR, "fta_vad.cc")
        if not os.path.exists(_SO) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.fta_vad_create.restype = ctypes.c_void_p
        lib.fta_vad_create.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.fta_vad_feed.restype = None
        lib.fta_vad_feed.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int]
        lib.fta_vad_pop.restype = ctypes.c_int
        lib.fta_vad_pop.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int]
        lib.fta_vad_destroy.restype = None
        lib.fta_vad_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


class NativeVadStateMachine:
    """Drop-in replacement for models.fsmn_vad.model.VadStateMachine
    (same ``feed`` / ``pop_segments`` surface) backed by libfta_vad."""

    def __init__(self, opts):
        lib = _load()
        if lib is None:
            raise RuntimeError("libfta_vad.so unavailable")
        self._lib = lib
        packed = (ctypes.c_double * 16)(
            float(opts.detect_mode), float(opts.max_end_silence_time),
            float(opts.max_start_silence_time), float(opts.window_size_ms),
            float(opts.sil_to_speech_time_thres),
            float(opts.speech_to_sil_time_thres),
            float(opts.speech_2_noise_ratio), float(opts.do_extend),
            float(opts.lookback_time_start_point),
            float(opts.lookahead_time_end_point),
            float(opts.max_single_segment_time),
            float(opts.noise_frame_num_used_for_snr),
            float(opts.decibel_thres), float(opts.snr_thres),
            float(opts.speech_noise_thres), float(opts.frame_in_ms),
        )
        self._h = lib.fta_vad_create(packed)

    def feed(self, sil_probs: np.ndarray, decibels: np.ndarray,
             is_final: bool = False):
        sp = np.ascontiguousarray(sil_probs, np.float64)
        db = np.ascontiguousarray(decibels, np.float64)
        n = len(sp)
        self._lib.fta_vad_feed(
            self._h, sp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            db.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, 1 if is_final else 0)

    def pop_segments(self, streaming: bool = True) -> List[List[int]]:
        cap = 256
        buf = (ctypes.c_int64 * (2 * cap))()
        out: List[List[int]] = []
        while True:
            n = self._lib.fta_vad_pop(self._h, 1 if streaming else 0,
                                      buf, cap)
            out.extend([int(buf[2 * i]), int(buf[2 * i + 1])]
                       for i in range(n))
            if n < cap:
                return out

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.fta_vad_destroy(h)
            self._h = None
