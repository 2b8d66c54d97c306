"""ctypes bindings for the native (C++) audio runtime.

The reference keeps its serving audio path in C++
(runtime/onnxruntime/src/audio.cpp, resample.cpp); here the equivalent is
``runtime/native/libfta_audio.so`` — RIFF decode, PCM conversion,
windowed-sinc resample, streaming sample queue with a ms timeline — built
on first use with the in-tree Makefile and bound via ctypes.  When no C++
toolchain is available the pure-NumPy paths in ``funasr_tpu.utils.audio``
remain the fallback; ``is_available()`` reports which is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO = os.path.join(_DIR, "libfta_audio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _DIR], capture_output=True, text=True,
                           timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_DIR, "fta_audio.cc")
        if not os.path.exists(_SO) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:  # corrupt / wrong-arch .so: fall back to NumPy
            return None
        lib.fta_wav_decode.restype = ctypes.c_int
        lib.fta_wav_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.fta_resample.restype = ctypes.c_int64
        lib.fta_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.fta_resample_out_len.restype = ctypes.c_int64
        lib.fta_resample_out_len.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                             ctypes.c_int32]
        lib.fta_queue_new.restype = ctypes.c_void_p
        lib.fta_queue_new.argtypes = [ctypes.c_int32]
        lib.fta_queue_free.argtypes = [ctypes.c_void_p]
        lib.fta_queue_push.restype = ctypes.c_int
        lib.fta_queue_push.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int64]
        lib.fta_queue_push_pcm16.restype = ctypes.c_int
        lib.fta_queue_push_pcm16.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                             ctypes.c_size_t]
        lib.fta_queue_pop.restype = ctypes.c_int64
        lib.fta_queue_pop.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int64]
        lib.fta_queue_available.restype = ctypes.c_int64
        lib.fta_queue_available.argtypes = [ctypes.c_void_p]
        lib.fta_queue_consumed_ms.restype = ctypes.c_double
        lib.fta_queue_consumed_ms.argtypes = [ctypes.c_void_p]
        lib.fta_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def wav_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (float32 mono waveform, sample rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.fta_wav_decode(data, len(data), ctypes.byref(ptr),
                            ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"wav decode failed (code {rc})")
    try:
        out = np.ctypeslib.as_array(ptr, shape=(n.value,)).copy()
    finally:
        lib.fta_free(ptr)
    return out, int(rate.value)


def resample(x: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Windowed-sinc (Hann, 6-zero) resample; kaldi LinearResample-grade."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float32)
    ptr = ctypes.POINTER(ctypes.c_float)()
    n_out = lib.fta_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        rate_in, rate_out, ctypes.byref(ptr))
    if n_out < 0:
        raise ValueError("resample failed")
    try:
        out = np.ctypeslib.as_array(ptr, shape=(n_out,)).copy()
    finally:
        lib.fta_free(ptr)
    return out


class SampleQueue:
    """Streaming FIFO of float32 samples with a global ms timeline
    (reference runtime/onnxruntime/include/audio.h frame queue)."""

    def __init__(self, rate: int = 16000):
        lib = _load()
        if lib is None:
            raise RuntimeError("native audio library unavailable")
        self._lib = lib
        self._q = lib.fta_queue_new(rate)
        self.rate = rate

    def push(self, samples: np.ndarray):
        s = np.ascontiguousarray(samples, dtype=np.float32)
        self._lib.fta_queue_push(
            self._q, s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(s))

    def push_pcm16(self, data: bytes):
        self._lib.fta_queue_push_pcm16(self._q, data, len(data))

    def pop(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        got = self._lib.fta_queue_pop(
            self._q, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        return out[:got]

    @property
    def available(self) -> int:
        return int(self._lib.fta_queue_available(self._q))

    @property
    def consumed_ms(self) -> float:
        return float(self._lib.fta_queue_consumed_ms(self._q))

    def close(self):
        if self._q:
            self._lib.fta_queue_free(self._q)
            self._q = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def mp3_available() -> bool:
    """True when libfta_audio.so is built AND the system libmpg123 loads."""
    lib = _load()
    if lib is None:
        return False
    try:
        lib.fta_mp3_available.restype = ctypes.c_int
        return bool(lib.fta_mp3_available())
    except AttributeError:
        return False


def mp3_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """MP3 bytes -> (float32 mono waveform, sample rate) via the system
    libmpg123 (dlopen'd by the native runtime — the reference closes this
    format gap by linking ffmpeg, runtime/onnxruntime/src/audio.cpp)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    lib.fta_mp3_decode.restype = ctypes.c_int
    lib.fta_mp3_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.fta_mp3_decode(data, len(data), ctypes.byref(ptr),
                            ctypes.byref(n), ctypes.byref(rate))
    if rc == -1:
        raise RuntimeError("libmpg123 not available on this system")
    if rc != 0:
        raise ValueError(f"mp3 decode failed (code {rc})")
    try:
        out = np.ctypeslib.as_array(ptr, shape=(n.value,)).copy()
    finally:
        lib.fta_free(ptr)
    return out, int(rate.value)


def flac_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """FLAC bytes -> (float32 mono waveform, sample rate) via the native
    runtime's self-contained decoder (fta_flac.cc — the reference closes
    this format via ffmpeg, funasr/utils/load_utils.py:28)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    lib.fta_flac_decode.restype = ctypes.c_int
    lib.fta_flac_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.fta_flac_decode(data, len(data), ctypes.byref(ptr),
                             ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f"flac decode failed (code {rc})")
    try:
        out = np.ctypeslib.as_array(ptr, shape=(n.value,)).copy()
    finally:
        lib.fta_free(ptr)
    return out, int(rate.value)


def ogg_available() -> Tuple[bool, bool]:
    """(opus, vorbis) codec availability for Ogg container decode
    (fta_ogg.cc: demuxer in the native lib, codecs dlopen'd from the
    system libopus / libvorbisfile)."""
    lib = _load()
    if lib is None:
        return False, False
    try:
        lib.fta_ogg_opus_available.restype = ctypes.c_int
        lib.fta_ogg_vorbis_available.restype = ctypes.c_int
        return (bool(lib.fta_ogg_opus_available()),
                bool(lib.fta_ogg_vorbis_available()))
    except AttributeError:
        return False, False


def ogg_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """Ogg container bytes (.opus / .ogg vorbis) -> (float32 mono, rate)
    via fta_ogg.cc (the reference closes these formats through ffmpeg,
    funasr/utils/load_utils.py:28)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    lib.fta_ogg_decode.restype = ctypes.c_int
    lib.fta_ogg_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.fta_ogg_decode(data, len(data), ctypes.byref(ptr),
                            ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        what = {-1: "codec library unavailable", -2: "container parse",
                -3: "codec decode"}.get(rc, rc)
        raise ValueError(f"ogg decode failed ({what})")
    try:
        out = np.ctypeslib.as_array(ptr, shape=(n.value,)).copy()
    finally:
        lib.fta_free(ptr)
    return out, int(rate.value)
