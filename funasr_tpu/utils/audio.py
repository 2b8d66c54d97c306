"""Audio I/O without external deps (reference funasr/utils/load_utils.py:48
uses torchaudio/ffmpeg; here: stdlib ``wave`` for RIFF, raw PCM16, float
arrays, with a polyphase-free linear resampler matching the C++ runtime's
``LinearResample`` behavior closely enough for 8k->16k).
"""

from __future__ import annotations

import os
import wave
from typing import Optional, Tuple, Union

import numpy as np


def _native():
    """The C++ audio runtime (runtime/native/libfta_audio.so) when built;
    None otherwise — callers fall back to the NumPy paths below."""
    try:
        from funasr_tpu.runtime import native_audio

        return native_audio if native_audio.is_available() else None
    except Exception:
        return None


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a RIFF/WAVE file -> (float32 mono waveform in [-1, 1], fs)."""
    nat = _native()
    if nat is not None:
        with open(path, "rb") as f:
            return nat.wav_decode(f.read())
    with wave.open(path, "rb") as w:
        fs = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, fs


def load_mp3(path: str) -> Tuple[np.ndarray, int]:
    """Decode an MP3 via the native runtime's dlopen'd libmpg123 (the
    reference handles compressed audio through ffmpeg,
    funasr/utils/load_utils.py:28 / runtime/onnxruntime/src/audio.cpp)."""
    from funasr_tpu.runtime import native_audio

    if not native_audio.mp3_available():
        raise RuntimeError(
            "mp3 decode needs runtime/native/libfta_audio.so + system "
            "libmpg123 (make -C funasr_tpu/runtime/native)")
    with open(path, "rb") as f:
        return native_audio.mp3_decode(f.read())


def load_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file via the native runtime's self-contained decoder
    (runtime/native/fta_flac.cc; the reference closes flac via ffmpeg,
    load_utils.py:28)."""
    from funasr_tpu.runtime import native_audio

    if not native_audio.is_available():
        raise RuntimeError(
            "flac decode needs runtime/native/libfta_audio.so "
            "(make -C funasr_tpu/runtime/native)")
    with open(path, "rb") as f:
        return native_audio.flac_decode(f.read())


def load_pcm(path: str, dtype="<i2") -> np.ndarray:
    data = np.fromfile(path, dtype=dtype).astype(np.float32) / 32768.0
    return data


def resample_linear(x: np.ndarray, fs_in: int, fs_out: int) -> np.ndarray:
    """Linear-interpolation resample (runtime/onnxruntime/src/resample.cpp
    equivalent for the common 8k/22k/44.1k -> 16k serving path)."""
    if fs_in == fs_out:
        return x
    nat = _native()
    if nat is not None:
        return nat.resample(x, fs_in, fs_out)
    n_out = int(round(len(x) * fs_out / fs_in))
    t_out = np.arange(n_out, dtype=np.float64) * fs_in / fs_out
    return np.interp(t_out, np.arange(len(x), dtype=np.float64), x).astype(np.float32)


def load_ogg(path: str) -> Tuple[np.ndarray, int]:
    """Ogg container decode (.opus / .ogg vorbis) via the native demuxer +
    dlopen'd system codecs (runtime/native/fta_ogg.cc; the reference
    decodes these via ffmpeg, funasr/utils/load_utils.py:28)."""
    from funasr_tpu.runtime import native_audio

    opus_ok, vorbis_ok = native_audio.ogg_available()
    if not (opus_ok or vorbis_ok):
        raise RuntimeError(
            "ogg decode needs runtime/native/libfta_audio.so + system "
            "libopus/libvorbisfile (make -C funasr_tpu/runtime/native)")
    with open(path, "rb") as f:
        return native_audio.ogg_decode(f.read())


def load_audio(
    source: Union[str, bytes, np.ndarray],
    fs: int = 16000,
    audio_fs: Optional[int] = None,
) -> np.ndarray:
    """Accepts a wav/pcm path, raw PCM16 bytes, or a float array; returns a
    float32 mono waveform at ``fs`` (reference load_audio_text_image_video,
    load_utils.py:48, for the audio modality)."""
    if isinstance(source, np.ndarray):
        wav = source.astype(np.float32)
        in_fs = audio_fs or fs
    elif isinstance(source, (bytes, bytearray)):
        wav = np.frombuffer(bytes(source), dtype="<i2").astype(np.float32) / 32768.0
        in_fs = audio_fs or fs
    elif isinstance(source, str):
        ext = os.path.splitext(source)[1].lower()
        if ext == ".wav":
            wav, in_fs = load_wav(source)
        elif ext == ".pcm":
            wav, in_fs = load_pcm(source), (audio_fs or fs)
        elif ext == ".mp3":
            wav, in_fs = load_mp3(source)
        elif ext == ".flac":
            wav, in_fs = load_flac(source)
        elif ext in (".ogg", ".oga", ".opus"):
            wav, in_fs = load_ogg(source)
        else:
            # any other container (mp4/m4a/aac/webm/...) through the
            # system ffmpeg 5.x libraries (utils/ffmpeg_audio.py ctypes
            # driver — the reference's load_utils.py:28 ffmpeg fallback)
            from funasr_tpu.utils import ffmpeg_audio

            if ffmpeg_audio.is_available():
                wav, in_fs = ffmpeg_audio.decode(source)
            else:
                raise ValueError(
                    f"unsupported audio format {ext!r} (wav/pcm/mp3/flac/"
                    "ogg/opus natively; mp4/m4a/... need the system "
                    "ffmpeg libraries)"
                )
    else:
        raise TypeError(f"cannot load audio from {type(source)}")
    return resample_linear(wav, in_fs, fs)
