"""Generic container decode via the SYSTEM ffmpeg 5.x libraries (ctypes).

Role: the reference decodes mp4/m4a/webm/anything through ffmpeg
(funasr/utils/load_utils.py:28-48; runtime/onnxruntime links ffmpeg).
This image ships ffmpeg 5.1's shared libraries (libavformat.so.59,
libavcodec.so.59, libavutil.so.57) but no binary, no headers and no PyAV —
so this module drives the C API directly through ctypes:

    avformat_open_input(path) -> find_best_stream(AUDIO) ->
    avcodec send/receive loop -> numpy sample-format conversion -> mono

Struct-field access is limited to FIVE offsets of the public ABI, each
frozen for the library major version and VERSION-GATED at load
(`avformat_version()>>16 == 59` and avutil major 57 required, else this
module reports unavailable and callers fall back to the clear
"unsupported format" error):

    AVFormatContext.nb_streams @ 44, .streams @ 48   (lavf 59)
    AVStream.codecpar          @ 208                  (lavf 59)
    AVCodecParameters.channels @ 112, .sample_rate @ 116  (lavc 59,
        validated at open: rate must equal the decoded frames' rate)
    AVPacket.stream_index      @ 36                   (lavc 59)
    AVFrame.extended_data @ 96, .nb_samples @ 112,
            .format @ 116, .sample_rate @ 208         (lavu 57)

The stream's channel count comes from codecpar (validated 1..32) — NOT
from linesize[0] (decoders align it up, so small tail frames would
mis-derive it) and NOT by walking data[] for a NULL (the 8-entry array is
not NULL-terminated at exactly 8 channels).  Sample values convert per
AVSampleFormat in numpy (no swresample).

Decoded sample rate is validated (8k..384k) so a broken offset can only
fail loudly, never silently corrupt audio.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

_AVMEDIA_TYPE_AUDIO = 1
_AVERROR_EAGAIN = -11
_AVERROR_EOF = -0x20464F45  # FFERRTAG('E','O','F',' ')

# AVSampleFormat -> (numpy dtype, planar)
_FMTS = {
    0: (np.uint8, False), 1: (np.int16, False), 2: (np.int32, False),
    3: (np.float32, False), 4: (np.float64, False),
    5: (np.uint8, True), 6: (np.int16, True), 7: (np.int32, True),
    8: (np.float32, True), 9: (np.float64, True),
    10: (np.int64, False), 11: (np.int64, True),
}

_O_NB_STREAMS, _O_STREAMS = 44, 48
_O_CODECPAR = 208
_O_PKT_STREAM_INDEX = 36
_O_FRM_EXT_DATA, _O_FRM_NB_SAMPLES = 96, 112
_O_FRM_FORMAT, _O_FRM_SAMPLE_RATE = 116, 208
_O_FRM_DATA, _O_FRM_LINESIZE = 0, 64
_O_PAR_CHANNELS, _O_PAR_SAMPLE_RATE = 112, 116


class _Libs:
    def __init__(self):
        self.fmt = ctypes.CDLL("libavformat.so.59")
        self.cod = ctypes.CDLL("libavcodec.so.59")
        self.utl = ctypes.CDLL("libavutil.so.57")
        for f in (self.fmt.avformat_version, self.utl.avutil_version,
                  self.cod.avcodec_version):
            f.restype = ctypes.c_uint
        if (self.fmt.avformat_version() >> 16 != 59
                or self.utl.avutil_version() >> 16 != 57
                or self.cod.avcodec_version() >> 16 != 59):
            raise OSError("ffmpeg ABI majors != 59/57 — offsets not valid")
        P = ctypes.c_void_p
        self.fmt.avformat_open_input.argtypes = [ctypes.POINTER(P),
                                                 ctypes.c_char_p, P, P]
        self.fmt.avformat_find_stream_info.argtypes = [P, P]
        self.fmt.av_find_best_stream.argtypes = [P, ctypes.c_int,
                                                 ctypes.c_int, ctypes.c_int,
                                                 ctypes.POINTER(P),
                                                 ctypes.c_int]
        self.fmt.av_read_frame.argtypes = [P, P]
        self.fmt.avformat_close_input.argtypes = [ctypes.POINTER(P)]
        self.cod.avcodec_alloc_context3.restype = P
        self.cod.avcodec_alloc_context3.argtypes = [P]
        self.cod.avcodec_parameters_to_context.argtypes = [P, P]
        self.cod.avcodec_open2.argtypes = [P, P, P]
        self.cod.avcodec_send_packet.argtypes = [P, P]
        self.cod.avcodec_receive_frame.argtypes = [P, P]
        self.cod.avcodec_free_context.argtypes = [ctypes.POINTER(P)]
        self.cod.av_packet_alloc.restype = P
        self.cod.av_packet_free.argtypes = [ctypes.POINTER(P)]
        self.cod.av_packet_unref.argtypes = [P]
        self.utl.av_frame_alloc.restype = P
        self.utl.av_frame_free.argtypes = [ctypes.POINTER(P)]
        self.utl.av_frame_unref.argtypes = [P]
        self.utl.av_get_bytes_per_sample.argtypes = [ctypes.c_int]
        self.utl.av_get_bytes_per_sample.restype = ctypes.c_int


_LIBS: Optional[_Libs] = None
_TRIED = False


def _libs() -> Optional[_Libs]:
    global _LIBS, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIBS = _Libs()
        except OSError:
            _LIBS = None
    return _LIBS


def is_available() -> bool:
    return _libs() is not None


def _i32(ptr: int, off: int) -> int:
    return ctypes.cast(ptr + off, ctypes.POINTER(ctypes.c_int))[0]


def _u32(ptr: int, off: int) -> int:
    return ctypes.cast(ptr + off, ctypes.POINTER(ctypes.c_uint))[0]


def _ptr(ptr: int, off: int) -> int:
    return ctypes.cast(ptr + off, ctypes.POINTER(ctypes.c_void_p))[0] or 0


def _frame_to_mono(L: _Libs, frm: int, nch: int) -> Tuple[np.ndarray, int]:
    n = _i32(frm, _O_FRM_NB_SAMPLES)
    fmt = _i32(frm, _O_FRM_FORMAT)
    rate = _i32(frm, _O_FRM_SAMPLE_RATE)
    if n <= 0 or fmt not in _FMTS or not (8000 <= rate <= 384000):
        raise ValueError(f"ffmpeg frame out of range (n={n}, fmt={fmt}, "
                         f"rate={rate}) — ABI offset mismatch?")
    dtype, planar = _FMTS[fmt]
    bps = L.utl.av_get_bytes_per_sample(fmt)

    def read(p, count):
        buf = ctypes.string_at(p, count * bps)
        x = np.frombuffer(buf, dtype=dtype).astype(np.float64)
        if dtype == np.uint8:
            return (x - 128.0) / 128.0
        if np.issubdtype(dtype, np.integer):
            return x / float(np.iinfo(dtype).max + 1)
        return x

    if planar:
        # exactly nch planes: data[] for the first 8, extended_data past
        # that (reading a fixed count never walks off either array)
        ext = _ptr(frm, _O_FRM_EXT_DATA)
        chans = []
        for ci in range(nch):
            p = (_ptr(frm + _O_FRM_DATA, 8 * ci) if ci < 8
                 else _ptr(ext, 8 * ci))
            if not p:
                raise ValueError("ffmpeg planar frame missing plane "
                                 f"{ci}/{nch}")
            chans.append(read(p, n))
        mono = np.mean(chans, axis=0)
    else:
        p = _ptr(frm, _O_FRM_DATA)
        x = read(p, n * nch).reshape(n, nch)
        mono = x.mean(axis=1)
    return mono.astype(np.float32), rate


def decode(path: str) -> Tuple[np.ndarray, int]:
    """Decode ANY ffmpeg-supported container/codec from ``path`` to
    (float32 mono waveform, native sample rate)."""
    L = _libs()
    if L is None:
        raise RuntimeError("system ffmpeg 5.x libraries unavailable")
    ctx = ctypes.c_void_p()
    if L.fmt.avformat_open_input(ctypes.byref(ctx), path.encode(), None,
                                 None) < 0:
        raise ValueError(f"ffmpeg could not open {path!r}")
    cctx = pkt = frm = None
    try:
        if L.fmt.avformat_find_stream_info(ctx, None) < 0:
            raise ValueError("ffmpeg: no stream info")
        dec = ctypes.c_void_p()
        idx = L.fmt.av_find_best_stream(ctx, _AVMEDIA_TYPE_AUDIO, -1, -1,
                                        ctypes.byref(dec), 0)
        if idx < 0 or not dec:
            raise ValueError("ffmpeg: no decodable audio stream")
        streams = _ptr(ctx.value, _O_STREAMS)
        nb = _u32(ctx.value, _O_NB_STREAMS)
        if idx >= nb:
            raise ValueError("ffmpeg: stream index out of range")
        stream = _ptr(streams, 8 * idx)
        codecpar = _ptr(stream, _O_CODECPAR)
        nch = _i32(codecpar, _O_PAR_CHANNELS)
        par_rate = _i32(codecpar, _O_PAR_SAMPLE_RATE)
        if not (1 <= nch <= 32) or not (8000 <= par_rate <= 384000):
            raise ValueError(f"ffmpeg codecpar out of range (channels="
                             f"{nch}, rate={par_rate}) — ABI mismatch?")
        cctx = ctypes.c_void_p(L.cod.avcodec_alloc_context3(dec))
        if (L.cod.avcodec_parameters_to_context(cctx, codecpar) < 0
                or L.cod.avcodec_open2(cctx, dec, None) < 0):
            raise ValueError("ffmpeg: cannot open decoder")
        pkt = ctypes.c_void_p(L.cod.av_packet_alloc())
        frm = ctypes.c_void_p(L.utl.av_frame_alloc())

        pieces = []
        rate = 0

        def drain():
            nonlocal rate
            while True:
                rc = L.cod.avcodec_receive_frame(cctx, frm)
                if rc in (_AVERROR_EAGAIN, _AVERROR_EOF):
                    return
                if rc < 0:
                    raise ValueError(f"ffmpeg decode error {rc}")
                mono, r = _frame_to_mono(L, frm.value, nch)
                if r != par_rate:
                    raise ValueError("ffmpeg: frame rate != codecpar rate")
                rate = r
                pieces.append(mono)
                L.utl.av_frame_unref(frm)

        while L.fmt.av_read_frame(ctx, pkt) >= 0:
            try:
                if _i32(pkt.value, _O_PKT_STREAM_INDEX) == idx:
                    if L.cod.avcodec_send_packet(cctx, pkt) == 0:
                        drain()
            finally:
                L.cod.av_packet_unref(pkt)
        L.cod.avcodec_send_packet(cctx, None)  # flush
        drain()
        if not pieces:
            raise ValueError("ffmpeg: no audio decoded")
        return np.concatenate(pieces), rate
    finally:
        if pkt:
            L.cod.av_packet_free(ctypes.byref(pkt))
        if frm:
            L.utl.av_frame_free(ctypes.byref(frm))
        if cctx:
            L.cod.avcodec_free_context(ctypes.byref(cctx))
        L.fmt.avformat_close_input(ctypes.byref(ctx))
