"""Native FLAC decoder (runtime/native/fta_flac.cc) vs a test encoder.

The tests synthesize real FLAC byte streams covering the format surface
— STREAMINFO, frame headers, CONSTANT/VERBATIM/FIXED/LPC subframes, Rice
residual partitions, and mid/side stereo — and check sample-exact decode
(the reference decodes flac via ffmpeg, funasr/utils/load_utils.py:28)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

NATIVE = Path(__file__).resolve().parents[1] / "funasr_tpu/runtime/native"


@pytest.fixture(scope="module", autouse=True)
def _build():
    subprocess.run(["make", "-C", str(NATIVE), "libfta_audio.so"],
                   check=True, capture_output=True)


class BitWriter:
    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((int(v) >> i) & 1)

    def sw(self, v, n):  # signed, two's complement
        self.w(int(v) & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def streaminfo(sr, ch, bps, total):
    bw = BitWriter()
    bw.w(1, 1)       # last metadata block
    bw.w(0, 7)       # STREAMINFO
    bw.w(34, 24)
    bw.w(4096, 16); bw.w(4096, 16)
    bw.w(0, 24); bw.w(0, 24)
    bw.w(sr, 20); bw.w(ch - 1, 3); bw.w(bps - 1, 5)
    bw.w(total, 36)
    for _ in range(16):
        bw.w(0, 8)   # md5 (unverified)
    return bw.tobytes()


def frame_header(bw, blocksize, ch_asgn, frameno):
    bw.w(0x3FFE, 14)  # sync
    bw.w(0, 1)        # reserved
    bw.w(0, 1)        # fixed blocking
    bw.w(7, 4)        # blocksize: 16-bit follows
    bw.w(0, 4)        # sample rate: from STREAMINFO
    bw.w(ch_asgn, 4)
    bw.w(4, 3)        # 16 bps
    bw.w(0, 1)
    assert frameno < 0x80
    bw.w(frameno, 8)  # utf8 number (single byte)
    bw.w(blocksize - 1, 16)
    bw.w(0, 8)        # crc8 (unverified)


def sub_verbatim(bw, samples, bps):
    bw.w(0, 1); bw.w(1, 6); bw.w(0, 1)
    for s in samples:
        bw.sw(s, bps)


def sub_constant(bw, value, bps):
    bw.w(0, 1); bw.w(0, 6); bw.w(0, 1)
    bw.sw(value, bps)


def _rice(bw, residual, param):
    bw.w(0, 2)       # rice method 0 (4-bit params)
    bw.w(0, 4)       # partition order 0
    bw.w(param, 4)
    for r in residual:
        u = (int(r) << 1) ^ (int(r) >> 63) if r >= 0 else ((-int(r)) << 1) - 1
        q, rem = u >> param, u & ((1 << param) - 1)
        for _ in range(q):
            bw.w(0, 1)
        bw.w(1, 1)
        bw.w(rem, param)


def sub_fixed(bw, samples, order, bps, param=6):
    bw.w(0, 1); bw.w(8 + order, 6); bw.w(0, 1)
    a = [int(s) for s in samples]
    for i in range(order):
        bw.sw(a[i], bps)
    res = []
    for i in range(order, len(a)):
        if order == 1:
            res.append(a[i] - a[i - 1])
        elif order == 2:
            res.append(a[i] - 2 * a[i - 1] + a[i - 2])
        else:
            res.append(a[i])
    _rice(bw, res, param)


def sub_lpc_order1(bw, samples, bps, param=6):
    """LPC order 1, coef=[1], shift 0 — residuals equal fixed order 1."""
    bw.w(0, 1); bw.w(32, 6); bw.w(0, 1)   # LPC order 1 (type 31+1)
    a = [int(s) for s in samples]
    bw.sw(a[0], bps)
    bw.w(13, 4)       # precision-1 -> 14-bit coefficients
    bw.sw(0, 5)       # shift
    bw.sw(1, 14)      # coefficient 1
    _rice(bw, [a[i] - a[i - 1] for i in range(1, len(a))], param)


def finish_frame(bw):
    bw.align()
    bw.w(0, 16)       # crc16 (unverified)


def decode(data):
    from funasr_tpu.runtime import native_audio

    return native_audio.flac_decode(data)


def test_verbatim_mono():
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32767, size=400, dtype=np.int64)
    bw = BitWriter()
    frame_header(bw, 400, 0, 0)
    sub_verbatim(bw, pcm, 16)
    finish_frame(bw)
    data = b"fLaC" + streaminfo(16000, 1, 16, 400) + bw.tobytes()
    wav, rate = decode(data)
    assert rate == 16000
    np.testing.assert_allclose(wav, pcm / 32768.0, atol=1e-7)


def test_fixed_and_lpc_rice_multi_frame():
    t = np.arange(600)
    pcm = (3000 * np.sin(2 * np.pi * t / 50)).astype(np.int64)
    bw = BitWriter()
    frame_header(bw, 200, 0, 0)
    sub_fixed(bw, pcm[:200], 2, 16)
    finish_frame(bw)
    frame_header(bw, 200, 0, 1)
    sub_fixed(bw, pcm[200:400], 1, 16)
    finish_frame(bw)
    frame_header(bw, 200, 0, 2)
    sub_lpc_order1(bw, pcm[400:], 16)
    finish_frame(bw)
    data = b"fLaC" + streaminfo(8000, 1, 16, 600) + bw.tobytes()
    wav, rate = decode(data)
    assert rate == 8000 and len(wav) == 600
    np.testing.assert_allclose(wav, pcm / 32768.0, atol=1e-7)


def test_mid_side_stereo_and_constant():
    rng = np.random.default_rng(1)
    left = rng.integers(-20000, 20000, size=192, dtype=np.int64)
    right = rng.integers(-20000, 20000, size=192, dtype=np.int64)
    mid = (left + right) >> 1
    side = left - right
    bw = BitWriter()
    frame_header(bw, 192, 10, 0)           # mid/side
    sub_verbatim(bw, mid, 16)
    sub_verbatim(bw, side, 17)             # side carries +1 bit
    finish_frame(bw)
    frame_header(bw, 192, 1, 1)            # independent stereo, constant
    sub_constant(bw, 0, 16)
    sub_constant(bw, 0, 16)
    finish_frame(bw)
    data = b"fLaC" + streaminfo(16000, 2, 16, 384) + bw.tobytes()
    wav, rate = decode(data)
    assert len(wav) == 384
    want = np.concatenate([(left + right) / 2.0 / 32768.0,
                           np.zeros(192)])
    np.testing.assert_allclose(wav, want, atol=1e-7)


def test_load_audio_flac_path(tmp_path):
    from funasr_tpu.utils.audio import load_audio

    pcm = (2000 * np.sin(2 * np.pi * np.arange(640) / 32)).astype(np.int64)
    bw = BitWriter()
    frame_header(bw, 640, 0, 0)
    sub_verbatim(bw, pcm, 16)
    finish_frame(bw)
    p = tmp_path / "a.flac"
    p.write_bytes(b"fLaC" + streaminfo(16000, 1, 16, 640) + bw.tobytes())
    wav = load_audio(str(p), fs=16000)
    np.testing.assert_allclose(wav, pcm / 32768.0, atol=1e-6)


def test_bad_stream_raises():
    with pytest.raises(ValueError):
        decode(b"fLaCgarbagegarbagegarbagegarbagegarbagegarbage")
    with pytest.raises(ValueError):
        decode(b"RIFFnotflacnotflacnotflacnotflacnotflacnotflac")
