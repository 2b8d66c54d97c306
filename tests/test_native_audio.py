"""Native (C++) audio runtime: build, bind, golden-check vs NumPy."""

import io
import os
import wave

import numpy as np
import pytest

from funasr_tpu.runtime import native_audio

pytestmark = pytest.mark.skipif(
    not native_audio.is_available(), reason="no C++ toolchain"
)


def _wav_bytes(x16: np.ndarray, rate: int = 16000, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x16.tobytes())
    return buf.getvalue()


def test_wav_decode_roundtrip(rng):
    x = (rng.standard_normal(1600) * 8000).astype(np.int16)
    out, rate = native_audio.wav_decode(_wav_bytes(x, 8000))
    assert rate == 8000 and out.shape == (1600,)
    np.testing.assert_allclose(out, x.astype(np.float32) / 32768.0, atol=1e-7)


def test_wav_decode_stereo_mean(rng):
    x = (rng.standard_normal(400) * 8000).astype(np.int16)
    st = np.stack([x, -x], 1).reshape(-1)  # L/R cancel -> zeros
    out, rate = native_audio.wav_decode(_wav_bytes(st, 16000, channels=2))
    assert rate == 16000
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native_audio.wav_decode(b"not a wav file at all.....")


def test_resample_preserves_tone():
    # 440 Hz sine at 8 kHz -> 16 kHz: spectrum peak must stay at 440 Hz
    t = np.arange(8000) / 8000.0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native_audio.resample(x, 8000, 16000)
    assert len(y) == 16000
    spec = np.abs(np.fft.rfft(y[1000:15000] * np.hanning(14000)))
    f = np.fft.rfftfreq(14000, 1 / 16000.0)
    assert abs(f[np.argmax(spec)] - 440.0) < 2.0
    # amplitude preserved within a few percent away from the edges
    assert abs(np.abs(y[2000:14000]).max() - 1.0) < 0.05


def test_resample_downsample_441_to_16k():
    t = np.arange(44100) / 44100.0
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = native_audio.resample(x, 44100, 16000)
    assert len(y) == 16000
    spec = np.abs(np.fft.rfft(y[1000:15000] * np.hanning(14000)))
    f = np.fft.rfftfreq(14000, 1 / 16000.0)
    assert abs(f[np.argmax(spec)] - 1000.0) < 3.0


def test_resample_identity(rng):
    x = rng.standard_normal(1234).astype(np.float32)
    y = native_audio.resample(x, 16000, 16000)
    np.testing.assert_array_equal(x, y)


def test_sample_queue_timeline(rng):
    q = native_audio.SampleQueue(16000)
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(600).astype(np.float32)
    q.push(a)
    q.push_pcm16((rng.standard_normal(320) * 8000).astype(np.int16).tobytes())
    q.push(b)
    assert q.available == 1920
    first = q.pop(800)
    np.testing.assert_array_equal(first, a[:800])
    assert q.consumed_ms == pytest.approx(50.0)  # 800/16000 s
    rest = q.pop(5000)
    assert len(rest) == 1120
    np.testing.assert_array_equal(rest[:200], a[800:])
    np.testing.assert_array_equal(rest[-600:], b)
    assert q.available == 0
    assert q.consumed_ms == pytest.approx(120.0)
    q.close()


# ------------------------------------------------------------------ mp3

def _lame_encode(wav, fs=16000):
    """Encode float mono -> mp3 bytes via the system libmp3lame (test
    fixture generator only; serving only ever decodes)."""
    import ctypes

    lame = ctypes.CDLL("libmp3lame.so.0")
    lame.lame_init.restype = ctypes.c_void_p
    gfp = lame.lame_init()
    lame.lame_set_in_samplerate(ctypes.c_void_p(gfp), fs)
    lame.lame_set_num_channels(ctypes.c_void_p(gfp), 1)
    lame.lame_set_mode(ctypes.c_void_p(gfp), 3)  # mono
    lame.lame_set_brate(ctypes.c_void_p(gfp), 64)
    assert lame.lame_init_params(ctypes.c_void_p(gfp)) >= 0
    pcm = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    nbuf = len(pcm) * 2 + 7200
    buf = (ctypes.c_ubyte * nbuf)()
    n1 = lame.lame_encode_buffer(
        ctypes.c_void_p(gfp), pcm.ctypes.data_as(ctypes.c_void_p), None,
        len(pcm), buf, nbuf)
    assert n1 >= 0
    buf2 = (ctypes.c_ubyte * 7200)()
    n2 = lame.lame_encode_flush(ctypes.c_void_p(gfp), buf2, 7200)
    lame.lame_close(ctypes.c_void_p(gfp))
    return bytes(buf[:n1]) + bytes(buf2[:n2])


@pytest.mark.skipif(not native_audio.mp3_available(),
                    reason="libmpg123 not present")
def test_mp3_roundtrip_fixture(tmp_path):
    """sine -> libmp3lame encode -> native mpg123 decode: high correlation
    and matched duration (lossy codec, so not bit-exact by nature)."""
    fs = 16000
    t = np.arange(fs * 2) / fs
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mp3 = _lame_encode(wav, fs)
    out, out_fs = native_audio.mp3_decode(mp3)
    assert out_fs == fs
    # codec adds padding; align by best lag and compare one second
    best = -1.0
    for lag in range(0, 4000, 10):
        if lag + fs > len(out):
            break
        c = float(np.corrcoef(out[lag:lag + fs], wav[:fs])[0, 1])
        best = max(best, c)
    assert best > 0.98
    assert abs(len(out) - len(wav)) < 5000  # within codec delay/padding

    # the loader path handles .mp3 files end to end
    from funasr_tpu.utils.audio import load_audio

    p = tmp_path / "a.mp3"
    p.write_bytes(mp3)
    via_loader = load_audio(str(p), fs=16000)
    assert via_loader.dtype == np.float32
    assert len(via_loader) == len(out)


@pytest.mark.skipif(not native_audio.mp3_available(),
                    reason="libmpg123 not present")
def test_mp3_decodes_reference_example():
    """The reference repo's own mp3/wav pair: our decode matches the
    pre-decoded wav nearly sample for sample (corr > 0.999, same length
    and rate)."""
    mp3_path = "/root/reference/runtime/funasr_api/asr_example.mp3"
    wav_path = "/root/reference/runtime/funasr_api/asr_example.wav"
    if not os.path.exists(mp3_path):
        pytest.skip("reference example not present")
    out, fs = native_audio.mp3_decode(open(mp3_path, "rb").read())
    from funasr_tpu.utils.audio import load_wav

    ref, rfs = load_wav(wav_path)
    assert fs == rfs == 16000
    assert len(out) == len(ref)
    c = float(np.corrcoef(out[:80000], ref[:80000])[0, 1])
    assert c > 0.999
