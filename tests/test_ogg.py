"""Ogg container decode (fta_ogg.cc): synthesized Ogg-Opus and Ogg-Vorbis
files round-trip through load_audio.  Encoders come from the same system
codec libraries the decoder dlopens — if those are absent the tests skip
(and so does the capability, cleanly)."""

import ctypes
import struct

import numpy as np
import pytest

from funasr_tpu.runtime import native_audio
from funasr_tpu.utils.audio import load_audio

OPUS_OK, VORBIS_OK = native_audio.ogg_available()


def _sine(fs, seconds=0.5, f0=440.0):
    t = np.arange(int(fs * seconds)) / fs
    return (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


# ----------------------------------------------------------- Ogg writer
def _crc_table():
    tab = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else (r << 1)
            r &= 0xFFFFFFFF
        tab.append(r)
    return tab


_CRC = _crc_table()


def _ogg_page(serial, seq, granule, packets, bos=False, eos=False,
              cont=False):
    lacing = b""
    body = b""
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        lacing += b"\xff" * q + bytes([r])
        body += pkt
    header = struct.pack("<4sBBqIII", b"OggS", 0,
                         (1 if cont else 0) | (2 if bos else 0)
                         | (4 if eos else 0),
                         granule, serial, seq, 0)
    header += bytes([len(lacing)]) + lacing
    crc = 0
    for b in header + body:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC[((crc >> 24) & 0xFF) ^ b]
    header = header[:22] + struct.pack("<I", crc) + header[26:]
    return header + body


# ------------------------------------------------------------ opus file
def _make_opus_file(path, wav, fs=48000):
    lib = ctypes.CDLL("libopus.so.0")
    lib.opus_encoder_create.restype = ctypes.c_void_p
    lib.opus_encoder_create.argtypes = [ctypes.c_int32, ctypes.c_int,
                                        ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_int)]
    lib.opus_encode_float.restype = ctypes.c_int32
    lib.opus_encode_float.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int, ctypes.c_char_p,
                                      ctypes.c_int32]
    err = ctypes.c_int()
    enc = lib.opus_encoder_create(fs, 1, 2049, ctypes.byref(err))  # AUDIO
    assert err.value == 0
    frame = 960  # 20 ms @ 48k
    pad = (-len(wav)) % frame
    wav = np.concatenate([wav, np.zeros(pad, np.float32)])
    pkts = []
    buf = ctypes.create_string_buffer(4000)
    for i in range(0, len(wav), frame):
        chunk = np.ascontiguousarray(wav[i:i + frame])
        n = lib.opus_encode_float(
            enc, chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame, buf, 4000)
        assert n > 0
        pkts.append(buf.raw[:n])
    head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
            + struct.pack("<I", fs) + struct.pack("<h", 0) + bytes([0]))
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    pages = [_ogg_page(7, 0, 0, [head], bos=True),
             _ogg_page(7, 1, 0, [tags])]
    for i, pkt in enumerate(pkts):
        pages.append(_ogg_page(7, 2 + i, (i + 1) * frame, [pkt],
                               eos=(i == len(pkts) - 1)))
    with open(path, "wb") as f:
        f.write(b"".join(pages))
    return len(wav)


@pytest.mark.skipif(not OPUS_OK, reason="system libopus unavailable")
def test_ogg_opus_roundtrip(tmp_path):
    fs = 48000
    wav = _sine(fs, 0.5)
    p = tmp_path / "x.opus"
    n_in = _make_opus_file(str(p), wav, fs)
    out = load_audio(str(p), fs=16000)
    # 0.5 s at 16 kHz after resample, within a frame of slack
    assert abs(len(out) - int(n_in / fs * 16000)) < 1600
    assert np.abs(out).max() > 0.2  # real audio came through
    # dominant frequency survives the codec: correlate with 440 Hz
    t = np.arange(len(out)) / 16000.0
    c = np.hypot(np.mean(out * np.sin(2 * np.pi * 440 * t)),
                 np.mean(out * np.cos(2 * np.pi * 440 * t)))
    assert c > 0.1


# ---------------------------------------------------------- vorbis file
def _make_vorbis_file(path, wav, fs=16000):
    ogg = ctypes.CDLL("libogg.so.0")
    vorbis = ctypes.CDLL("libvorbis.so.0")
    venc = ctypes.CDLL("libvorbisenc.so.2")

    class OggPacket(ctypes.Structure):
        _fields_ = [("packet", ctypes.POINTER(ctypes.c_ubyte)),
                    ("bytes", ctypes.c_long), ("b_o_s", ctypes.c_long),
                    ("e_o_s", ctypes.c_long),
                    ("granulepos", ctypes.c_int64),
                    ("packetno", ctypes.c_int64)]

    class OggPage(ctypes.Structure):
        _fields_ = [("header", ctypes.POINTER(ctypes.c_ubyte)),
                    ("header_len", ctypes.c_long),
                    ("body", ctypes.POINTER(ctypes.c_ubyte)),
                    ("body_len", ctypes.c_long)]

    # opaque-by-overallocation state blobs (caller-allocated structs)
    vi = ctypes.create_string_buffer(1024)
    vc = ctypes.create_string_buffer(1024)
    vd = ctypes.create_string_buffer(8192)
    vb = ctypes.create_string_buffer(8192)
    os_ = ctypes.create_string_buffer(2048)

    vorbis.vorbis_info_init(vi)
    rc = venc.vorbis_encode_init_vbr(vi, ctypes.c_long(1), ctypes.c_long(fs),
                                     ctypes.c_float(0.4))
    assert rc == 0
    vorbis.vorbis_comment_init(vc)
    vorbis.vorbis_analysis_init(vd, vi)
    vorbis.vorbis_block_init(vd, vb)
    ogg.ogg_stream_init(os_, 7)

    hdr = OggPacket()
    hdr_comm = OggPacket()
    hdr_code = OggPacket()
    vorbis.vorbis_analysis_headerout(vd, vc, ctypes.byref(hdr),
                                     ctypes.byref(hdr_comm),
                                     ctypes.byref(hdr_code))
    for h in (hdr, hdr_comm, hdr_code):
        ogg.ogg_stream_packetin(os_, ctypes.byref(h))

    out = bytearray()
    page = OggPage()

    def flush(force=False):
        fn = ogg.ogg_stream_flush if force else ogg.ogg_stream_pageout
        while fn(os_, ctypes.byref(page)) != 0:
            out.extend(ctypes.string_at(page.header, page.header_len))
            out.extend(ctypes.string_at(page.body, page.body_len))

    flush(force=True)  # headers on their own pages

    vorbis.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float))
    step = 1024
    chunks = [wav[i:i + step] for i in range(0, len(wav), step)]
    chunks.append(wav[0:0])  # empty write marks end-of-stream
    for chunk in chunks:
        if len(chunk):
            buf = vorbis.vorbis_analysis_buffer(vd, len(chunk))
            ctypes.memmove(buf[0],
                           np.ascontiguousarray(chunk).ctypes.data,
                           len(chunk) * 4)
        vorbis.vorbis_analysis_wrote(vd, len(chunk))
        while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            vorbis.vorbis_analysis(vb, None)
            vorbis.vorbis_bitrate_addblock(vb)
            op = OggPacket()
            while vorbis.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                ogg.ogg_stream_packetin(os_, ctypes.byref(op))
                flush()
    flush(force=True)
    with open(path, "wb") as f:
        f.write(bytes(out))


@pytest.mark.skipif(not VORBIS_OK, reason="system libvorbisfile unavailable")
def test_ogg_vorbis_roundtrip(tmp_path):
    fs = 16000
    wav = _sine(fs, 0.5)
    p = tmp_path / "x.ogg"
    _make_vorbis_file(str(p), wav, fs)
    out = load_audio(str(p), fs=16000)
    assert abs(len(out) - len(wav)) < fs // 10
    assert np.abs(out).max() > 0.2
    t = np.arange(len(out)) / 16000.0
    c = np.hypot(np.mean(out * np.sin(2 * np.pi * 440 * t)),
                 np.mean(out * np.cos(2 * np.pi * 440 * t)))
    assert c > 0.1


def test_ogg_garbage_rejected():
    if not (OPUS_OK or VORBIS_OK):
        pytest.skip("no codecs")
    with pytest.raises(ValueError):
        native_audio.ogg_decode(b"OggS" + b"\x00" * 100)
    with pytest.raises(ValueError):
        native_audio.ogg_decode(b"not an ogg at all" * 10)


# --------------------------------------- generic ffmpeg container decode
from funasr_tpu.utils import ffmpeg_audio

FF_OK = ffmpeg_audio.is_available()


@pytest.mark.skipif(not FF_OK, reason="system ffmpeg libs unavailable")
def test_ffmpeg_decode_stereo_wav(tmp_path):
    """The ctypes ffmpeg driver (the reference's load_utils ffmpeg
    fallback): stereo wav demux + decode + downmix, validating the whole
    avformat/avcodec integration the mp4/m4a path rides."""
    import wave

    fs = 16000
    w = _sine(fs, 1.0)
    p = tmp_path / "st.wav"
    with wave.open(str(p), "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(fs)
        st = np.stack([w, w], 1).reshape(-1)
        wf.writeframes((np.clip(st, -1, 1) * 32767).astype("<i2").tobytes())
    out, rate = ffmpeg_audio.decode(str(p))
    assert rate == fs and abs(len(out) - fs) < 10
    np.testing.assert_allclose(out, w, atol=2e-4)


@pytest.mark.skipif(not FF_OK, reason="system ffmpeg libs unavailable")
def test_ffmpeg_decode_real_codecs(tmp_path):
    """Real CODEC decode through avcodec: mp3 (libmp3lame-encoded) and the
    Ogg-Opus file from this module's writer both round-trip."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_native_audio import _lame_encode

    fs = 16000
    w = _sine(fs, 0.5)
    p3 = tmp_path / "x.mp3"
    p3.write_bytes(_lame_encode(w, fs))
    out, rate = ffmpeg_audio.decode(str(p3))
    assert 8000 <= rate <= 48000
    assert len(out) > 0.4 * fs
    t = np.arange(len(out)) / rate
    c = np.hypot(np.mean(out * np.sin(2 * np.pi * 440 * t)),
                 np.mean(out * np.cos(2 * np.pi * 440 * t)))
    assert c > 0.1

    if OPUS_OK:
        po = tmp_path / "x.opus"
        _make_opus_file(str(po), _sine(48000, 0.5), 48000)
        out2, rate2 = ffmpeg_audio.decode(str(po))
        assert rate2 == 48000 and len(out2) > 0.4 * 48000


@pytest.mark.skipif(not FF_OK, reason="system ffmpeg libs unavailable")
def test_ffmpeg_garbage_rejected(tmp_path):
    p = tmp_path / "junk.m4a"
    p.write_bytes(b"definitely not an mp4" * 100)
    with pytest.raises(ValueError):
        ffmpeg_audio.decode(str(p))


def _make_mov_sowt(path, wav, fs):
    """Minimal valid .m4a (ISO-BMFF 'sowt' 16-bit PCM track) written by
    hand — exercises the MP4 demuxer specifically, no encoder needed."""
    n = len(wav)
    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def full(typ, ver, flags, payload):
        return box(typ, struct.pack(">B3s", ver,
                                    flags.to_bytes(3, "big")) + payload)

    ftyp = box(b"ftyp", b"M4A \x00\x00\x00\x00M4A mp42isom")
    mvhd = full(b"mvhd", 0, 0,
                struct.pack(">IIIIII", 0, 0, fs, n, 0x00010000, 0)
                + b"\x00" * 10
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, n)
                + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0x0100, 0)
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + struct.pack(">II", 0, 0))
    mdhd = full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fs, n,
                                           0x55C4, 0))
    hdlr = full(b"hdlr", 0, 0,
                b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"Sound\x00")
    smhd = full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    dref = full(b"dref", 0, 0, struct.pack(">I", 1) + full(b"url ", 0, 1,
                                                           b""))
    dinf = box(b"dinf", dref)
    sowt = box(b"sowt", b"\x00" * 6 + struct.pack(">H", 1)
               + struct.pack(">HHI", 0, 0, 0)
               + struct.pack(">HHHH", 1, 16, 0, 0)
               + struct.pack(">I", fs << 16))
    stsd = full(b"stsd", 0, 0, struct.pack(">I", 1) + sowt)
    stts = full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = full(b"stsz", 0, 0, struct.pack(">III", 2, n, 0))

    def build(stco_off):
        stco = full(b"stco", 0, 0, struct.pack(">II", 1, stco_off))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", smhd + dinf + stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        trak = box(b"trak", tkhd + mdia)
        return box(b"moov", mvhd + trak)

    moov = build(0)
    moov = build(len(ftyp) + len(moov) + 8)  # mdat payload offset
    with open(path, "wb") as f:
        f.write(ftyp + moov + box(b"mdat", pcm))


@pytest.mark.skipif(not FF_OK, reason="system ffmpeg libs unavailable")
def test_ffmpeg_decode_m4a_and_load_audio(tmp_path):
    """A hand-built .m4a decodes through the MP4 demuxer and load_audio
    routes the extension there (reference load_utils ffmpeg role)."""
    fs = 16000
    w = _sine(fs, 1.0)
    p = tmp_path / "x.m4a"
    _make_mov_sowt(str(p), w, fs)
    out, rate = ffmpeg_audio.decode(str(p))
    assert rate == fs and abs(len(out) - fs) < 4
    np.testing.assert_allclose(out, w, atol=2e-4)
    got = load_audio(str(p), fs=16000)
    np.testing.assert_allclose(got, w, atol=2e-4)


@pytest.mark.skipif(not FF_OK, reason="system ffmpeg libs unavailable")
def test_ffmpeg_channels_from_codecpar(tmp_path):
    """Channel count comes from codecpar, not linesize (decoders align
    linesize up, which mis-derived channels for small tail frames): a
    3-channel wav with an odd total length downmixes exactly."""
    import wave

    fs = 16000
    n = 16000 + 37  # ragged tail
    t = np.arange(n) / fs
    chans = [0.3 * np.sin(2 * np.pi * f * t) for f in (300.0, 300.0, 300.0)]
    p = tmp_path / "c3.wav"
    with wave.open(str(p), "wb") as wf:
        wf.setnchannels(3)
        wf.setsampwidth(2)
        wf.setframerate(fs)
        st = np.stack(chans, 1).reshape(-1)
        wf.writeframes((np.clip(st, -1, 1) * 32767).astype("<i2").tobytes())
    out, rate = ffmpeg_audio.decode(str(p))
    assert rate == fs and len(out) == n
    np.testing.assert_allclose(out, chans[0], atol=3e-4)
