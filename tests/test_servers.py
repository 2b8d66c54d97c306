"""HTTP + gRPC serving: real round-trips against a tiny AutoModel."""

import asyncio
import json

import numpy as np
import pytest

from funasr_tpu.auto.auto_model import AutoModel
from tests.test_auto_model import ASR_CFG, _wav


@pytest.fixture(scope="module")
def am():
    return AutoModel(model=ASR_CFG)


def test_http_recognize_roundtrip(am, rng):
    from aiohttp.test_utils import TestClient, TestServer

    from funasr_tpu.runtime.http_server import AsrHttpServer

    srv = AsrHttpServer(am)

    async def run():
        app = srv.make_app()
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/health")
            assert (await r.json())["status"] == "ok"
            pcm = (np.clip(_wav(rng, 1.0), -1, 1) * 32767).astype("<i2")
            r = await client.post("/recognize?key=t1", data=pcm.tobytes())
            assert r.status == 200
            body = await r.json()
            assert "text" in body
            # empty body -> 400
            r = await client.post("/recognize", data=b"")
            assert r.status == 400

    asyncio.run(run())


def test_grpc_recognize_roundtrip(am, rng):
    pytest.importorskip("grpc")
    from funasr_tpu.runtime.grpc_server import AsrGrpcServer, recognize_client

    srv = AsrGrpcServer(am, port=0)  # ephemeral port
    port = srv.start()
    try:
        pcm = (np.clip(_wav(rng, 1.0), -1, 1) * 32767).astype("<i2").tobytes()
        out = recognize_client(f"localhost:{port}", pcm)
        assert out, "no responses"
        assert out[-1]["action"] == "finish"
        assert "sentence" in out[-1]
        partials = [o for o in out if o["action"] == "partial"]
        assert len(partials) >= 1
    finally:
        srv.stop()


def test_grpc_proto_wire_roundtrip(am, rng):
    """Reference-wire protobuf service: the request bytes here are built
    BY HAND (independent of runtime/proto.py's encoder) so the test pins
    the actual paraformer.proto wire format, and the response is parsed
    by hand too."""
    pytest.importorskip("grpc")
    import grpc

    from funasr_tpu.runtime.grpc_server import AsrGrpcServer

    srv = AsrGrpcServer(am, port=0)
    port = srv.start()
    try:
        pcm = (np.clip(_wav(rng, 1.0), -1, 1) * 32767).astype("<i2").tobytes()

        def vint(n):
            out = b""
            while True:
                b7 = n & 0x7F
                n >>= 7
                out += bytes([b7 | (0x80 if n else 0)])
                if not n:
                    return out

        # Request{mode=0(default,omitted), sampling_rate=3:16000,
        #         chunk_size=4:[5,10,5] packed, audio_data=6:pcm}
        packed = vint(5) + vint(10) + vint(5)
        msg1 = (bytes([3 << 3]) + vint(16000)
                + bytes([(4 << 3) | 2]) + vint(len(packed)) + packed
                + bytes([(6 << 3) | 2]) + vint(len(pcm)) + pcm)
        # Request{is_final=5:true}
        msg2 = bytes([5 << 3, 1])

        channel = grpc.insecure_channel(f"localhost:{port}")
        stub = channel.stream_stream(
            "/paraformer.ASR/Recognize",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        replies = list(stub(iter([msg1, msg2])))
        channel.close()
        assert replies, "no responses"
        # hand-parse the final Response{2: text, 3: is_final}
        data = replies[-1]
        pos, text, is_final = 0, "", False
        while pos < len(data):
            key = data[pos]
            pos += 1
            field, wire = key >> 3, key & 7
            if wire == 0:
                v = 0
                shift = 0
                while True:
                    b7 = data[pos]
                    pos += 1
                    v |= (b7 & 0x7F) << shift
                    if not b7 & 0x80:
                        break
                    shift += 7
                if field == 3:
                    is_final = bool(v)
            elif wire == 2:
                ln = data[pos]
                pos += 1
                if field == 2:
                    text = data[pos:pos + ln].decode()
                pos += ln
        assert is_final
        assert isinstance(text, str)  # random weights: any text, present
    finally:
        srv.stop()


def test_proto_codec_roundtrip():
    """proto.py encode/decode round trip incl. packed repeated ints and
    negative-int32 varints."""
    from funasr_tpu.runtime import proto

    req = proto.encode_request(mode=2, wav_format=0, sampling_rate=8000,
                               chunk_size=[5, 10, 5], is_final=True,
                               audio_data=b"\x01\x02\xff")
    back = proto.decode_request(req)
    assert back["mode"] == 2
    assert back["sampling_rate"] == 8000
    assert back["chunk_size"] == [5, 10, 5]
    assert back["is_final"] is True
    assert back["audio_data"] == b"\x01\x02\xff"

    # negative int32 chunk_size decodes as negative (proto int32
    # two's-complement varint), matching sampling_rate semantics
    neg = proto.encode_request(chunk_size=[-1, 10])
    assert proto.decode_request(neg)["chunk_size"] == [-1, 10]

    res = proto.encode_response(mode=1, text="你好 world", is_final=True)
    rb = proto.decode_response(res)
    assert rb == {"mode": 1, "text": "你好 world", "is_final": True}
    # unknown fields are skipped, not fatal
    import struct
    extra = res + bytes([(9 << 3) | 5]) + struct.pack("<f", 1.5)
    assert proto.decode_response(extra)["text"] == "你好 world"
