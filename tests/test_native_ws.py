"""Native (C++) WebSocket transport: RFC6455 conformance against a real
python-websockets client + full ASR protocol round-trip, asserting behavior
identical to the asyncio server (shared protocol logic)."""

import asyncio
import json
import threading

import numpy as np
import pytest

from funasr_tpu.auto.auto_model import AutoModel
from funasr_tpu.runtime import native_ws

pytestmark = pytest.mark.skipif(
    not native_ws.is_available(), reason="no C++ toolchain")

VOCAB = ["<blank>", "<s>", "</s>"] + list("你好世界我们")

ASR_CFG = dict(
    model="Paraformer",
    vocab_size=len(VOCAB),
    tokenizer_conf={"token_list": VOCAB},
    frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=2),
    input_size=60,
    encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                      num_blocks=2, kernel_size=5, dropout_rate=0.0),
    decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                      att_layer_num=1, kernel_size=5, dropout_rate=0.0),
    predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
)


def _pump(server, stop):
    while not stop.is_set():
        server.step(50)


def test_transport_echo_frames():
    """Handshake, small/fragmented/large frames, ping, close."""
    import websockets

    tr = native_ws.NativeWsTransport("127.0.0.1", 0)
    stop = threading.Event()
    seen = []

    def pump():
        while not stop.is_set():
            for conn, typ, payload in tr.poll(50):
                seen.append((typ, payload))
                if typ == native_ws.EV_TEXT:
                    tr.send_text(conn, payload.decode()[::-1])
                elif typ == native_ws.EV_BINARY:
                    tr.send_binary(conn, payload)

    t = threading.Thread(target=pump, daemon=True)
    t.start()

    async def scenario():
        async with websockets.connect(f"ws://127.0.0.1:{tr.port}") as ws:
            await ws.send("hello")
            assert await asyncio.wait_for(ws.recv(), 10) == "olleh"
            # binary echo incl. >64KB payload (8-byte length header path)
            blob = bytes(range(256)) * 300  # 76800 B
            await ws.send(blob)
            assert await asyncio.wait_for(ws.recv(), 10) == blob
            # client ping is answered by the library (no app event)
            pong = await ws.ping()
            await asyncio.wait_for(pong, 10)
            # utf-8 text survives
            await ws.send("你好")
            assert await asyncio.wait_for(ws.recv(), 10) == "好你"

    try:
        asyncio.run(scenario())
    finally:
        stop.set()
        t.join(timeout=5)
        tr.shutdown()
    types = [t_ for t_, _ in seen]
    assert types.count(native_ws.EV_OPEN) == 1
    assert native_ws.EV_BINARY in types


@pytest.mark.slow
def test_native_offline_ws_roundtrip(rng):
    import websockets

    am = AutoModel(model=ASR_CFG)
    server = native_ws.NativeAsrWebSocketServer(am, host="127.0.0.1", port=0)
    stop = threading.Event()
    t = threading.Thread(target=_pump, args=(server, stop), daemon=True)
    t.start()

    wav = 0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
    pcm = (wav * 32767).astype("<i2").tobytes()

    async def scenario():
        async with websockets.connect(
                f"ws://127.0.0.1:{server.port}") as ws:
            await ws.send(json.dumps({
                "mode": "offline", "wav_name": "t1", "is_speaking": True,
                "wav_format": "pcm", "audio_fs": 16000,
            }))
            third = len(pcm) // 3
            for i in range(3):
                await ws.send(pcm[i * third:(i + 1) * third])
            await ws.send(json.dumps({"is_speaking": False}))
            return json.loads(await asyncio.wait_for(ws.recv(), 120))

    try:
        reply = asyncio.run(scenario())
    finally:
        stop.set()
        t.join(timeout=5)
        server.shutdown()
    assert reply["mode"] == "offline"
    assert reply["wav_name"] == "t1"
    assert reply["is_final"] is True
    assert "text" in reply

    # identical answer through the asyncio transport (shared logic)
    from funasr_tpu.runtime.websocket_server import (
        AsrWebSocketServer, WsSession,
    )
    logic = AsrWebSocketServer(am)
    sess = WsSession(logic)
    logic.on_text(sess, json.dumps(
        {"mode": "offline", "wav_name": "t1", "is_speaking": True}))
    logic.on_binary(sess, pcm)
    out = logic.on_text(sess, json.dumps({"is_speaking": False}))
    ref = json.loads(out[-1])
    assert ref["text"] == reply["text"]
