"""WebSocket server: protocol round-trip with a real client connection."""

import asyncio
import json

import numpy as np
import pytest

from funasr_tpu.auto.auto_model import AutoModel
from funasr_tpu.runtime.websocket_server import AsrWebSocketServer

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


@pytest.mark.slow
def test_offline_ws_roundtrip(rng):
    import websockets

    am = AutoModel(model=ASR_CFG)
    server = AsrWebSocketServer(am, host="127.0.0.1", port=19095)

    async def scenario():
        stop = asyncio.Event()

        async def run_server():
            async with websockets.serve(server.handle, server.host,
                                        server.port, max_size=None):
                await stop.wait()

        task = asyncio.create_task(run_server())
        await asyncio.sleep(0.3)

        wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000))
        pcm = (wav * 32767).astype("<i2").tobytes()

        async with websockets.connect("ws://127.0.0.1:19095") as ws:
            await ws.send(json.dumps({
                "mode": "offline", "wav_name": "t1", "is_speaking": True,
                "wav_format": "pcm", "audio_fs": 16000,
            }))
            # stream in 3 binary chunks
            third = len(pcm) // 3
            for i in range(3):
                await ws.send(pcm[i * third:(i + 1) * third])
            await ws.send(json.dumps({"is_speaking": False}))
            reply = json.loads(await asyncio.wait_for(ws.recv(), 60))

        stop.set()
        await task
        return reply

    reply = asyncio.run(scenario())
    assert reply["mode"] == "offline"
    assert reply["wav_name"] == "t1"
    assert reply["is_final"] is True
    assert "text" in reply


@pytest.mark.slow
def test_client_sdk_offline(rng):
    """AsrWsClient against a live server in a background thread."""
    import threading
    import websockets

    from funasr_tpu.runtime.client import AsrWsClient

    am = AutoModel(model=ASR_CFG)
    server = AsrWebSocketServer(am, host="127.0.0.1", port=19096)
    loop = asyncio.new_event_loop()
    stop = asyncio.Event()

    async def run_server():
        async with websockets.serve(server.handle, server.host, server.port,
                                    max_size=None):
            await stop.wait()

    def runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(run_server())

    th = threading.Thread(target=runner, daemon=True)
    th.start()
    import time
    time.sleep(0.5)
    try:
        wav = 0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
        pcm = (wav * 32767).astype("<i2").tobytes()
        client = AsrWsClient("ws://127.0.0.1:19096")
        res = client.recognize_pcm(pcm, wav_name="sdk")
        assert res["is_final"] and res["mode"] == "offline"
        assert "text" in res
    finally:
        loop.call_soon_threadsafe(stop.set)
        th.join(timeout=5)


@pytest.mark.slow
def test_2pass_ws_roundtrip(rng):
    """2pass mode: online partials from the streaming model + offline final."""
    import websockets

    import jax
    import jax.numpy as jnp
    from funasr_tpu.frontends.streaming import StreamingFrontend
    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.models.paraformer_streaming.model import (
        ParaformerStreaming,
    )

    TINY = dict(
        vocab_size=len(VOCAB), input_size=24,
        encoder_conf=dict(output_size=16, attention_heads=2, linear_units=32,
                          num_blocks=3, kernel_size=5, dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=2, kernel_size=5, dropout_rate=0.0),
        predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
    )
    model = Paraformer(**TINY)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key}, jax.random.normal(key, (1, 30, 24)),
                        jnp.array([30]), max_tokens=16,
                        method=model.greedy_decode)
    fe = StreamingFrontend(n_mels=8, lfr_m=3, lfr_n=2)
    streaming = ParaformerStreaming(
        params, input_size=24, d_model=16, n_head=2, enc_kernel=5,
        dec_kernel=5, n_enc_layers=3, n_dec_layers=2, chunk_size=(0, 6, 3),
        encoder_chunk_look_back=2, frontend=fe)

    am = AutoModel(model=ASR_CFG)
    server = AsrWebSocketServer(am, streaming_model=streaming,
                                host="127.0.0.1", port=19097)

    async def scenario():
        stop = asyncio.Event()

        async def run_server():
            async with websockets.serve(server.handle, server.host,
                                        server.port, max_size=None):
                await stop.wait()

        task = asyncio.create_task(run_server())
        await asyncio.sleep(0.3)
        wav = 0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
        pcm = (wav * 32767).astype("<i2").tobytes()
        msgs = []
        async with websockets.connect("ws://127.0.0.1:19097") as ws:
            await ws.send(json.dumps({
                "mode": "2pass", "wav_name": "tp", "is_speaking": True,
                "wav_format": "pcm", "audio_fs": 16000,
                "chunk_size": [5, 10, 5],
            }))
            step = 16000 * 600 // 1000 * 2  # 600 ms chunks
            for i in range(0, len(pcm), step):
                await ws.send(pcm[i: i + step])
            await ws.send(json.dumps({"is_speaking": False}))
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), 120))
                msgs.append(msg)
                if msg.get("mode") == "2pass-offline":
                    break
        stop.set()
        await task
        return msgs

    msgs = asyncio.run(scenario())
    modes = {m["mode"] for m in msgs}
    assert "2pass-offline" in modes
    final = [m for m in msgs if m["mode"] == "2pass-offline"][-1]
    assert final["is_final"] and "text" in final


@pytest.mark.slow
def test_native_cpp_client_roundtrip(rng):
    """The compiled C++ client (runtime/native/fta_ws_client.cc — the role
    of the reference's go/java/c# clients) speaks the protocol against the
    asyncio server: masked client frames, config/pcm/is_speaking flow,
    final offline result received."""
    import ctypes
    import os
    import threading

    so = os.path.join(os.path.dirname(__file__), "..", "funasr_tpu",
                      "runtime", "native", "libfta_ws_client.so")
    if not os.path.exists(so):
        pytest.skip("native client not built")
    lib = ctypes.CDLL(so)
    CB = ctypes.CFUNCTYPE(None, ctypes.c_char_p, ctypes.c_void_p)
    lib.fta_ws_client_run.restype = ctypes.c_int
    lib.fta_ws_client_run.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, CB, ctypes.c_void_p]

    am = AutoModel(model=ASR_CFG)
    server = AsrWebSocketServer(am, host="127.0.0.1", port=19097,
                                max_batch=1)
    loop_holder = {}
    started = threading.Event()

    def serve():
        import websockets

        async def run():
            loop_holder["loop"] = asyncio.get_running_loop()
            async with websockets.serve(server.handle, server.host,
                                        server.port, max_size=None):
                started.set()
                await asyncio.Future()

        try:
            asyncio.run(run())
        except RuntimeError:
            pass

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    assert started.wait(10)

    wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000))
    pcm = (wav * 32767).astype("<i2").tobytes()
    results = []
    cb = CB(lambda msg, _: results.append(json.loads(msg.decode())))
    rc = lib.fta_ws_client_run(b"127.0.0.1", 19097, b"offline", pcm,
                               len(pcm), 200, 16000, cb, None)
    assert rc >= 1, f"client failed rc={rc}"
    finals = [r for r in results if r.get("is_final")]
    assert finals and finals[-1]["mode"] == "offline"
    assert "text" in finals[-1]
