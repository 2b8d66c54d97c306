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
