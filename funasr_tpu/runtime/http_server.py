"""HTTP ASR server (reference runtime/http/: asio HTTP server with
multipart file upload -> offline pipeline).

Endpoints:

- ``POST /recognize`` — multipart form with a ``file`` field (wav bytes) or
  raw body of wav/pcm bytes; optional query/form params ``audio_fs``,
  ``itn``, ``key``.  Response JSON mirrors the websocket result:
  ``{"text": ..., "timestamp": [...], "stamp_sents": [...]}``.
- ``GET /health`` — liveness probe.

The aiohttp event loop moves bytes; decode runs in a thread executor over
the jitted device programs, same as the websocket server.
"""

from __future__ import annotations

import asyncio
import json
import logging
from typing import Any, Dict, Optional

import numpy as np

log = logging.getLogger(__name__)


class AsrHttpServer:
    def __init__(self, auto_model, host: str = "0.0.0.0", port: int = 10096,
                 max_batch: int = 32, batch_wait_ms: float = 10.0):
        self.auto_model = auto_model
        self.host = host
        self.port = port
        # Concurrent uploads coalesce into one device batch (see
        # runtime/batcher.py; reference servers decode via a thread pool).
        if max_batch and max_batch > 1:
            from funasr_tpu.runtime.batcher import BatchingAutoModel

            self.decode_model = BatchingAutoModel(
                auto_model, max_batch=max_batch, max_wait_ms=batch_wait_ms)
        else:
            self.decode_model = auto_model

    def _decode(self, data: bytes, audio_fs: int, key: str,
                use_itn: bool) -> Dict[str, Any]:
        from funasr_tpu.utils.audio import load_audio

        if data[:4] == b"RIFF":
            from funasr_tpu.runtime import native_audio

            if native_audio.is_available():
                wav, fs = native_audio.wav_decode(data)
                wav = load_audio(wav, fs=16000, audio_fs=fs)
            else:  # pure-python RIFF fallback via a temp buffer
                import io
                import wave as wavmod

                with wavmod.open(io.BytesIO(data)) as w:
                    fs = w.getframerate()
                    nch = w.getnchannels()
                    width = w.getsampwidth()
                    raw = w.readframes(w.getnframes())
                if width != 2:
                    raise ValueError(
                        f"unsupported wav sample width {width * 8} bit "
                        "(PCM16 supported in the pure-python fallback)")
                wav = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
                if nch > 1:  # downmix interleaved channels like native
                    wav = wav.reshape(-1, nch).mean(axis=1)
                wav = load_audio(wav, fs=16000, audio_fs=fs)
        else:
            wav = load_audio(data, fs=16000, audio_fs=audio_fs)
        res = self.decode_model.generate(wav, key=[key], use_itn=use_itn)
        return res[0] if res else {"text": ""}

    def make_app(self):
        from aiohttp import web

        app = web.Application(client_max_size=1024 * 1024 * 256)

        async def health(_req):
            return web.json_response({"status": "ok"})

        async def recognize(req):
            audio_fs = int(req.query.get("audio_fs", 16000))
            use_itn = req.query.get("itn", "false").lower() in ("1", "true")
            key = req.query.get("key", "http")
            data: Optional[bytes] = None
            if req.content_type and "multipart" in req.content_type:
                reader = await req.multipart()
                async for part in reader:
                    if part.name in ("file", "audio"):
                        data = await part.read(decode=False)
                        break
            else:
                data = await req.read()
            if not data:
                return web.json_response({"error": "no audio"}, status=400)
            loop = asyncio.get_running_loop()
            try:
                result = await loop.run_in_executor(
                    None, self._decode, data, audio_fs, key, use_itn)
            except Exception as e:  # noqa: BLE001 - surface to client
                log.exception("decode failed")
                return web.json_response({"error": str(e)}, status=500)
            out = {"text": result.get("text", "")}
            if "timestamp" in result:
                out["timestamp"] = result["timestamp"]
            if "sentence_info" in result:
                out["stamp_sents"] = result["sentence_info"]
            return web.json_response(out, dumps=lambda o: json.dumps(
                o, ensure_ascii=False, default=str))

        app.router.add_get("/health", health)
        app.router.add_post("/recognize", recognize)
        return app

    def run(self):
        from aiohttp import web

        web.run_app(self.make_app(), host=self.host, port=self.port)


def main(argv=None):  # CLI: python -m funasr_tpu.runtime.http_server
    import argparse

    from funasr_tpu.auto.auto_model import AutoModel

    ap = argparse.ArgumentParser(prog="funasr-tpu-http-server")
    ap.add_argument("--model", required=True)
    ap.add_argument("--vad-model", default=None)
    ap.add_argument("--punc-model", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=10096)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    am = AutoModel(
        model=args.model,
        vad_model=args.vad_model,
        punc_model=args.punc_model,
    )
    AsrHttpServer(am, host=args.host, port=args.port).run()


if __name__ == "__main__":
    main()
