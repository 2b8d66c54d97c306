"""WebSocket client for the funasr_tpu ASR server (reference ships client
SDKs under runtime/python/websocket, java, c#, go...; protocol:
runtime/docs/websocket_protocol.md).

Usage::

    from funasr_tpu.runtime.client import AsrWsClient
    client = AsrWsClient("ws://localhost:10095")
    result = client.recognize_wav("a.wav")                 # offline
    for partial in client.stream_pcm(chunks, mode="2pass"):
        print(partial)
"""

from __future__ import annotations

import asyncio
import json
from typing import AsyncIterator, Dict, Iterable, List, Optional

import numpy as np


class AsrWsClient:
    def __init__(self, url: str = "ws://localhost:10095",
                 chunk_ms: int = 600, audio_fs: int = 16000):
        self.url = url
        self.chunk_ms = chunk_ms
        self.audio_fs = audio_fs

    # ------------------------------------------------------------- offline
    def recognize_wav(self, path: str, **config) -> Dict:
        from funasr_tpu.utils.audio import load_audio

        wav = load_audio(path, fs=self.audio_fs)
        pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
        return asyncio.run(self._offline(pcm, wav_name=path, **config))

    def recognize_pcm(self, pcm: bytes, **config) -> Dict:
        return asyncio.run(self._offline(pcm, **config))

    async def _offline(self, pcm: bytes, wav_name: str = "py-client",
                       **config) -> Dict:
        import websockets

        async with websockets.connect(self.url, max_size=None) as ws:
            cfg = {"mode": "offline", "wav_name": wav_name,
                   "wav_format": "pcm", "audio_fs": self.audio_fs,
                   "is_speaking": True}
            cfg.update(config)
            await ws.send(json.dumps(cfg))
            step = self.audio_fs * self.chunk_ms // 1000 * 2
            for i in range(0, max(len(pcm), 1), step):
                await ws.send(pcm[i: i + step])
            await ws.send(json.dumps({"is_speaking": False}))
            while True:
                msg = json.loads(await ws.recv())
                if msg.get("is_final"):
                    return msg

    # ------------------------------------------------------------ streaming
    def stream_pcm(self, chunks: Iterable[bytes], mode: str = "2pass",
                   **config) -> List[Dict]:
        """Send PCM chunks; returns all server messages (partials+finals)."""
        return asyncio.run(self._stream(chunks, mode, **config))

    async def _stream(self, chunks: Iterable[bytes], mode: str,
                      **config) -> List[Dict]:
        import websockets

        out: List[Dict] = []
        async with websockets.connect(self.url, max_size=None) as ws:
            cfg = {"mode": mode, "wav_name": "py-stream",
                   "wav_format": "pcm", "audio_fs": self.audio_fs,
                   "chunk_size": [5, 10, 5], "is_speaking": True}
            cfg.update(config)
            await ws.send(json.dumps(cfg))

            async def drain(until_final: bool):
                while True:
                    try:
                        raw = await asyncio.wait_for(ws.recv(), timeout=0.05
                                                     if not until_final
                                                     else 30.0)
                    except asyncio.TimeoutError:
                        return
                    msg = json.loads(raw)
                    out.append(msg)
                    if until_final and msg.get("is_final"):
                        return

            for chunk in chunks:
                await ws.send(chunk)
                await drain(False)
            await ws.send(json.dumps({"is_speaking": False}))
            await drain(True)
        return out
