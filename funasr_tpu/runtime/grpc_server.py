"""gRPC ASR server (reference runtime/grpc/paraformer-server.cc: streaming
Recognize service over the paraformer pipeline).

TWO services on one port:

- ``/paraformer.ASR/Recognize`` — the REFERENCE protobuf wire format
  (runtime/python/grpc/proto/paraformer.proto), hand-coded in
  runtime/proto.py since no protoc python plugin exists in this image;
  reference protobuf clients connect unchanged.
- ``/funasr.ASR/Recognize`` — a JSON-payload variant of the same
  bidirectional stream (self-describing, curl/python-friendly):

    {"user": ..., "language": "zh-CN", "speaking": true,
     "audio_data": "<base64 pcm16>", "audio_fs": 16000}

and receives {"sentence", "user", "action": "partial"|"finish", ...}.
``action == "finish"`` fires when ``speaking`` flips false (utterance end,
offline decode of the accumulated buffer).
"""

from __future__ import annotations

import base64
import json
import logging
from concurrent import futures
from typing import Any, Dict, Iterator

import numpy as np

log = logging.getLogger(__name__)

SERVICE = "funasr.ASR"
METHOD = "Recognize"


def _ser(obj: Dict[str, Any]) -> bytes:
    return json.dumps(obj, ensure_ascii=False, default=str).encode()


def _de(data: bytes) -> Dict[str, Any]:
    return json.loads(data.decode())


class AsrGrpcServer:
    def __init__(self, auto_model, host: str = "0.0.0.0", port: int = 10098,
                 max_workers: int = 8, max_batch: int = 32,
                 batch_wait_ms: float = 10.0):
        self.auto_model = auto_model
        self.host = host
        self.port = port
        self.max_workers = max_workers
        self._server = None
        # Concurrent streams' end-of-utterance decodes coalesce into one
        # device batch (runtime/batcher.py).
        if max_batch and max_batch > 1:
            from funasr_tpu.runtime.batcher import BatchingAutoModel

            self.decode_model = BatchingAutoModel(
                auto_model, max_batch=max_batch, max_wait_ms=batch_wait_ms)
        else:
            self.decode_model = auto_model

    # ------------------------------------------------------------ handlers
    def _recognize_stream(self, request_iterator: Iterator[Dict[str, Any]],
                          context) -> Iterator[bytes]:
        buf = bytearray()
        user = ""
        language = "zh-CN"
        fs = 16000
        for msg in request_iterator:
            req = _de(msg)
            user = req.get("user", user)
            language = req.get("language", language)
            # honor audio_fs on whichever message carries it (clients
            # usually set it on the audio-bearing messages, not the final
            # speaking:false)
            if req.get("audio_fs"):
                fs = int(req["audio_fs"])
            if req.get("audio_data"):
                buf.extend(base64.b64decode(req["audio_data"]))
            if req.get("speaking") is False:
                wav = np.frombuffer(bytes(buf), "<i2").astype(np.float32) / 32768.0
                if fs != 16000:
                    from funasr_tpu.utils.audio import resample_linear

                    wav = resample_linear(wav, fs, 16000)
                text = ""
                if len(wav) >= 400:
                    res = self.decode_model.generate(wav, key=[user or "grpc"])
                    text = res[0].get("text", "") if res else ""
                buf = bytearray()
                yield _ser({"sentence": text, "user": user,
                            "action": "finish", "language": language})
            elif req.get("audio_data"):
                yield _ser({"sentence": "", "user": user,
                            "action": "partial", "language": language})

    # ---------------------------------------------- proto-wire service
    def _recognize_proto(self, request_iterator: Iterator[bytes],
                         context) -> Iterator[bytes]:
        """``/paraformer.ASR/Recognize`` with the REFERENCE protobuf wire
        format (runtime/python/grpc/proto/paraformer.proto, hand-coded in
        runtime/proto.py) — reference protobuf clients connect unchanged.
        Offline semantics: pcm accumulates until ``is_final``; online/
        two_pass emit empty partials per chunk and the offline result at
        the end (the 2-pass final-correction contract)."""
        from funasr_tpu.runtime import proto

        buf = bytearray()
        fs = 16000
        mode = proto.MODE_OFFLINE
        for msg in request_iterator:
            req = proto.decode_request(msg)
            mode = req["mode"] or mode
            if req["sampling_rate"] > 0:  # negative = invalid int32
                fs = req["sampling_rate"]
            if req["audio_data"]:
                buf.extend(req["audio_data"])
            if req["is_final"]:
                wav = (np.frombuffer(bytes(buf), "<i2").astype(np.float32)
                       / 32768.0)
                if fs != 16000:
                    from funasr_tpu.utils.audio import resample_linear

                    wav = resample_linear(wav, fs, 16000)
                text = ""
                if len(wav) >= 400:
                    res = self.decode_model.generate(wav, key=["grpc"])
                    text = res[0].get("text", "") if res else ""
                buf = bytearray()
                yield proto.encode_response(mode=mode, text=text,
                                            is_final=True)
            elif req["audio_data"] and mode != proto.MODE_OFFLINE:
                yield proto.encode_response(mode=proto.MODE_ONLINE, text="",
                                            is_final=False)

    def _make_handler(self):
        import grpc

        method = grpc.stream_stream_rpc_method_handler(
            self._recognize_stream,
            request_deserializer=lambda b: b,
            response_serializer=lambda b: b,
        )
        proto_method = grpc.stream_stream_rpc_method_handler(
            self._recognize_proto,
            request_deserializer=lambda b: b,
            response_serializer=lambda b: b,
        )

        class Handler(grpc.GenericRpcHandler):
            def service(self, handler_call_details):
                if handler_call_details.method == f"/{SERVICE}/{METHOD}":
                    return method
                if handler_call_details.method == "/paraformer.ASR/Recognize":
                    return proto_method
                return None

        return Handler()

    # ------------------------------------------------------------- control
    def start(self) -> int:
        """Start serving; returns the bound port."""
        import grpc

        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=self.max_workers))
        self._server.add_generic_rpc_handlers((self._make_handler(),))
        port = self._server.add_insecure_port(f"{self.host}:{self.port}")
        self._server.start()
        log.info("ASR gRPC server on %s:%d", self.host, port)
        return port

    def stop(self, grace: float = 0.5):
        if self._server is not None:
            self._server.stop(grace)
            self._server = None

    def wait(self):
        if self._server is not None:
            self._server.wait_for_termination()


def recognize_client_proto(target: str, pcm16: bytes,
                           audio_fs: int = 16000, chunk: int = 32000,
                           mode: int = 0):
    """Client for the reference-wire protobuf service (proto.py codec)."""
    import grpc

    from funasr_tpu.runtime import proto

    channel = grpc.insecure_channel(target)
    stub = channel.stream_stream(
        "/paraformer.ASR/Recognize",
        request_serializer=lambda b: b,
        response_deserializer=lambda b: b,
    )

    def gen():
        for i in range(0, max(len(pcm16), 1), chunk):
            yield proto.encode_request(mode=mode, sampling_rate=audio_fs,
                                       audio_data=pcm16[i: i + chunk])
        yield proto.encode_request(mode=mode, sampling_rate=audio_fs,
                                   is_final=True)

    out = [proto.decode_response(r) for r in stub(gen())]
    channel.close()
    return out


def recognize_client(target: str, pcm16: bytes, user: str = "cli",
                     audio_fs: int = 16000, chunk: int = 32000):
    """Minimal client helper for the JSON-over-gRPC protocol."""
    import grpc

    channel = grpc.insecure_channel(target)
    stub = channel.stream_stream(
        f"/{SERVICE}/{METHOD}",
        request_serializer=lambda b: b,
        response_deserializer=lambda b: b,
    )

    def gen():
        for i in range(0, max(len(pcm16), 1), chunk):
            yield _ser({"user": user, "speaking": True, "audio_fs": audio_fs,
                        "audio_data": base64.b64encode(
                            pcm16[i: i + chunk]).decode()})
        yield _ser({"user": user, "speaking": False, "audio_fs": audio_fs})

    out = [_de(r) for r in stub(gen())]
    channel.close()
    return out


def main(argv=None):
    import argparse

    from funasr_tpu.auto.auto_model import AutoModel

    ap = argparse.ArgumentParser(prog="funasr-tpu-grpc-server")
    ap.add_argument("--model", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=10098)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    am = AutoModel(model=args.model)
    srv = AsrGrpcServer(am, host=args.host, port=args.port)
    srv.start()
    srv.wait()


if __name__ == "__main__":
    main()
