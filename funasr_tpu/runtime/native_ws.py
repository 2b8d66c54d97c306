"""ctypes binding for the native (C++) WebSocket transport + the ASR server
built on it.

The reference serves over C++ websocket servers
(runtime/websocket/bin/websocket-server-2pass.cpp, asio/websocketpp);
``runtime/native/libfta_ws.so`` is the TPU-native equivalent: sockets,
epoll, the RFC6455 handshake/framing/ping/close all run in C++, while the
Python side pumps events and runs the jitted device programs — the right
split for a TPU runtime, where the model is a compiled XLA program rather
than an ONNX session the C++ code could own.

Protocol logic (JSON messages, 2pass orchestration) is shared with the
asyncio server via ``AsrWebSocketServer.on_text/on_binary``, so both
transports are behaviorally identical (tested in tests/test_native_ws.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Dict, Optional

log = logging.getLogger(__name__)

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO = os.path.join(_DIR, "libfta_ws.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

EV_OPEN, EV_TEXT, EV_BINARY, EV_CLOSE = 1, 2, 3, 4


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _DIR, "libfta_ws.so"],
                           capture_output=True, text=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_DIR, "fta_ws.cc")
        if not os.path.exists(_SO) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_SO)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.fta_ws_create.restype = ctypes.c_void_p
        lib.fta_ws_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.fta_ws_port.restype = ctypes.c_int
        lib.fta_ws_port.argtypes = [ctypes.c_void_p]
        lib.fta_ws_poll.restype = ctypes.c_int
        lib.fta_ws_poll.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.fta_ws_next_event.restype = ctypes.c_void_p
        lib.fta_ws_next_event.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.fta_ws_send_text.restype = ctypes.c_int
        lib.fta_ws_send_text.argtypes = [
            ctypes.c_void_p, ctypes.c_longlong, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.fta_ws_send_binary.restype = ctypes.c_int
        lib.fta_ws_send_binary.argtypes = lib.fta_ws_send_text.argtypes
        lib.fta_ws_close.restype = None
        lib.fta_ws_close.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
        lib.fta_ws_destroy.restype = None
        lib.fta_ws_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


class NativeWsTransport:
    """Thin pythonic wrapper over the C event-pump API."""

    def __init__(self, host: str = "0.0.0.0", port: int = 10095):
        lib = _load()
        if lib is None:
            raise RuntimeError("libfta_ws.so unavailable (no C++ toolchain?)")
        self._lib = lib
        self._h = lib.fta_ws_create(host.encode(), port)
        if not self._h:
            raise OSError(f"cannot bind ws://{host}:{port}")
        self.port = lib.fta_ws_port(self._h)

    def poll(self, timeout_ms: int = 100):
        """Pump the loop once; yield (conn_id, ev_type, payload bytes)."""
        lib = self._lib
        n = lib.fta_ws_poll(self._h, timeout_ms)
        for _ in range(n):
            conn = ctypes.c_longlong()
            typ = ctypes.c_int()
            ln = ctypes.c_int()
            ptr = lib.fta_ws_next_event(
                self._h, ctypes.byref(conn), ctypes.byref(typ),
                ctypes.byref(ln))
            if ln.value < 0:
                break
            payload = (ctypes.string_at(ptr, ln.value)
                       if ptr and ln.value else b"")
            yield conn.value, typ.value, payload

    def send_text(self, conn: int, text: str) -> bool:
        data = text.encode()
        return self._lib.fta_ws_send_text(self._h, conn, data, len(data)) == 0

    def send_binary(self, conn: int, data: bytes) -> bool:
        return self._lib.fta_ws_send_binary(self._h, conn, data,
                                            len(data)) == 0

    def close(self, conn: int):
        self._lib.fta_ws_close(self._h, conn)

    def shutdown(self):
        if self._h:
            self._lib.fta_ws_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.shutdown()
        except Exception:
            pass


class NativeAsrWebSocketServer:
    """The reference websocket ASR protocol over the native transport.

    Shares all protocol/decode logic with the asyncio server
    (websocket_server.AsrWebSocketServer.on_text/on_binary); this class only
    maps transport events to sessions.
    """

    def __init__(self, auto_model, streaming_model=None, host: str = "0.0.0.0",
                 port: int = 10095):
        from funasr_tpu.runtime.websocket_server import AsrWebSocketServer

        self.logic = AsrWebSocketServer(auto_model, streaming_model,
                                        host, port)
        self.transport = NativeWsTransport(host, port)
        self.port = self.transport.port
        self.sessions: Dict[int, object] = {}
        self._stop = threading.Event()

    def step(self, timeout_ms: int = 100) -> int:
        """One pump step; returns the number of events handled."""
        from funasr_tpu.runtime.websocket_server import WsSession

        handled = 0
        for conn, typ, payload in self.transport.poll(timeout_ms):
            handled += 1
            try:
                if typ == EV_OPEN:
                    self.sessions[conn] = WsSession(self.logic)
                elif typ == EV_CLOSE:
                    self.sessions.pop(conn, None)
                elif conn in self.sessions:
                    sess = self.sessions[conn]
                    if typ == EV_TEXT:
                        responses = self.logic.on_text(
                            sess, payload.decode("utf-8"))
                    else:
                        responses = self.logic.on_binary(sess, payload)
                    for r in responses:
                        self.transport.send_text(conn, r)
            except Exception:  # pragma: no cover - bad client input
                log.exception("native ws session error (conn %d)", conn)
                self.transport.close(conn)
                self.sessions.pop(conn, None)
        return handled

    def run(self):
        log.info("native ASR websocket server on port %d", self.port)
        while not self._stop.is_set():
            self.step(100)

    def stop(self):
        self._stop.set()

    def shutdown(self):
        self.stop()
        self.transport.shutdown()


def main(argv=None):  # CLI: python -m funasr_tpu.runtime.native_ws
    import argparse

    from funasr_tpu.auto.auto_model import AutoModel

    ap = argparse.ArgumentParser(prog="funasr-tpu-server-native")
    ap.add_argument("--model", required=True)
    ap.add_argument("--vad-model", default=None)
    ap.add_argument("--punc-model", default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=10095)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    am = AutoModel(
        model=args.model,
        vad_model=args.vad_model,
        punc_model=args.punc_model,
    )
    NativeAsrWebSocketServer(am, host=args.host, port=args.port).run()


if __name__ == "__main__":
    main()
