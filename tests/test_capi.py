"""Consolidated handle-based C API (runtime/native/fta_api.cc).

The reference exposes FunASRInit/FunASRInferBuffer/FunASRUninit &co so C
applications embed the engines (runtime/onnxruntime/include/
funasrruntime.h:60,80,93,99).  Here the native library embeds CPython and
routes through runtime/capi_bridge.py; these tests exercise:

- the C ABI loaded into an existing interpreter (ctypes — the
  PyGILState_Ensure path with Py_Initialize skipped),
- the standalone C application path (fta-offline-cli, a real embedder
  where Py_InitializeEx runs inside libfta_api.so).
"""

import ctypes
import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..", "funasr_tpu",
                      "runtime", "native")

VOCAB = ["<blank>", "<s>", "</s>"] + list("我们今天去公园玩吧好的一二三四五")

ASR_CFG = dict(
    model=dict(
        model="Paraformer",
        vocab_size=len(VOCAB),
        tokenizer_conf={"token_list": VOCAB},
        frontend_conf=dict(n_mels=20, lfr_m=3, lfr_n=2),
        input_size=60,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=2, kernel_size=5,
                          dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=1,
                          att_layer_num=1, kernel_size=5, dropout_rate=0.0),
        predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
    ),
)

PUNC_CFG = dict(
    punc_model=dict(
        model="CTTransformer",
        vocab_size=len(VOCAB),
        tokenizer_conf={"token_list": VOCAB},
        embed_unit=16,
        att_unit=16,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=2, kernel_size=5,
                          dropout_rate=0.0),
    ),
)


def _build():
    subprocess.run(["make", "-C", NATIVE, "libfta_api.so",
                    "fta-offline-cli"], check=True, capture_output=True)


def _lib():
    _build()
    lib = ctypes.CDLL(os.path.join(NATIVE, "libfta_api.so"))
    lib.FtaOfflineInit.argtypes = [ctypes.c_char_p]
    lib.FtaOfflineInit.restype = ctypes.c_long
    lib.FtaPuncInit.argtypes = [ctypes.c_char_p]
    lib.FtaPuncInit.restype = ctypes.c_long
    lib.FtaVadInit.argtypes = [ctypes.c_char_p]
    lib.FtaVadInit.restype = ctypes.c_long
    lib.FtaInferBuffer.argtypes = [
        ctypes.c_long, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p]
    lib.FtaInferBuffer.restype = ctypes.c_void_p  # free via FtaFreeResult
    lib.FtaPuncInfer.argtypes = [ctypes.c_long, ctypes.c_char_p]
    lib.FtaPuncInfer.restype = ctypes.c_void_p
    lib.FtaFreeResult.argtypes = [ctypes.c_void_p]
    lib.FtaUninit.argtypes = [ctypes.c_long]
    return lib


def _take(lib, ptr) -> str:
    s = ctypes.string_at(ptr).decode("utf-8")
    lib.FtaFreeResult(ptr)
    return s


def _pcm(secs=2.0) -> bytes:
    n = int(16000 * secs)
    wav = 0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)
    return (wav * 32767).astype("<i2").tobytes()


def test_capi_offline_pcm_roundtrip():
    lib = _lib()
    h = lib.FtaOfflineInit(json.dumps(ASR_CFG).encode())
    assert h > 0
    pcm = _pcm()
    out = json.loads(_take(lib, lib.FtaInferBuffer(
        h, pcm, len(pcm), 16000, b"pcm", 1, None)))
    assert "error" not in out, out
    assert "text" in out and "key" in out
    lib.FtaUninit(h)


def test_capi_punc_handle():
    lib = _lib()
    h = lib.FtaPuncInit(json.dumps(PUNC_CFG).encode())
    assert h > 0
    out = json.loads(_take(lib, lib.FtaPuncInfer(h, "我们今天去公园".encode())))
    assert "error" not in out, out
    assert "text" in out
    lib.FtaUninit(h)


def test_capi_reports_errors_as_json_not_exceptions():
    lib = _lib()
    h = lib.FtaOfflineInit(json.dumps(ASR_CFG).encode())
    out = json.loads(_take(lib, lib.FtaInferBuffer(
        h, b"xx", 2, 16000, b"ogg", 1, None)))  # unsupported format
    assert "error" in out
    lib.FtaUninit(h)


def test_capi_standalone_c_embedder(tmp_path):
    """fta-offline-cli: a pure-C process that embeds the interpreter."""
    _build()
    pcm = _pcm(1.0)
    n = len(pcm)
    wav_path = tmp_path / "a.wav"
    hdr = (b"RIFF" + struct.pack("<I", 36 + n) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
           + b"data" + struct.pack("<I", n))
    wav_path.write_bytes(hdr + pcm)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.abspath(os.path.join(NATIVE, "..", "..",
                                                       "..")))
    r = subprocess.run(
        [os.path.join(NATIVE, "fta-offline-cli"),
         json.dumps(ASR_CFG), str(wav_path)],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, (r.stdout, r.stderr)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "text" in out and "error" not in out
