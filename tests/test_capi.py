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


def test_capi_2pass_handle():
    """FtaTpassInit + FtaInferBuffer: per-chunk 2pass-online partials,
    offline re-decode at input_finished (reference FunTpassInferBuffer,
    tpass-stream.cpp:144)."""
    import jax
    import jax.numpy as jnp

    lib = _lib()
    lib.FtaTpassInit.argtypes = [ctypes.c_long, ctypes.c_char_p]
    lib.FtaTpassInit.restype = ctypes.c_long

    h = lib.FtaOfflineInit(json.dumps(ASR_CFG).encode())
    assert h > 0

    # inject a tiny streaming model (a real config would pass
    # streaming_config with init_param weights; the handle logic is the
    # same either way)
    from funasr_tpu.frontends.streaming import StreamingFrontend
    from funasr_tpu.models.paraformer.model import Paraformer
    from funasr_tpu.models.paraformer_streaming.model import (
        ParaformerStreaming,
    )
    from funasr_tpu.runtime import capi_bridge

    tiny = dict(
        vocab_size=32, input_size=24,
        encoder_conf=dict(output_size=16, attention_heads=2,
                          linear_units=32, num_blocks=3, kernel_size=5,
                          dropout_rate=0.0),
        decoder_conf=dict(attention_heads=2, linear_units=32, num_blocks=2,
                          att_layer_num=2, kernel_size=5, dropout_rate=0.0),
        predictor_conf=dict(idim=16, tail_threshold=0.45, dropout=0.0),
    )
    model = Paraformer(**tiny)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key}, jax.random.normal(key, (1, 30, 24)),
                        jnp.array([30]), max_tokens=16,
                        method=model.greedy_decode)
    sm = ParaformerStreaming(
        params, input_size=24, d_model=16, n_head=2, enc_kernel=5,
        dec_kernel=5, n_enc_layers=3, n_dec_layers=2, chunk_size=(0, 6, 3),
        encoder_chunk_look_back=2,
        frontend=StreamingFrontend(n_mels=8, lfr_m=3, lfr_n=2))
    capi_bridge._get(h)["streaming_model"] = sm

    h2 = lib.FtaTpassInit(h, b"{}")
    assert h2 > 0

    pcm = _pcm(0.6)
    out1 = json.loads(_take(lib, lib.FtaInferBuffer(
        h2, pcm, len(pcm), 16000, b"pcm", 0, None)))
    assert out1["mode"] == "2pass-online" and not out1["is_final"]
    out2 = json.loads(_take(lib, lib.FtaInferBuffer(
        h2, pcm, len(pcm), 16000, b"pcm", 1, None)))
    assert out2["mode"] == "2pass-offline" and out2["is_final"]
    assert "text" in out2  # offline re-decode of both chunks
    lib.FtaUninit(h2)
    lib.FtaUninit(h)
