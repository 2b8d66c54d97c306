"""Python half of the consolidated handle-based C API.

The reference runtime exposes a handle-based C ABI
(runtime/onnxruntime/include/funasrruntime.h:60 FunASRInit /
FunASRInferBuffer / FunASRUninit, :99 FunOfflineInit, :80 FsmnVadInit,
:93 CTTransformerInfer) so C/C++/Java/Go applications can embed the
engines.  Here the TPU compute path lives in JAX, so the native library
(runtime/native/fta_api.cc -> libfta_api.so) embeds CPython and calls
into this module; a C application links libfta_api.so and never sees
Python.  Handles are integer ids into the registry below; every call
returns a JSON string so the ABI stays C-plain (no structs to version).

Contract per function (mirrors the reference semantics):
  init(json_cfg)          -> handle        (FunOfflineInit / FunASRInit)
  online_init(h, json)    -> handle        (FunASROnlineInit: shares the
                                            offline model, own stream state)
  infer(h, pcm, fs, fmt, is_final, json_kw) -> json  (FunASRInferBuffer /
                                            FunOfflineInferBuffer)
  vad_init / vad_infer                     (FsmnVadInit / FsmnVadInferBuffer)
  punc_init / punc_infer                   (CTTransformerInit / ...Infer)
  uninit(h)                                (FunASRUninit etc.)
"""

from __future__ import annotations

import json
import threading
from typing import Any, Dict

_LOCK = threading.Lock()
_REG: Dict[int, Any] = {}
_NEXT = [1]


def _register(obj: Any) -> int:
    with _LOCK:
        h = _NEXT[0]
        _NEXT[0] += 1
        _REG[h] = obj
    return h


def _get(handle: int) -> Any:
    with _LOCK:
        return _REG[handle]


def _err(msg: str) -> str:
    return json.dumps({"error": str(msg)})



def _decode_wav(pcm: bytes, fs: int, wav_format: str = "pcm"):
    """Bytes -> float32 mono waveform at 16 kHz.

    "pcm"/"raw" buffers are little-endian int16 at ``fs`` (resampled like
    websocket_server._pcm_to_wave — every downstream engine assumes 16 k);
    anything else is full file bytes routed through utils.audio.load_audio
    (RIFF/mp3/... with its own rate header).
    """
    import numpy as np

    if wav_format in ("pcm", "raw"):
        wav = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
        if fs != 16000:
            from funasr_tpu.utils.audio import resample_linear

            wav = resample_linear(wav, fs, 16000)
        return wav
    import tempfile

    from funasr_tpu.utils.audio import load_audio

    with tempfile.NamedTemporaryFile(suffix=f".{wav_format}") as f:
        f.write(pcm)
        f.flush()
        return load_audio(f.name, fs=16000)


def _tokens_to_text(ent, toks) -> str:
    tok = ent.get("tokenizer")
    return tok.decode(toks) if tok is not None \
        else " ".join(map(str, toks))


# --------------------------------------------------------------------- ASR
def init(json_cfg: str) -> int:
    """FunOfflineInit/FunASRInit: build an AutoModel from a JSON config.

    The config is the AutoModel kwargs verbatim: {"model": <name|dict>,
    "vad_model": ..., "punc_model": ..., "quantize": true, ...}.  A bare
    string is treated as {"model": <string>}.
    """
    cfg = json.loads(json_cfg)
    if isinstance(cfg, str):
        cfg = {"model": cfg}
    from funasr_tpu.auto.auto_model import AutoModel

    return _register({"kind": "asr", "model": AutoModel(**cfg)})


def online_init(asr_handle: int, json_cfg: str) -> int:
    """FunASROnlineInit: a streaming session sharing the offline handle.

    json_cfg: {"chunk_size": [0,10,5], "streaming_config": {...}} — the
    streaming model config (ParaformerStreaming kwargs) if the offline
    AutoModel was not built from a config that carries one.
    """
    cfg = json.loads(json_cfg) if json_cfg else {}
    base = _get(asr_handle)
    sm = base.get("streaming_model")
    if sm is None and "streaming_config" in cfg:
        from funasr_tpu.runtime.websocket_server import build_streaming_model

        sc = dict(cfg["streaming_config"])
        if "chunk_size" in cfg:
            sc.setdefault("chunk_size", cfg["chunk_size"])
        sm = build_streaming_model(sc)
        base["streaming_model"] = sm
    if sm is None:
        raise ValueError("no streaming model: pass streaming_config")
    tok = getattr(base["model"].engine, "tokenizer", None)
    return _register({"kind": "asr_online", "base": asr_handle,
                      "model": sm, "cache": sm.init_cache(),
                      "tokenizer": tok})


def tpass_init(asr_handle: int, json_cfg: str) -> int:
    """FunTpassInit equivalent: a 2pass session — online partials per
    chunk through the streaming model, offline re-decode of the whole
    utterance at input_finished (reference tpass-stream.cpp:144 +
    FunTpassInferBuffer)."""
    h = online_init(asr_handle, json_cfg)
    ent = _get(h)
    ent["kind"] = "asr_2pass"
    ent["buffer"] = []  # decoded 16 kHz float chunks
    return h


def infer(handle: int, pcm: bytes, fs: int, wav_format: str,
          is_final: bool, json_kwargs: str) -> str:
    """FunASRInferBuffer / FunOfflineInferBuffer.

    pcm: little-endian int16 buffer ("pcm"), or a full audio file's bytes
    ("wav"/"mp3"/... — anything utils.audio.load_bytes handles).
    Returns a JSON object {"text": ..., ...} (offline) or the incremental
    {"text": ...} (online).
    """
    import numpy as np

    try:
        ent = _get(handle)
        kw = json.loads(json_kwargs) if json_kwargs else {}
        wav = _decode_wav(pcm, fs, wav_format)  # 16 kHz float32 always
        if ent["kind"] == "asr":
            res = ent["model"].generate(wav, **kw)
            out = res[0] if res else {"text": ""}
            out.pop("timestamp_raw", None)
            return json.dumps(_jsonable(out))
        # online / 2pass: feed the chunk through the streaming session
        sm = ent["model"]
        toks = sm.generate_chunk(ent["cache"], wav, is_final=bool(is_final))
        out: Dict[str, Any] = {"text": _tokens_to_text(ent, toks),
                               "is_final": bool(is_final),
                               "mode": "2pass-online"
                               if ent["kind"] == "asr_2pass" else "online"}
        if ent["kind"] == "asr_2pass":
            # accumulate DECODED audio: raw file bytes (headers) or
            # non-16k pcm must not be reinterpreted as samples at final
            ent["buffer"].append(wav)
            if is_final:
                full = np.concatenate(ent["buffer"]) if ent["buffer"] \
                    else np.zeros(0, np.float32)
                ent["buffer"] = []
                res = _get(ent["base"])["model"].generate(full, **kw)
                out["mode"] = "2pass-offline"
                out["text"] = (res[0].get("text", "") if res else "")
        if is_final:
            ent["cache"] = sm.init_cache()
        return json.dumps(_jsonable(out))
    except Exception as e:  # noqa: BLE001 — the ABI reports, never throws
        return _err(e)


# --------------------------------------------------------------------- VAD
def vad_init(json_cfg: str) -> int:
    """FsmnVadInit: standalone VAD AutoModel (segment lists)."""
    cfg = json.loads(json_cfg)
    if isinstance(cfg, str):
        cfg = {"vad_model": cfg}
    from funasr_tpu.auto.auto_model import AutoModel

    return _register({"kind": "vad", "model": AutoModel(**cfg)})


def vad_infer(handle: int, pcm: bytes, fs: int, is_final: bool) -> str:
    try:
        ent = _get(handle)
        wav = _decode_wav(pcm, fs)
        res = ent["model"].generate(wav)
        segs = res[0].get("value", []) if res else []
        return json.dumps({"segments": _jsonable(segs)})
    except Exception as e:  # noqa: BLE001
        return _err(e)


# -------------------------------------------------------------------- Punc
def punc_init(json_cfg: str) -> int:
    """CTTransformerInit equivalent."""
    cfg = json.loads(json_cfg)
    if isinstance(cfg, str):
        cfg = {"model": cfg}
    elif "model" not in cfg and "punc_model" in cfg:
        # accept {"punc_model": ...} too; as a standalone handle the punc
        # model IS the main model (reference AutoModel(model="ct-punc"))
        cfg = dict(cfg, model=cfg.pop("punc_model"))
    from funasr_tpu.auto.auto_model import AutoModel

    return _register({"kind": "punc", "model": AutoModel(**cfg)})


def punc_infer(handle: int, text: str) -> str:
    try:
        ent = _get(handle)
        res = ent["model"].generate(text)
        return json.dumps(_jsonable(res[0] if res else {"text": text}))
    except Exception as e:  # noqa: BLE001
        return _err(e)


# ------------------------------------------------------------------ common
def uninit(handle: int) -> None:
    with _LOCK:
        _REG.pop(handle, None)


def _jsonable(x):
    import numpy as np

    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, np.generic):
        return x.item()
    if isinstance(x, np.ndarray):
        return x.tolist()
    return x
