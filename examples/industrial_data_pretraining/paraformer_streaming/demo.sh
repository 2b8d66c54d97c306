#!/usr/bin/env bash
# Streaming 600 ms chunks (reference paraformer_streaming/demo.py:
# chunk_size [0,10,5], 480 ms lookahead).
python - "$@" <<'PY'
import sys
import numpy as np
from funasr_tpu import AutoModel
from funasr_tpu.utils.audio import load_audio

am = AutoModel(model="paraformer-zh-streaming")
wav = load_audio(sys.argv[1] if len(sys.argv) > 1 else "asr_example_zh.wav")
chunk = 960 * 10          # chunk_size[1] * 960 samples = 600 ms
cache = {}
for i in range(0, len(wav), chunk):
    final = i + chunk >= len(wav)
    res = am.generate(wav[i:i + chunk], cache=cache,
                      is_final=final, chunk_size=[0, 10, 5])
    if res and res[0]["text"]:
        print(res[0]["text"], end="", flush=True)
print()
PY
