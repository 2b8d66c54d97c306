#!/usr/bin/env bash
# Streaming FSMN-VAD segments (reference fsmn_vad_streaming/demo.py).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="fsmn-vad")
for r in am.generate(sys.argv[1:] or ["vad_example.wav"]):
    print(r["key"], r["value"])   # [[start_ms, end_ms], ...]
PY
