#!/usr/bin/env bash
# Whisper-large-v3 via the HF-flax wrap (reference whisper/demo.py).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="whisper-large-v3")
for r in am.generate(sys.argv[1:] or ["asr_example_en.wav"]):
    print(r["key"], r["text"])
PY
