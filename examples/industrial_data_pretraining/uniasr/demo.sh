#!/usr/bin/env bash
# UniASR 2-pass (reference uniasr/demo.py): pass-1 low latency + pass-2
# offline correction in ONE jitted program (models/uniasr/).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="<local uniasr checkpoint dir>")
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"]):
    print(r["key"], r["text"])
PY
