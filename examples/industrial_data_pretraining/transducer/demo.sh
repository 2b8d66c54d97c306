#!/usr/bin/env bash
# RNN-T / BAT greedy device decode (reference transducer & bat demo.py;
# BAT == Transducer in the reference, bat/model.py:36).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="<local transducer checkpoint dir>")
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"]):
    print(r["key"], r["text"])
PY
