#!/usr/bin/env bash
# SenseVoiceSmall multitask inference with rich-tag decode (reference
# examples/industrial_data_pretraining/sense_voice/demo.py).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="sensevoice", quantize=True)
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"],
                     language="auto", use_itn=True):
    print(r["key"], r["text"])
PY
