#!/usr/bin/env bash
# Encoder + CTC head only (reference ctc/ registry "CTC"): greedy CTC
# decode, the minimal ASR configuration.
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="<local ctc checkpoint dir>")
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"]):
    print(r["key"], r["text"])
PY
