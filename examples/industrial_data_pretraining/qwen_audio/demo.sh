#!/usr/bin/env bash
# Qwen-Audio (reference qwen_audio/demo.py): Whisper encoder + Qwen LLM
# composition (models/qwen_audio/).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="Qwen-Audio")
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"]):
    print(r["key"], r["text"])
PY
