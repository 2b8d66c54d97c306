#!/usr/bin/env bash
# Forced alignment "fa-zh" (reference monotonic_aligner/demo.py): CIF
# timestamps for a GIVEN transcript.
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="fa-zh")
for r in am.generate(sys.argv[1] if len(sys.argv) > 1
                     else "asr_example_zh.wav",
                     text="欢迎大家来体验达摩院推出的语音识别模型"):
    print(r)
PY
