#!/usr/bin/env bash
# ContextualParaformer hotword biasing v1 (reference
# contextual_paraformer/demo.py).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(
    model="iic/speech_paraformer-large-contextual_asr_nat-zh-cn-16k-common-vocab8404")
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"],
                     hotword="达摩院 魔搭"):
    print(r["key"], r["text"])
PY
