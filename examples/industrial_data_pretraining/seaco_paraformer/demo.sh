#!/usr/bin/env bash
# SeACo-Paraformer hotword biasing (reference seaco_paraformer/demo.py).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(
    model="iic/speech_seaco_paraformer_large_asr_nat-zh-cn-16k-common-vocab8404-pytorch")
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"],
                     hotword="达摩院 魔搭"):
    print(r["key"], r["text"])
PY
