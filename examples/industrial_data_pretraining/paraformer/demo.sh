#!/usr/bin/env bash
# Long-audio pipeline on hub checkpoints (reference
# examples/industrial_data_pretraining/paraformer/demo.py).  Convert the
# ModelScope torch checkpoints once with funasr-tpu-convert, or let the
# hub resolver download them (needs network).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(
    model="paraformer-zh",          # alias -> iic/speech_paraformer-large...
    vad_model="fsmn-vad",
    punc_model="ct-punc-c",
    quantize=True,                  # int8 serving (reference wss default)
)
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"]):
    print(r["key"], r["text"])
PY
