#!/usr/bin/env bash
# BiCifParaformer: frame-accurate 20 ms timestamps (reference
# bicif_paraformer/demo.py).  Published checkpoints use the cnn_blstm
# upsample head (supported since r4).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(
    model="iic/speech_paraformer-large-vad-punc_asr_nat-zh-cn-16k-common-vocab8404-pytorch")
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"]):
    print(r["key"], r["text"], r.get("timestamp"))
PY
