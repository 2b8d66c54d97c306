#!/usr/bin/env bash
# SCAMA chunk-aware streaming AR decode (reference scama/demo.py).  r4:
# the real FsmnDecoderSCAMAOpt — AR beam over chunk-synchronised
# cross-attention windows from the CIF fire alignment.
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="<local scama checkpoint dir>")  # reference layout;
# funasr-tpu-convert the model.pt once (docs/USAGE.md "Evaluating real
# checkpoints")
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"], nbest=1):
    print(r["key"], r["text"])
PY
