#!/usr/bin/env bash
# emotion2vec SER (reference emotion2vec/demo.py): utterance-level
# emotion logits/labels from the finetuned head.
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="iic/emotion2vec_base_finetuned")
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"]):
    print(r["key"], r.get("labels"), r.get("scores"))
PY
