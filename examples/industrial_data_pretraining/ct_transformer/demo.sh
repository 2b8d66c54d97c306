#!/usr/bin/env bash
# Punctuation restoration (reference ct_transformer/demo.py).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="ct-punc-c")
text = sys.argv[1] if len(sys.argv) > 1 else \
    "那今天的会就到这里吧 happy new year 明年见"
print(am.generate(text)[0]["text"])
PY
