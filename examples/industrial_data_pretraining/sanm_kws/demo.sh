#!/usr/bin/env bash
# SANM keyword spotting, offline + streaming variants (reference
# sanm_kws/ and sanm_kws_streaming/ demo.py).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="<local sanm_kws checkpoint dir>")
for r in am.generate(sys.argv[1:] or ["kws_example.wav"]):
    print(r["key"], r.get("text"))
PY
