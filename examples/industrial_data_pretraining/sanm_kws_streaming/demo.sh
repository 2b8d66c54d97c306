#!/usr/bin/env bash
# Streaming SANM KWS (reference sanm_kws_streaming/demo.py): chunked
# encoder, per-chunk keyword posteriors.
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="<local sanm_kws_streaming checkpoint dir>")
for r in am.generate(sys.argv[1:] or ["kws_example.wav"]):
    print(r["key"], r.get("text"))
PY
