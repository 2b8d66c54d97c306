#!/usr/bin/env bash
# FSMN keyword spotting (reference fsmn_kws/demo.py): CTC prefix keyword
# decode; DET metrics in funasr_tpu/metrics/kws_det.py.
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="<local fsmn_kws checkpoint dir>")
for r in am.generate(sys.argv[1:] or ["kws_example.wav"]):
    print(r["key"], r.get("text"))
PY
