#!/usr/bin/env bash
# Multi-task FSMN KWS (reference fsmn_kws_mt/demo.py): token + task heads
# over one FSMN body; keyword decode via the CTC prefix scorer and DET
# metrics in funasr_tpu/metrics/kws_det.py.
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="<local fsmn_kws_mt checkpoint dir>")
for r in am.generate(sys.argv[1:] or ["kws_example.wav"]):
    print(r["key"], r.get("text"))
PY
