#!/usr/bin/env bash
# Streaming punctuation with the VAD-aware time-delay mask (reference
# ct_transformer_streaming/demo.py): feed partial transcripts, carry the
# cache between calls.
python - <<'PY'
from funasr_tpu import AutoModel

am = AutoModel(model="iic/punc_ct-transformer_zh-cn-common-vad_realtime-vocab272727")
cache = {}
for chunk in ["跨境河流是养育沿岸", "人民的生命之源"]:
    out = am.engine.model.punctuate_streaming(chunk, cache=cache)
    print(out)
PY
