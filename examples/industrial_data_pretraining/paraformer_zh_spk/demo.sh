#!/usr/bin/env bash
# Long-audio pipeline WITH speaker diarization (reference
# paraformer-zh-spk demo): VAD -> ASR+timestamps -> punc -> CAM++
# clustering -> sentence_info with per-sentence speaker labels.
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="paraformer-zh", vad_model="fsmn-vad",
               punc_model="ct-punc-c", spk_model="cam++", quantize=True)
for r in am.generate(sys.argv[1:] or ["asr_example_zh.wav"]):
    for s in r.get("sentence_info", []):
        print(s["spk"], s["sentence"], s["start"], s["end"])
PY
