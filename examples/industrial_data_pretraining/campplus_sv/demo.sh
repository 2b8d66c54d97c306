#!/usr/bin/env bash
# CAM++ speaker verification / diarization branch (reference campplus_sv).
python - "$@" <<'PY'
import sys
from funasr_tpu import AutoModel

am = AutoModel(model="cam++")
r = am.generate(sys.argv[1:] or ["speaker1_a_cn_16k.wav"])
print(r[0]["spk_embedding"].shape)
PY
