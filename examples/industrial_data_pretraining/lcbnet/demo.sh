#!/usr/bin/env bash
# LCB-Net audio-visual biasing (reference lcbnet/demo.py): audio + OCR
# text-prompt fusion (models/lcbnet/).
python - <<'PY'
print("see tests/test_mfcca_lcbnet.py for the LCBNet forward surface; "
      "hub weights convert via funasr-tpu-convert")
PY
