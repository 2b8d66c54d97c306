#!/usr/bin/env bash
# Synthetic end-to-end recipe: data gen -> jsonl -> cmvn -> train (tiny
# Paraformer, few steps) -> infer -> CER.  CPU-runnable in ~2 min; this is
# the CI-able regression recipe the reference lacks (its recipes need real
# AISHELL downloads).  Executed by tests/test_examples.py.

set -euo pipefail
work="${1:-$(mktemp -d /tmp/funasr_tpu_smoke.XXXXXX)}"
here="$(cd "$(dirname "$0")" && pwd)"
echo "workdir: ${work}"

python "${here}/make_data.py" "${work}"

funasr-tpu-scp2jsonl \
  --scp_file_list "${work}/wav.scp" "${work}/text" \
  --jsonl_file_out "${work}/train.jsonl"

python -m funasr_tpu.bin.compute_audio_cmvn \
  --train-jsonl "${work}/train.jsonl" \
  --output "${work}/am.mvn"

funasr-tpu-train \
  --config "${here}/conf/tiny_paraformer.yaml" \
  --train-jsonl "${work}/train.jsonl" \
  --valid-jsonl "${work}/train.jsonl" \
  --output-dir "${work}/exp" \
  --max-epoch 1 \
  ++frontend_conf.cmvn_file="${work}/am.mvn"

funasr-tpu \
  --model "${here}/conf/tiny_paraformer.yaml" \
  --input "${work}/train.jsonl" \
  --output-dir "${work}/decode" \
  ++init_param="${work}/exp/model.avg.npz" \
  ++frontend_conf.cmvn_file="${work}/am.mvn"

python -m funasr_tpu.metrics.wer \
  --ref "${work}/text" --hyp "${work}/decode/text" --cer

echo "SMOKE OK (${work})"
