#!/usr/bin/env bash
# AISHELL-1 Paraformer recipe, TPU-native (reference
# examples/aishell/paraformer/run.sh stages 0-5, torchrun replaced by the
# jitted data-parallel trainer — DP spans every visible TPU device).
#
#   ./run.sh --raw-data /path/to/aishell --stage 0 --stop-stage 4

set -euo pipefail

raw_data=../raw_data          # expects $raw_data/data_aishell/{wav,transcript}
feats_dir=../DATA
exp_dir=$(pwd)/exp
stage=0
stop_stage=4
config=conf/paraformer_conformer_12e_6d_2048_256.yaml
tag=exp1
inference_batch_size=32

while [ $# -gt 0 ]; do
  case "$1" in
    --*) name="${1#--}"; name="${name//-/_}"; eval "${name}=\"$2\""; shift 2 ;;
    *) echo "unknown arg $1"; exit 1 ;;
  esac
done

model_dir="${exp_dir}/baseline_$(basename "${config}" .yaml)_zh_char_${tag}"
mkdir -p "${feats_dir}" "${model_dir}"

train_set=train
valid_set=dev
test_sets="dev test"

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
  echo "stage 0: data preparation (wav.scp + text -> jsonl)"
  for split in $(printf "%s\n" ${train_set} ${valid_set} ${test_sets} | sort -u); do
    d="${feats_dir}/${split}"
    [ -f "${d}/wav.scp" ] || { echo "expect ${d}/wav.scp + ${d}/text" \
      "(kaldi-style lists over ${raw_data})"; exit 1; }
    funasr-tpu-scp2jsonl \
      --scp_file_list "${d}/wav.scp" "${d}/text" \
      --jsonl_file_out "${feats_dir}/${split}.jsonl"
  done
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
  echo "stage 1: CMVN + vocab"
  python -m funasr_tpu.bin.compute_audio_cmvn \
    --train-jsonl "${feats_dir}/${train_set}.jsonl" \
    --output "${model_dir}/am.mvn"
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
  echo "stage 2: train (DP over all visible TPU devices)"
  # parallelism knobs (parallel/): --model-parallel N adds a tensor axis,
  # --pipeline-parallel M additionally shards the encoder LAYER axis with
  # M GPipe microbatches (dp x tp x pp; grads exact vs single-device),
  # --fsdp shards params ZeRO-style over the data axis.
  funasr-tpu-train \
    --config "${config}" \
    --train-jsonl "${feats_dir}/${train_set}.jsonl" \
    --valid-jsonl "${feats_dir}/${valid_set}.jsonl" \
    --output-dir "${model_dir}" \
    ++frontend_conf.cmvn_file="${model_dir}/am.mvn"
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
  echo "stage 3: inference with the n-best-averaged checkpoint"
  for split in ${test_sets}; do
    funasr-tpu \
      --model "${config}" \
      --input "${feats_dir}/${split}.jsonl" \
      --output-dir "${model_dir}/decode_${split}" \
      --batch-size "${inference_batch_size}" \
      ++init_param="${model_dir}/model.avg.npz" \
      ++frontend_conf.cmvn_file="${model_dir}/am.mvn"
  done
fi

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
  echo "stage 4: CER"
  for split in ${test_sets}; do
    python -m funasr_tpu.metrics.wer \
      --ref "${feats_dir}/${split}.jsonl" \
      --hyp "${model_dir}/decode_${split}/text" \
      --cer > "${model_dir}/decode_${split}/cer.txt"
    cat "${model_dir}/decode_${split}/cer.txt"
  done
fi

if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
  # Turnkey pretrained eval: ModelScope/HF snapshot dir -> convert ->
  # AISHELL-1 decode -> CER (proves the <=1.94 north star the moment
  # weights are reachable; reference flow examples/aishell/paraformer/
  # run.sh infer stage + funasr/metrics/wer.py).
  #   ./run.sh --stage 5 --stop-stage 5 \
  #       --pretrained-dir /path/to/speech_paraformer-large_...-pytorch
  : "${pretrained_dir:?--pretrained-dir <snapshot dir with model.pt + config.yaml + am.mvn + tokens> required}"
  echo "stage 5: pretrained-weights eval from ${pretrained_dir}"
  if [ ! -f "${pretrained_dir}/model.npz" ]; then
    funasr-tpu-convert --input "${pretrained_dir}/model.pt" \
      --output "${pretrained_dir}/model.npz"
  fi
  for split in ${test_sets}; do
    out="${exp_dir}/pretrained_decode_${split}"
    mkdir -p "${out}"
    funasr-tpu \
      --model "${pretrained_dir}" \
      --input "${feats_dir}/${split}.jsonl" \
      --output-dir "${out}" \
      --batch-size "${inference_batch_size}"
    python -m funasr_tpu.metrics.wer \
      --ref "${feats_dir}/${split}.jsonl" \
      --hyp "${out}/text" \
      --cer | tee "${out}/cer.txt"
  done
fi
