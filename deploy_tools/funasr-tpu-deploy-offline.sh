#!/usr/bin/env bash
# One-click offline ASR service deploy (the TPU analogue of the
# reference's runtime/deploy_tools/funasr-runtime-deploy-offline-cpu-zh.sh,
# which wraps a docker pull of their prebuilt image; here the framework
# runs in-place, so deploy = build native libs -> fetch/convert models ->
# warm -> serve).
#
#   deploy_tools/funasr-tpu-deploy-offline.sh \
#       --model <dir|modelscope-id> [--vad-model ...] [--punc-model ...] \
#       [--port 10095] [--host 0.0.0.0] [--warmup-seconds "15 30 60"]
#
# Models: a local snapshot dir with config.yaml + converted weights, or a
# hub id resolved by funasr_tpu.download (offline environments must
# pre-place snapshots).  Conversion from reference torch checkpoints:
#   python -m funasr_tpu.bin.convert --input <dir>/model.pt --output <dir>
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
PORT=10095
HOST=0.0.0.0
MODEL=""
VAD=""
PUNC=""
WARMUP="15 30 60"
EXTRA=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    --model)      MODEL="$2"; shift 2 ;;
    --vad-model)  VAD="$2"; shift 2 ;;
    --punc-model) PUNC="$2"; shift 2 ;;
    --port)       PORT="$2"; shift 2 ;;
    --host)       HOST="$2"; shift 2 ;;
    --warmup-seconds) WARMUP="$2"; shift 2 ;;
    *) EXTRA+=("$1"); shift ;;
  esac
done

if [[ -z "$MODEL" ]]; then
  echo "usage: $0 --model <dir|hub-id> [--vad-model ...] [--punc-model ...]" >&2
  exit 2
fi

echo "[1/3] building native runtime libraries"
make -s -C "$REPO_DIR/funasr_tpu/runtime/native" all

echo "[2/3] checking model assets"
ARGS=(--model "$MODEL" --host "$HOST" --port "$PORT")
[[ -n "$VAD" ]] && ARGS+=(--vad-model "$VAD")
[[ -n "$PUNC" ]] && ARGS+=(--punc-model "$PUNC")
# shellcheck disable=SC2206
ARGS+=(--warmup-seconds $WARMUP)

echo "[3/3] starting websocket server on ws://$HOST:$PORT (warming buckets: $WARMUP s)"
cd "$REPO_DIR"
exec python -m funasr_tpu.runtime.websocket_server "${ARGS[@]}" "${EXTRA[@]}"
