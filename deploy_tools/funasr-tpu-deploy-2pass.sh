#!/usr/bin/env bash
# One-click 2pass (online + offline correction) service deploy — the TPU
# analogue of the reference's funasr-runtime-deploy-online-cpu-zh.sh
# (docker wrapper around websocket-server-2pass).  Requires a streaming
# model config (ParaformerStreaming config.yaml with init_param weights)
# in addition to the offline stack.
#
#   deploy_tools/funasr-tpu-deploy-2pass.sh \
#       --model <dir> --streaming-model <config.yaml> \
#       [--vad-model ...] [--punc-model ...] [--port 10096]
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
PORT=10096
HOST=0.0.0.0
MODEL=""
STREAMING=""
VAD=""
PUNC=""
WARMUP="15 30 60"
EXTRA=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    --model)           MODEL="$2"; shift 2 ;;
    --streaming-model) STREAMING="$2"; shift 2 ;;
    --vad-model)       VAD="$2"; shift 2 ;;
    --punc-model)      PUNC="$2"; shift 2 ;;
    --port)            PORT="$2"; shift 2 ;;
    --host)            HOST="$2"; shift 2 ;;
    --warmup-seconds)  WARMUP="$2"; shift 2 ;;
    *) EXTRA+=("$1"); shift ;;
  esac
done

if [[ -z "$MODEL" || -z "$STREAMING" ]]; then
  echo "usage: $0 --model <dir> --streaming-model <config.yaml> ..." >&2
  exit 2
fi

echo "[1/2] building native runtime libraries"
make -s -C "$REPO_DIR/funasr_tpu/runtime/native" all

ARGS=(--model "$MODEL" --streaming-model "$STREAMING"
      --host "$HOST" --port "$PORT")
[[ -n "$VAD" ]] && ARGS+=(--vad-model "$VAD")
[[ -n "$PUNC" ]] && ARGS+=(--punc-model "$PUNC")
# shellcheck disable=SC2206
ARGS+=(--warmup-seconds $WARMUP)

echo "[2/2] starting 2pass websocket server on ws://$HOST:$PORT"
cd "$REPO_DIR"
exec python -m funasr_tpu.runtime.websocket_server "${ARGS[@]}" "${EXTRA[@]}"
