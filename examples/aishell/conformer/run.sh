#!/usr/bin/env bash
# AISHELL-1 conformer recipe: shared driver, family config (reference
# examples/aishell/conformer/run.sh).
exec "$(dirname "$0")/../paraformer/run.sh" \
  --config "$(dirname "$0")/conf/conformer_12e_6d_2048_256.yaml" "$@"
