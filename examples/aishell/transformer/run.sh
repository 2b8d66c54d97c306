#!/usr/bin/env bash
# AISHELL-1 transformer recipe: shared driver, family config (reference
# examples/aishell/transformer/run.sh).
exec "$(dirname "$0")/../paraformer/run.sh" \
  --config "$(dirname "$0")/conf/transformer_12e_6d_2048_256.yaml" "$@"
