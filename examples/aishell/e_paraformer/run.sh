#!/usr/bin/env bash
# AISHELL-1 e_paraformer recipe: shared driver, family config (reference
# examples/aishell/e_paraformer/run.sh).
exec "$(dirname "$0")/../paraformer/run.sh" \
  --config "$(dirname "$0")/conf/e_paraformer_conformer_12e_6d_2048_256.yaml" "$@"
