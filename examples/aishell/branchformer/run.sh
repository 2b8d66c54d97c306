#!/usr/bin/env bash
# AISHELL-1 branchformer recipe: shared driver, family config (reference
# examples/aishell/branchformer/run.sh).
exec "$(dirname "$0")/../paraformer/run.sh" \
  --config "$(dirname "$0")/conf/branchformer_12e_6d_2048_256.yaml" "$@"
