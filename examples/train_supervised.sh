#!/usr/bin/env bash
# Supervised long training: bounded-lifetime processes + restart-from-autosave.
#
# The axon PJRT client leaks host memory on every host<->device transfer
# (~1.1 GB/epoch on configs/accuracy.yaml; a single process OOMs a 125 GB
# host around epoch 108). Each child trains --epoch-budget epochs, autosaves
# (params + opt state + best-val params), and exits 75; we relaunch until
# training completes (exit 0 = final evaluation done) or a real error.
#
# Usage: examples/train_supervised.sh <config.yaml> <out_dir> [epoch_budget]
set -u
CONFIG=${1:?config}
OUT=${2:?out dir}
BUDGET=${3:-50}
cd "$(dirname "$0")/.."
while true; do
  python -u -m mswe_gnn_tpu.main train --config "$CONFIG" --out "$OUT" \
    --epoch-budget "$BUDGET"
  code=$?
  if [ "$code" -eq 75 ]; then
    echo "[supervisor] relaunching (budget reached)"
    continue
  fi
  # OOM kill (137) or crash: resume from the autosave rather than dying
  if [ "$code" -eq 137 ] || [ "$code" -eq 134 ] || [ "$code" -eq 139 ]; then
    echo "[supervisor] child died with $code; resuming from autosave"
    continue
  fi
  echo "[supervisor] done with exit $code"
  exit "$code"
done
