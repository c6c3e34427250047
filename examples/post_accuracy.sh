#!/usr/bin/env bash
# Post-accuracy-run chain: wait for the supervised accuracy training to
# finish, then (1) snapshot its test summary into results_repo, (2) re-run
# the triangulated transfer demo warm-started from the new checkpoint
# (domain-sized inflow, configs/finetune.yaml), (3) run the conservation
# fine-tune sweep at the accuracy config (VERDICT r1 #6).
#
# Usage: examples/post_accuracy.sh <supervisor_pid> [sweep_epochs]
set -u
SUP=${1:?supervisor pid}
SWEEP_EPOCHS=${2:-8}
cd "$(dirname "$0")/.."

while kill -0 "$SUP" 2>/dev/null; do sleep 20; done
echo "[post] supervisor $SUP gone; accuracy run complete"

if [ -f runs/accuracy2/summary.json ]; then
  cp runs/accuracy2/summary.json results_repo/accuracy_summary.json
  echo "[post] snapshot: results_repo/accuracy_summary.json"
fi

echo "[post] transfer demo (configs/finetune.yaml)"
python -u -m mswe_gnn_tpu.main train --config configs/finetune.yaml \
  --out runs/finetune_tri2 \
  && cp runs/finetune_tri2/summary.json results_repo/finetune_tri_summary.json

echo "[post] conservation fine-tune sweep"
python -u examples/conservation_sweep.py --config configs/accuracy2.yaml \
  --warm-start runs/accuracy2/best --epochs "$SWEEP_EPOCHS" --lr 0.0005 \
  --lambdas 0,0.0233,0.1 \
  --out results_repo/conservation_sweep_full.json
echo "[post] done"
