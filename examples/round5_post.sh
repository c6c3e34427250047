#!/usr/bin/env bash
# Round-5 study chain: runs after the triangulated accuracy supervisor
# exits, serializing all remaining TPU work in VERDICT-priority order.
# Every step appends/writes incrementally so a wall-clock cutoff keeps the
# finished parts.
#
# Usage: examples/round5_post.sh <tri_supervisor_pid>
set -u
SUP=${1:?supervisor pid}
cd "$(dirname "$0")/.."

while kill -0 "$SUP" 2>/dev/null; do sleep 30; done
echo "[post5] tri supervisor $SUP gone"

# 1. snapshot the triangulated headline (VERDICT r4 missing #3)
if [ -f runs/accuracy_tri/summary.json ]; then
  cp runs/accuracy_tri/summary.json results_repo/accuracy_tri_summary.json
  echo "[post5] snapshot: results_repo/accuracy_tri_summary.json"
  python -u examples/test_report.py --config configs/accuracy_tri.yaml \
    --ckpt runs/accuracy_tri/best \
    --out results_repo/accuracy_tri_test_detail.json \
    || echo "[post5] test_report failed"
fi

# 1b. smoke the round-5 bench additions on the real chip (roofline mix +
#     batch_opt sections) long before the driver's end-of-round capture
BENCH_TRAIN=0 BENCH_SCALING_MAX=4 timeout 2400 python -u bench.py \
  > /tmp/bench_smoke_r5.log 2>&1 \
  && echo "[post5] bench smoke ok" || echo "[post5] BENCH SMOKE FAILED"

# 2. single-scale SWE-GNN study (VERDICT r4 missing #1)
python -u examples/pareto_sweep.py --config configs/pareto_gnn.yaml \
  --grid K5F64,K10F64,K15F64,K18F64 --out results_repo/pareto_gnn.csv \
  --deadline 1787346300 \
  || echo "[post5] gnn study failed"

# 3. combined front figure + k-hops diagnostic (CPU)
JAX_PLATFORMS=cpu python -u examples/combined_front.py \
  || echo "[post5] combined front failed"

# 4. complete the 12-config MSGNN Pareto grid (VERDICT r4 missing #2),
#    largest-first so a cutoff records the capacity-deciding configs
python -u examples/pareto_sweep.py --config configs/pareto.yaml \
  --grid K4F64,K4F32,K2F32,K4F16,K2F16 --out results_repo/pareto.csv \
  --deadline 1787346300 \
  || echo "[post5] pareto completion failed"

# 5. conservation-sweep confirmation arms (VERDICT r4 #7): >=30-epoch
#    fine-tunes around the r4 optimum from the committed r4 checkpoint;
#    fresh run dirs (stale autosaves would hijack the warm start - r4 note)
rm -rf runs/cons_sweep_0.0536 runs/cons_sweep_0.0233
python -u examples/conservation_sweep.py --config configs/accuracy2.yaml \
  --warm-start results_repo/checkpoints/accuracy2_r4/autosave/best_val \
  --epochs 30 --lr 0.0005 --lambdas 0.0536,0.0233 --deadline 1787344500 \
  --out results_repo/conservation_sweep_full.json \
  || echo "[post5] conservation arms failed"

# deadlines: no new chip job after 21:05 UTC (conservation arms 20:35)
# so the driver's end-of-round bench runs on a quiet chip
echo "[post5] done"
