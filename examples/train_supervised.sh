#!/usr/bin/env bash
# Supervised long training: bounded-lifetime processes + restart-from-autosave
# + a stall watchdog.
#
# Why: (a) the axon PJRT client leaks host memory on every host<->device
# transfer (~1.1 GB/epoch on configs/accuracy.yaml before the device-resident
# data path; a single process OOM'd a 125 GB host around epoch 108);
# (b) a client's dispatch can wedge indefinitely when the shared TPU tunnel
# is disturbed (observed: a concurrently-launched-and-killed bench froze the
# training child mid-epoch while fresh clients worked fine).
#
# Each child trains --epoch-budget epochs, autosaves (params + opt state +
# best-val params), and exits 75; we relaunch until training completes
# (exit 0 = final evaluation done) or a real error. The watchdog SIGKILLs
# the exact child PID when the metrics file stops advancing.
#
# Usage: examples/train_supervised.sh <config.yaml> <out_dir> [epoch_budget]
#        WATCHDOG_SECS=900 (default) stall threshold
set -u
CONFIG=${1:?config}
OUT=${2:?out dir}
BUDGET=${3:-50}
WATCHDOG_SECS=${WATCHDOG_SECS:-900}
cd "$(dirname "$0")/.."
while true; do
  python -u -m mswe_gnn_tpu.main train --config "$CONFIG" --out "$OUT" \
    --epoch-budget "$BUDGET" &
  child=$!
  started=$(date +%s)
  code=""
  while kill -0 "$child" 2>/dev/null; do
    sleep 30
    # Prefer the per-batch heartbeat (touched every <=10s by the Trainer)
    # over the per-epoch metrics file: a config whose epochs exceed
    # WATCHDOG_SECS would otherwise be killed mid-epoch repeatedly.
    metrics="$OUT/autosave/heartbeat"
    [ -f "$metrics" ] || metrics="$OUT/metrics.jsonl"
    if [ -f "$metrics" ]; then
      now=$(date +%s)
      age=$(( now - $(stat -c %Y "$metrics") ))
      # Give every child a 30-min grace on top of the threshold before its
      # first kill: first-compile through a busy tunnel can take that long.
      if [ "$age" -gt "$WATCHDOG_SECS" ] \
          && [ $(( now - started )) -gt $(( WATCHDOG_SECS + 1800 )) ]; then
        echo "[supervisor] watchdog: no progress for ${age}s; killing $child"
        kill -9 "$child" 2>/dev/null
        wait "$child" 2>/dev/null
        code=137
        break
      fi
    fi
  done
  if [ -z "$code" ]; then
    wait "$child"
    code=$?
  fi
  if [ "$code" -eq 75 ]; then
    echo "[supervisor] relaunching (budget reached)"
    continue
  fi
  # OOM kill (137), stall kill, crash, or an in-process runtime error such
  # as a device RESOURCE_EXHAUSTED (exit 1): resume from the autosave —
  # but give up after 3 consecutive resumes with no autosave progress
  # (a deterministic crash would otherwise loop forever).
  if [ "$code" -eq 137 ] || [ "$code" -eq 134 ] || [ "$code" -eq 139 ] \
      || [ "$code" -eq 1 ]; then
    meta="$OUT/autosave/meta.json"
    mark=$( [ -f "$meta" ] && stat -c %Y "$meta" || echo 0 )
    if [ "$mark" != "${last_mark:-}" ]; then
      fail_count=0
      last_mark=$mark
    fi
    fail_count=$(( ${fail_count:-0} + 1 ))
    if [ "$fail_count" -gt 3 ]; then
      echo "[supervisor] child failed $fail_count times without autosave progress; giving up with $code"
      exit "$code"
    fi
    echo "[supervisor] child died with $code; resuming from autosave (attempt $fail_count)"
    continue
  fi
  echo "[supervisor] done with exit $code"
  exit "$code"
done
