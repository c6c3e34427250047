#!/usr/bin/env python
"""Kernel-level profile of the dk15 rollout: where do the device milliseconds
go, and specifically how large are the XLA-inserted copies (VERDICT r3
weak #4 — ~21 ms/rollout of `copy`/`fusion` between scan steps is the gap
from 79.5% to >85% of the gather roofline)?

Traces ONE jitted rollout with jax.profiler, parses the Chrome-format
``*.trace.json.gz`` next to the xplane pb (no tensorboard needed — verify
skill, round-2 recipe), groups ``ph=="X"`` device events by op-name family,
and prints a sorted table plus the copy-time total.

Run on a QUIET chip (never alongside training/bench):
    python examples/profile_rollout.py [--outdir /tmp/rollout_trace]
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def family(name: str) -> str:
    """Collapse an op name to a readable family: fusion kinds, copies,
    gathers, dots, convolutions, dynamic-slice/update."""
    n = name.lower()
    for key in ("copy", "gather", "scatter", "dynamic-update-slice",
                "dynamic-slice", "dot", "conv", "reduce", "transpose",
                "broadcast", "select", "bitcast", "all-reduce", "ppermute"):
        if key in n:
            return key
    if "fusion" in n:
        return "fusion(other)"
    return re.sub(r"[.\d]+$", "", n)[:40] or n[:40]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/rollout_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--batch", type=int, default=1,
                    help="concat batch size to profile (default 1)")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from bench import _setup_cache, build_bench_problem
    from mswe_gnn_tpu.training.rollout import rollout

    _setup_cache()
    cfg, params, apply_fn, sample, mesh = build_bench_problem()
    T = int(sample.y.shape[-1])
    if args.batch > 1:
        from mswe_gnn_tpu.graph import concat_graphs

        sample = concat_graphs([sample] * args.batch)
        print(f"profiling concat batch {args.batch}", flush=True)
    roll = jax.jit(lambda p, g: rollout(apply_fn, p, cfg, g, steps=T))
    t0 = time.time()
    float(np.asarray(roll(params, sample)).sum())      # compile + warm
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    for _ in range(2):                                  # steady state
        float(np.asarray(roll(params, sample)).sum())

    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir)
    t0 = time.time()
    float(np.asarray(roll(params, sample)).sum())
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"traced rollout wall: {wall:.3f}s", flush=True)

    traces = sorted(glob.glob(os.path.join(
        args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print("no trace.json.gz produced (backend cannot trace?)")
        return 1
    with gzip.open(traces[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])

    # device lanes only: pid names containing TPU/device; fall back to all
    # X events if the metadata is absent
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e.get("pid")] = e.get("args", {}).get("name", "")
    def on_device(e):
        n = pid_name.get(e.get("pid"), "")
        return ("TPU" in n or "/device" in n.lower()) if pid_name else True

    fam_us = defaultdict(float)
    fam_ct = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or not on_device(e):
            continue
        dur = float(e.get("dur", 0.0))
        f = family(e.get("name", "?"))
        fam_us[f] += dur
        fam_ct[f] += 1
        total += dur
    rows = sorted(fam_us.items(), key=lambda kv: -kv[1])
    print(f"\ndevice total: {total/1e3:.1f} ms over {sum(fam_ct.values())} events")
    print(f"{'family':<28}{'ms':>9}{'count':>8}{'%':>7}")
    for fname, us in rows[:args.top]:
        print(f"{fname:<28}{us/1e3:>9.2f}{fam_ct[fname]:>8}"
              f"{100*us/max(total,1e-9):>7.1f}")
    copy_ms = sum(us for fname, us in fam_us.items() if "copy" in fname) / 1e3
    print(f"\ncopy-family total: {copy_ms:.2f} ms "
          f"({100*copy_ms*1e3/max(total,1e-9):.1f}% of device time)")
    out = {"device_total_ms": round(total / 1e3, 2),
           "copy_ms": round(copy_ms, 2),
           "wall_s": round(wall, 4),
           "families": {k: {"ms": round(v / 1e3, 3), "count": fam_ct[k]}
                        for k, v in rows[:args.top]}}
    with open(os.path.join(args.outdir, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"summary -> {os.path.join(args.outdir, 'summary.json')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
