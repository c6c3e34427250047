"""Mass-conservation regularizer sweep — the reference's
``results/mass_conservation.csv`` study (best CSI@0.05 at lambda~0.023 vs
lambda=0; reference SURVEY.md §6) reproduced on the synthetic dataset.

Trains the same MSGNN with conservation weight lambda in a small grid and
records test CSI / RMSE / conservation error per lambda into
``results_repo/conservation_sweep.json``.

Run:  python examples/conservation_sweep.py [--epochs 60] [--lambdas 0,0.0233,0.1]

Full-strength mode (VERDICT r1 #6): run at the accuracy config, warm-started
from the converged accuracy checkpoint so each lambda needs only a short
fine-tune instead of a full training run:

  python examples/conservation_sweep.py --config configs/accuracy2.yaml \\
      --warm-start runs/accuracy2/best --epochs 40 --lr 0.0005 \\
      --out results_repo/conservation_sweep_full.json
"""
import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mswe_gnn_tpu.config import read_config
from mswe_gnn_tpu.main import _setup_cache, run_training


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/demo_small.yaml")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--lambdas", default="0,0.0233,0.1",
                    help="comma-separated conservation weights")
    ap.add_argument("--out", default="results_repo/conservation_sweep.json")
    ap.add_argument("--warm-start", default=None,
                    help="checkpoint dir to fine-tune from (accuracy run)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override learning rate (lower for fine-tunes)")
    ap.add_argument("--deadline", type=float, default=None,
                    help="unix time after which no NEW arm is started")
    args = ap.parse_args(argv)

    _setup_cache()
    base = read_config(args.config)
    base["trainer_options"]["max_epochs"] = args.epochs
    if args.warm_start:
        base["saved_model"] = args.warm_start
        # fine-tuning a converged model: full pushforward depth from epoch 0
        # (one compile) instead of re-running the from-scratch curriculum
        base["trainer_options"]["curriculum_epoch"] = 0
    if args.lr is not None:
        base["lr_info"]["learning_rate"] = args.lr
    lambdas = [float(x) for x in args.lambdas.split(",")]

    # Arm fingerprint: skipping an existing arm is only valid when it was
    # trained under the SAME configuration — keying on lambda alone silently
    # mixed arms across --lr/--epochs changes into one study (ADVICE r4).
    arm_cfg = {"config": args.config, "epochs": args.epochs,
               "warm_start": args.warm_start, "lr": args.lr}

    # merge with prior arms: rerunning the sweep with new lambdas extends
    # the study (the reference's mass_conservation.csv sweeps ~10 values)
    rows = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f)
    done = set()
    for r in rows:
        if r.get("arm_config", arm_cfg) == arm_cfg:
            done.add(r["conservation_lambda"])
        else:
            print(f"WARNING: existing arm lambda={r['conservation_lambda']} "
                  f"was trained under a different configuration "
                  f"({r.get('arm_config')}); re-running it under the current "
                  f"one appends a second row — label rows by arm_config when "
                  f"reading the study.", flush=True)
    lambdas = [l for l in lambdas if l not in done]
    if done:
        print(f"existing arms: {sorted(done)}; running {lambdas}", flush=True)
    import time as _time

    for lam in lambdas:
        if args.deadline and _time.time() > args.deadline:
            print(f"deadline passed; not starting lambda={lam}", flush=True)
            break
        cfg = copy.deepcopy(base)
        cfg["trainer_options"]["conservation"] = lam
        out_dir = f"runs/cons_sweep_{lam:g}"
        summary = run_training(cfg, out_dir)
        rows.append({"conservation_lambda": lam,
                     "arm_config": arm_cfg,
                     "test_CSI_005": summary["test_CSI_005"],
                     "test_CSI_03": summary["test_CSI_03"],
                     "test_RMSE_WD": summary["test_RMSE_WD"],
                     "test_mass_conservation_abs":
                         summary["test_mass_conservation_abs"]})
        print(json.dumps(rows[-1]), flush=True)
        # write incrementally: a killed sweep keeps its completed rows
        rows.sort(key=lambda r: r["conservation_lambda"])
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
    best = max(rows, key=lambda r: r["test_CSI_005"])
    print(f"best lambda={best['conservation_lambda']} "
          f"CSI@0.05={best['test_CSI_005']:.4f}")


if __name__ == "__main__":
    main()
