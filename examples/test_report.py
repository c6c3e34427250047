"""Per-simulation test-set report for a trained checkpoint.

Decomposes the headline test CSI (macro: nanmean over per-sim, per-step
curves — the reference's aggregation, reference main.py:158-166 +
utils/miscellaneous.py:153-160) vs the micro aggregation the Trainer's
validation uses on concat batches (confusion pooled over the graph union,
training/train.py eval_step) — the two differ systematically when flood
extents vary across simulations, which is exactly the val/test gap VERDICT
round 2 flagged (val CSI 0.82 vs test 0.615 on runs/accuracy2).

Usage:
  python examples/test_report.py --config configs/accuracy2.yaml \
      --ckpt runs/accuracy2/best --out results_repo/accuracy2_test_detail.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--limit", type=int, default=None,
                    help="evaluate only the first N test sims")
    ap.add_argument("--split", choices=["test", "val"], default="test",
                    help="evaluate the test or the validation split (val: "
                    "isolates data-split vs evaluation-path differences "
                    "behind a val/test metric gap)")
    args = ap.parse_args()

    import jax

    from mswe_gnn_tpu import config as config_lib
    from mswe_gnn_tpu.main import (build_experiment_model, prepare_data)
    from mswe_gnn_tpu.training.checkpoint import restore_params_only
    from mswe_gnn_tpu.training.rollout import rollout
    from mswe_gnn_tpu.utils.metrics import get_csi, get_rollout_loss

    cfg = config_lib.with_defaults(config_lib.read_config(args.config))
    _, val, test, scalers, test_records = prepare_data(cfg)
    if args.split == "val":
        test = val
    if args.limit:
        test = test[:args.limit]
    model_cfg, params, apply_fn = build_experiment_model(cfg, test[0])
    params = restore_params_only(args.ckpt, params)

    steps = int(test[0].y.shape[-1])
    roll = jax.jit(lambda p, g: rollout(apply_fn, p, model_cfg, g, steps=steps))

    per_sim = []
    curves005 = []
    for i, g in enumerate(test):
        pred = np.asarray(roll(params, g))
        fs = g.spec.node_slice(0)
        p, r, m = pred[fs], np.asarray(g.y)[fs], np.asarray(g.node_mask)[fs]
        c005 = np.asarray(get_csi(p, r, m, water_threshold=0.05))
        c03 = np.asarray(get_csi(p, r, m, water_threshold=0.3))
        mae = np.asarray(get_rollout_loss(p, r, m, type_loss="MAE",
                                          only_where_water=True))
        wet_frac = float(((r[:, 0] > 0.05) * m[:, None]).mean())
        peak_h = float((r[:, 0] * m[:, None]).max())
        peak_pred_h = float((p[:, 0] * m[:, None]).max())
        row = {"sim": i, "csi005": float(np.nanmean(c005)),
               "csi03": float(np.nanmean(c03)),
               "mae_wd": float(mae[0]), "mae_q": float(mae[1]),
               "wet_frac": wet_frac, "peak_h": peak_h,
               "peak_pred_h": peak_pred_h}
        per_sim.append(row)
        curves005.append(c005)
        print(json.dumps(row), flush=True)

    # micro aggregation across sims: pooled confusion per step, like the
    # Trainer's union-batch validation
    def micro(threshold):
        tps = fps = fns = 0.0
        for g, row in zip(test, per_sim):
            fs = g.spec.node_slice(0)
            r = np.asarray(g.y)[fs]
            m = np.asarray(g.node_mask)[fs].astype(bool)
            pred = curves_cache[row["sim"]]
            pb = (pred[:, 0] > threshold) & m[:, None]
            rb = (r[:, 0] > threshold) & m[:, None]
            tps += (pb & rb).sum(0)
            fps += (pb & ~rb).sum(0)
            fns += (~pb & rb).sum(0)
        denom = tps + fps + fns
        c = np.where(denom > 0, tps / np.maximum(denom, 1), np.nan)
        return float(np.nanmean(c))

    # cache predictions for micro pass (re-rollout would double the cost):
    # re-run cheaply since rollouts are jitted/compiled already
    curves_cache = {}
    for i, g in enumerate(test):
        curves_cache[i] = np.asarray(roll(params, g))[g.spec.node_slice(0)]

    macro005 = float(np.nanmean([r["csi005"] for r in per_sim]))
    out = {
        "macro_csi005": macro005,
        "macro_csi03": float(np.nanmean([r["csi03"] for r in per_sim])),
        "micro_csi005": micro(0.05),
        "micro_csi03": micro(0.3),
        "per_sim": per_sim,
        "worst5": sorted(per_sim, key=lambda r: r["csi005"])[:5],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_sim"
                      and k != "worst5"}, indent=2))


if __name__ == "__main__":
    main()
