"""Combined single-scale-vs-multiscale Pareto front + receptive-field
diagnostic — the reference's central comparison (reference
results/Pareto_front/overview_GNN.csv vs overview_MSGNN.csv: single-scale
SWE-GNN needs K~10-18 hops for CSI 0.68 where multiscale reaches 0.84+ at
K=2-5; reference utils/miscellaneous.py:266-309 for the K-hops bound).

Reads results_repo/pareto.csv (MSGNN grid) + results_repo/pareto_gnn.csv
(GNN K sweep), renders results_repo/pareto_combined.png and computes the
get_sufficient_k_hops diagnostic on the study corpus (written to
results_repo/gnn_khops_diagnostic.json).

Run (CPU is fine for the figure; the diagnostic builds the corpus):
    JAX_PLATFORMS=cpu python examples/combined_front.py
"""
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def khops_diagnostic(config_path="configs/pareto_gnn.yaml", n_probe=8):
    """Receptive-field sufficiency of the study corpus: min K so one-hop
    growth of the wet front is covered (reference miscellaneous.py:266-309).
    Probes the first ``n_probe`` simulations at the corpus temporal_res."""
    from mswe_gnn_tpu.config import read_config
    from mswe_gnn_tpu.main import _generate_cached
    from mswe_gnn_tpu.utils.metrics import get_sufficient_k_hops

    cfg = read_config(config_path)
    recs = _generate_cached(cfg["synthetic_data"],
                            cfg["dataset_parameters"]["temporal_res"])
    ks = []
    for r in recs[:n_probe]:
        m = r.mesh.meshes[0]
        wd = np.asarray(r.wd)[:m.num_faces]
        # start at the first wet column: the t0 (all-dry) -> t1 transition is
        # water GENESIS at the inlet, which no K-hop propagation can cover
        # (the reference's corpora absorb those few cells inside the 0.1%
        # tolerance; this corpus is smaller, so they would saturate the
        # diagnostic at its cap)
        wet_cols = np.where((wd > 0).any(axis=0))[0]
        if len(wet_cols) == 0:
            continue
        ks.append(get_sufficient_k_hops(np.asarray(m.dual_edge_index),
                                        wd[:, wet_cols[0]:]))
    return {"per_sim_k": ks, "max": int(max(ks)), "mean": float(np.mean(ks)),
            "note": ("min hops covering 99.9%% of one-step wet-front growth "
                     "at temporal_res=%s min; single-scale GNN receptive "
                     "field must reach n_layers*K >= this"
                     % cfg["dataset_parameters"]["temporal_res"])}


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    for path in ("results_repo/pareto.csv", "results_repo/pareto_gnn.csv"):
        if os.path.exists(path):
            rows += list(csv.DictReader(open(path)))
    if not rows:
        print("no study CSVs found")
        return 1

    diag_path = "results_repo/gnn_khops_diagnostic.json"
    if os.path.exists(diag_path):
        diag = json.load(open(diag_path))
    else:
        diag = khops_diagnostic()
        with open(diag_path, "w") as f:
            json.dump(diag, f, indent=2)
    print("k-hops diagnostic:", {k: diag[k] for k in ("max", "mean")})

    SURF, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
    BLUE, ORANGE = "#2a78d6", "#eb6834"
    fig, ax = plt.subplots(figsize=(6.6, 4.4), facecolor=SURF)
    ax.set_facecolor(SURF)
    for model, color, marker in (("MSGNN", BLUE, "o"), ("GNN", ORANGE, "s")):
        sel = [r for r in rows if r["model"] == model
               and r.get("mean_prediction_time_s")]
        if not sel:
            continue
        t = np.asarray([float(r["mean_prediction_time_s"]) for r in sel])
        c = np.asarray([float(r["test_CSI_005"]) for r in sel])
        p = np.asarray([float(r["n_params"]) for r in sel])
        ax.scatter(t, c, s=25 + 100 * p / p.max(), color=color, marker=marker,
                   label=("multiscale MSGNN" if model == "MSGNN"
                          else "single-scale SWE-GNN"), alpha=0.85, zorder=3)
        for r, ti, ci in zip(sel, t, c):
            ax.annotate(f"K{r['K']}F{r['hid_features']}", (ti, ci),
                        fontsize=7, color=INK2, xytext=(3, 3),
                        textcoords="offset points")
    ax.set_xlabel("mean prediction time per simulation [s]", color=INK)
    ax.set_ylabel("test CSI @ 0.05 m", color=INK)
    ax.set_title("Single-scale vs multiscale Pareto front (shared corpus)\n"
                 f"wet-front K-hops bound: mean {diag['mean']:.1f}, "
                 f"max {diag['max']} (single-scale receptive field = "
                 "n_layers x K)", fontsize=10, color=INK)
    ax.legend(frameon=False)
    fig.tight_layout()
    out = "results_repo/pareto_combined.png"
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
