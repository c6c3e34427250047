#!/usr/bin/env python
"""Training-curve figure for an accuracy run: val CSI@0.05 / CSI@0.3 over
epochs with pushforward-curriculum stage boundaries (the reference's wandb
val_CSI_005 dashboard, reference training/train.py:178-180).

Usage: python examples/accuracy_curve.py [--run runs/accuracy2]
                                         [--out results_repo/accuracy2_curve.png]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/accuracy2")
    ap.add_argument("--out", default="results_repo/accuracy2_curve.png")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rows = []
    with open(os.path.join(args.run, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if "epoch" in r and "val_CSI_005" in r:
                rows.append(r)
    # resumed runs re-log epochs: keep the last record per epoch
    by_epoch = {int(r["epoch"]): r for r in rows}
    ep = np.asarray(sorted(by_epoch))
    c005 = np.asarray([by_epoch[e]["val_CSI_005"] for e in ep])
    c03 = np.asarray([by_epoch[e]["val_CSI_03"] for e in ep])
    stages = np.asarray([by_epoch[e].get("rollout_steps", 0) for e in ep])

    SURF, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
    BLUE, ORANGE = "#2a78d6", "#eb6834"
    fig, ax = plt.subplots(figsize=(7.2, 4.2), facecolor=SURF)
    ax.set_facecolor(SURF)
    ax.plot(ep, c005, color=BLUE, lw=1.6, label="val CSI @ 0.05 m")
    ax.plot(ep, c03, color=ORANGE, lw=1.6, label="val CSI @ 0.3 m")
    # curriculum boundaries (rollout_steps increments)
    for i in np.flatnonzero(np.diff(stages) > 0):
        ax.axvline(ep[i + 1], color="#d2d1cd", lw=1, ls=":")
    best = int(ep[np.argmax(c005)])
    ax.annotate(f"best {c005.max():.3f} @ {best}",
                (best, c005.max()), xytext=(6, 6),
                textcoords="offset points", fontsize=8, color=INK)
    ax.plot([best], [c005.max()], "o", ms=6, color=BLUE)
    ax.set_xlabel("epoch (gridlines: pushforward-curriculum stage changes)",
                  color=INK)
    ax.set_ylabel("validation CSI", color=INK)
    ax.set_title(os.path.basename(args.run.rstrip("/"))
                 + " — curriculum training curve", fontsize=10, color=INK)
    ax.set_ylim(0, 1)
    ax.spines[["top", "right"]].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK2)
    ax.tick_params(colors=INK2)
    ax.grid(axis="y", color="#e8e7e3", lw=0.7)
    ax.set_axisbelow(True)
    ax.legend(frameon=False, fontsize=8, loc="lower right")
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out} (best val CSI@0.05 {c005.max():.4f} at {best})")


if __name__ == "__main__":
    main()
