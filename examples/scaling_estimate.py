#!/usr/bin/env python
"""Multi-chip scaling model from measured single-chip numbers + ring plans.

Pod-slice hardware is not reachable from this environment, but the two
inputs a scaling prediction needs ARE:

1. the exact per-hop halo sizes and ppermute counts of the ring-halo
   partition of the dk15-class mesh (host-built plans,
   parallel/dist_swegnn.py — the same plans the CPU-mesh parity tests
   execute), and
2. the measured single-chip device time of the same rollout
   (BENCH_r03: 190 ms device kernel time / 47 steps).

This script builds the ring plans for P in {2,4,8,16}, counts every halo
exchange a V-cycle step performs (one per hop per processor layer, one per
pool/unpool transfer), and models

    T_P = T_compute/P + sum_exchanges(latency + halo_rows*F*2B / BW_link)
    efficiency(P) = T_1 / (P * T_P)

against the >=75% BASELINE target, with a perfect-overlap variant
(max(compute, comm)) as the upper bound — the overlap machinery exists
(pack_halo_slots, interior/boundary slot split). ICI numbers are the public
v5e figures (one-way ~45 GB/s per link, 2D torus; a 1D ring uses the
next/prev links concurrently). Data-parallel throughput scaling (one
simulation per chip) is comm-free by construction and reported for context.

Run CPU-only (does NOT touch the TPU):
    JAX_PLATFORMS=cpu python examples/scaling_estimate.py
Writes results_repo/scaling_model.json; prose in results_repo/scaling_model.md.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

# ---- measured single-chip facts (BENCH_r03.json, ROADMAP.md r2/r3) --------
DEVICE_SECONDS_PER_ROLLOUT = 0.190   # sum of device kernels, dk15 rollout
ROLLOUT_STEPS = 47
T1_STEP = DEVICE_SECONDS_PER_ROLLOUT / ROLLOUT_STEPS   # 4.04 ms/step
TRAIN_STEP_SECONDS = 0.1845          # 6-step pushforward train step, batch 1
N_PARAMS = 601_444                   # K=5 F=64 MSGNN

# ---- public v5e ICI figures (jax-ml.github.io/scaling-book) ---------------
ICI_ONEWAY_BYTES_PER_S = 4.5e10      # per link, one direction
PPERMUTE_LATENCY_S = 2e-6            # per collective hop (conservative)
BF16_BYTES = 2                       # hop-path compute dtype


def build_plans(n_parts, widths=(1, 2, 3)):
    from bench import build_bench_problem
    from mswe_gnn_tpu.parallel.dist_swegnn import (
        build_dist_msgnn_inputs, reorder_graph_for_ring,
    )

    cfg, params, apply_fn, sample, mesh = build_bench_problem()
    g, _ = reorder_graph_for_ring(sample)
    out = {}
    for p in n_parts:
        for w in widths:
            dist = build_dist_msgnn_inputs(g, p, halo_width=w)
            out[(p, w)] = (dist, cfg, g)
    return out


def exchanges_per_step(dist, cfg, spec, width=1):
    """Every halo exchange one V-cycle step performs: (halo_rows, feat) per
    exchange. Width-W processor plans (round 5, build_wide_halo_plan) do one
    exchange per W hops, shipping the W-deep halo; the per-layer flux
    projection exchange (2F features: src+dst projections ride together) is
    now counted too — the round-4 model omitted it. Pool/unpool transfers
    ship once per crossing."""
    L = spec.num_scales
    ks = list(cfg.k_schedule)
    F = cfg.hid_features
    wm = dist.get("wide_meta")
    ex = []

    def halo(plan):
        return int(plan["send_next"].shape[1])

    def proc_ex(i, k):
        h = halo(dist["proc"][i])
        w = wm[i][0] if wm is not None else 1
        n_hop = -(-k // w)                       # ceil(K / W)
        return [(h, F)] * n_hop + [(h, 2 * F)]   # hops + flux projection

    for i in range(L - 1):                      # downsweep + pool
        ex += proc_ex(i, ks[i])
        ex += [(halo(dist["pool"][i]), F)]
    for i in range(L):                          # upsweep
        s = L - 1 - i
        ex += proc_ex(s, ks[L - 1 + i])
    for lvl in range(L - 1):                    # un-pool intra layers (K=1)
        ex += [(halo(dist["unpool"][lvl]), F)]
    return ex


def model_point(p, dist, cfg, g, width=1, latency=PPERMUTE_LATENCY_S):
    ex = exchanges_per_step(dist, cfg, g.spec, width=width)
    n_proj = 2 * g.spec.num_scales - 1           # flux-projection exchanges
    comm = sum(latency + h * f * BF16_BYTES / ICI_ONEWAY_BYTES_PER_S
               for h, f in ex)
    compute = T1_STEP / p
    # width > 1 re-computes rings 1..W-1 locally: add the redundant halo-row
    # work — per W-hop window, the rows of rings < W (both sides,
    # ring_ptr[W-1] per side) are updated on W-1 of the W hops,
    # conservatively priced at the same per-row cost as local rows and
    # weighted by the scale's node share of the step
    if width > 1:
        wm = dist.get("wide_meta") or ()
        extra = 0.0
        for i, m in enumerate(wm):
            if m[0] > 1:
                upd_rows = 2 * m[1][m[0] - 1]          # rings < W, both sides
                frac_hops = (m[0] - 1) / m[0]
                extra += (upd_rows * frac_hops
                          / max(g.spec.node_counts[i] // p, 1)
                          * (g.spec.node_counts[i] / sum(g.spec.node_counts)))
        compute = compute * (1.0 + extra)
    t_serial = compute + comm
    t_overlap = max(compute, comm) + latency * len(ex)
    bytes_step = sum(2 * h * f * BF16_BYTES for h, f in ex)  # both directions
    return {
        "n_chips": p,
        "halo_width": width,
        "latency_us": round(latency * 1e6, 1),
        "exchanges_per_step": len(ex),
        "hop_and_transfer_exchanges": len(ex) - n_proj,
        "halo_rows_max": max(h for h, _ in ex),
        "halo_bytes_per_step": int(bytes_step),
        "comm_ms_per_step": round(comm * 1e3, 4),
        "compute_ms_per_step": round(compute * 1e3, 4),
        "step_ms_serial": round(t_serial * 1e3, 4),
        "step_ms_overlapped": round(t_overlap * 1e3, 4),
        "efficiency_serial": round(T1_STEP / (p * t_serial), 4),
        "efficiency_overlapped": round(T1_STEP / (p * t_overlap), 4),
        "rollout_s_serial": round(t_serial * ROLLOUT_STEPS, 4),
    }


def dp_gradient_sync_model(p):
    """Training data-parallel: ring all-reduce of bf16 grads per step."""
    grad_bytes = N_PARAMS * BF16_BYTES
    # ring all-reduce: 2*(P-1)/P of the buffer crosses each link
    t = 2 * (p - 1) / p * grad_bytes / ICI_ONEWAY_BYTES_PER_S \
        + 2 * (p - 1) * PPERMUTE_LATENCY_S
    eff = TRAIN_STEP_SECONDS / (TRAIN_STEP_SECONDS + t)
    return {"n_chips": p, "allreduce_ms": round(t * 1e3, 4),
            "efficiency": round(eff, 4)}


def main():
    parts = [2, 4, 8, 16]
    widths = (1, 2, 3)
    latencies = (PPERMUTE_LATENCY_S, 10e-6)   # assumed + pessimistic
    plans = build_plans(parts, widths)
    rows, sens, dp_rows = [], [], []
    for p in parts:
        for w in widths:
            dist, cfg, g = plans[(p, w)]
            if dist is None:
                rows.append({"n_chips": p, "halo_width": w,
                             "ring_feasible": False})
                continue
            for lat in latencies:
                r = model_point(p, dist, cfg, g, width=w, latency=lat)
                r["ring_feasible"] = True
                (rows if lat == PPERMUTE_LATENCY_S else sens).append(r)
                print(json.dumps(r))
        dp_rows.append(dp_gradient_sync_model(p))
    out = {
        "inputs": {
            "device_seconds_per_rollout_1chip": DEVICE_SECONDS_PER_ROLLOUT,
            "rollout_steps": ROLLOUT_STEPS,
            "ici_oneway_bytes_per_s": ICI_ONEWAY_BYTES_PER_S,
            "ppermute_latency_s": PPERMUTE_LATENCY_S,
            "train_step_seconds_1chip": TRAIN_STEP_SECONDS,
            "n_params": N_PARAMS,
            "source": "BENCH_r03.json device timings + public v5e ICI rates",
        },
        "ring_halo_inference": rows,
        "latency_sensitivity_10us": sens,
        "data_parallel_training": dp_rows,
        "baseline_target_efficiency": 0.75,
    }
    os.makedirs("results_repo", exist_ok=True)
    with open("results_repo/scaling_model.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote results_repo/scaling_model.json")
    render(out)


def render(out):
    """Efficiency-vs-chips figure (results_repo/scaling_model.png)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    feas = [r for r in out["ring_halo_inference"] if r.get("ring_feasible")]
    rows = [r for r in feas if r.get("halo_width", 1) == 1]
    rows_w = [r for r in feas if r.get("halo_width", 1) == 2]
    if len(rows) < 2:
        return
    P = [r["n_chips"] for r in rows]
    es = [100 * r["efficiency_serial"] for r in rows]
    eo = [100 * r["efficiency_overlapped"] for r in rows]
    SURF, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
    BLUE, ORANGE = "#2a78d6", "#eb6834"
    GREEN = "#2e8b57"
    fig, ax = plt.subplots(figsize=(6.2, 4.2), facecolor=SURF)
    ax.set_facecolor(SURF)
    ax.plot(P, eo, "-o", color=BLUE, lw=2, ms=5,
            label="overlapped (upper bound)")
    ax.plot(P, es, "-o", color=ORANGE, lw=2, ms=5,
            label="serial (lower bound)")
    if len(rows_w) == len(P):
        ax.plot(P, [100 * r["efficiency_serial"] for r in rows_w], "-s",
                color=GREEN, lw=2, ms=5, label="serial, width-2 halos")
    ax.axhline(75, color=INK2, lw=1, ls="--")
    ax.text(P[-1], 75.7, "BASELINE target 75%", ha="right", fontsize=8,
            color=INK2)
    for y, c in ((eo[-1], BLUE), (es[-1], ORANGE)):
        ax.annotate(f"{y:.0f}%", (P[-1], y), xytext=(6, 0),
                    textcoords="offset points", fontsize=8, color=INK)
    ax.set_xscale("log", base=2)
    ax.set_xticks(P)
    ax.set_xticklabels(P)
    ax.set_xlabel("chips (1D ring over v5e ICI)", color=INK)
    ax.set_ylabel("predicted scaling efficiency [%]", color=INK)
    ax.set_title("Ring-halo MSGNN rollout: predicted multi-chip efficiency\n"
                 "(exact halo plans + measured single-chip compute)",
                 fontsize=10, color=INK)
    ax.set_ylim(50, 102)
    ax.spines[["top", "right"]].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK2)
    ax.tick_params(colors=INK2)
    ax.grid(axis="y", color="#e8e7e3", lw=0.7)
    ax.set_axisbelow(True)
    ax.legend(frameon=False, fontsize=8, loc="lower left")
    fig.tight_layout()
    fig.savefig("results_repo/scaling_model.png", dpi=130)
    print("wrote results_repo/scaling_model.png")


if __name__ == "__main__":
    main()
