"""Spatial / temporal evaluation harness over test rollouts.

Equivalent of the reference ``SpatialAnalysis``
(reference utils/miscellaneous.py:311-562): aggregates per-simulation rollout
errors, CSI/F1 curves in time, mass-conservation residuals, best/worst
ranking, prediction-time statistics and speed-up vs a numerical solver,
plus matplotlib report figures. Multiscale rollouts are restricted to the
finest scale (reference utils/miscellaneous.py:322-327).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from mswe_gnn_tpu.graph import FloodGraph
from mswe_gnn_tpu.training.loss import conservation_residual
from mswe_gnn_tpu.utils.metrics import get_csi, get_f1, get_rollout_loss, get_speed_up


def get_pareto_front(points: np.ndarray, ascending: bool = False) -> np.ndarray:
    """Pareto front of a 2-objective array [n, 2]
    (reference utils/miscellaneous.py:245-264)."""
    order = np.lexsort((points[:, 1], points[:, 0]))
    if not ascending:
        order = order[::-1]
    sorted_pts = points[order]
    front = [sorted_pts[0]]
    for p in sorted_pts[1:]:
        if p[1] >= front[-1][1]:
            front.append(p)
    return np.asarray(front)


class SpatialAnalysis:
    def __init__(self, predicted_rollouts: Sequence[np.ndarray],
                 test_graphs: Sequence[FloodGraph],
                 prediction_times: Optional[Sequence[float]] = None,
                 numerical_times: Optional[Sequence[float]] = None,
                 thresholds: Sequence[float] = (0.05, 0.3),
                 solver_label: str = "solver"):
        assert len(predicted_rollouts) == len(test_graphs)
        self.graphs = list(test_graphs)
        self.thresholds = tuple(thresholds)
        self.prediction_times = (list(prediction_times)
                                 if prediction_times is not None else None)
        self.numerical_times = (list(numerical_times)
                                if numerical_times is not None else None)
        # which solver produced numerical_times: 'dhydro' (real D-HYDRO wall
        # times, overview.csv — comparable with the reference's 242-1223x,
        # reference utils/miscellaneous.py:70-114) or 'synthetic_solver'
        # (the built-in generator's own seconds — NOT comparable; labeling
        # it keeps the summary from being misread against the reference)
        self.solver_label = solver_label
        # restrict to finest scale
        self.preds, self.reals, self.masks = [], [], []
        for pred, g in zip(predicted_rollouts, test_graphs):
            fs = g.spec.node_slice(0)
            self.preds.append(np.asarray(pred)[fs])
            self.reals.append(np.asarray(g.y)[fs])
            self.masks.append(np.asarray(g.node_mask)[fs])

    # --- scalar metrics -------------------------------------------------
    def rollout_losses(self, type_loss="MAE", only_where_water=True) -> np.ndarray:
        """Per-simulation [n_sims, 2] rollout errors
        (reference utils/miscellaneous.py:418-424)."""
        return np.stack([
            np.asarray(get_rollout_loss(p, r, m, type_loss=type_loss,
                                        only_where_water=only_where_water))
            for p, r, m in zip(self.preds, self.reals, self.masks)])

    def csi_curves(self, threshold: float) -> np.ndarray:
        """[n_sims, T] CSI over time."""
        return np.stack([
            np.asarray(get_csi(p, r, m, water_threshold=threshold))
            for p, r, m in zip(self.preds, self.reals, self.masks)])

    def f1_curves(self, threshold: float) -> np.ndarray:
        return np.stack([
            np.asarray(get_f1(p, r, m, water_threshold=threshold))
            for p, r, m in zip(self.preds, self.reals, self.masks)])

    def mass_conservation_series(self) -> List[np.ndarray]:
        """Per-simulation signed conservation residual per step, 1e6 m^3
        (reference utils/miscellaneous.py:116-121)."""
        import jax.numpy as jnp

        out = []
        for pred, g in zip(self.preds, self.graphs):
            T = pred.shape[-1]
            fs = g.spec.node_slice(0)
            series = []
            for t in range(1, T):
                # the injected value of rollout step t — exact interval
                # inflow for zero-order-hold series (training's
                # bc_step_inflow; left endpoint for instantaneous series)
                bc_now = np.asarray(g.bc_values)[:, g.previous_t + t - 1]
                full_prev = np.zeros((g.num_nodes, 1), np.float32)
                full_next = np.zeros((g.num_nodes, 1), np.float32)
                full_prev[fs] = pred[:, 0:1, t - 1]
                full_next[fs] = pred[:, 0:1, t]
                series.append(float(conservation_residual(
                    jnp.asarray(full_next), jnp.asarray(full_prev), g,
                    jnp.asarray(bc_now))))
            out.append(np.asarray(series))
        return out

    def inflow_volume_series(self, i: int) -> np.ndarray:
        """Per-step inflow volume [1e6 m^3] of simulation ``i`` (for the
        normalized conservation panel; reference get_inflow_volume,
        utils/dataset.py:577-591)."""
        g = self.graphs[i]
        bc = np.asarray(g.bc_values)
        L = np.asarray(g.bc_edge_length) * np.asarray(g.bc_mask)
        T = self.preds[i].shape[-1]
        cols = [g.previous_t + t - 1 for t in range(1, T)]
        return np.asarray([(bc[:, c] * L).sum() * 60.0 * float(g.temporal_res)
                           for c in cols]) / 1e6

    def ranking(self) -> Dict[str, int]:
        """Best/worst simulation by water-depth rollout loss
        (reference main.py:171-181)."""
        losses = self.rollout_losses()[:, 0]
        return {"best": int(np.argmin(losses)), "worst": int(np.argmax(losses))}

    def summary(self) -> Dict[str, float]:
        losses = self.rollout_losses(type_loss="MAE")
        rmse = self.rollout_losses(type_loss="RMSE")
        out = {
            "test_MAE_WD": float(losses[:, 0].mean()),
            "test_MAE_Q": float(losses[:, 1].mean()),
            "test_RMSE_WD": float(rmse[:, 0].mean()),
            "test_RMSE_Q": float(rmse[:, 1].mean()),
        }
        for tau in self.thresholds:
            key = str(tau).replace("0.", "0")
            out[f"test_CSI_{key}"] = float(np.nanmean(self.csi_curves(tau)))
            out[f"test_F1_{key}"] = float(np.nanmean(self.f1_curves(tau)))
        cons = self.mass_conservation_series()
        out["test_mass_conservation_abs"] = float(
            np.mean([np.abs(c).mean() for c in cons]))
        if self.prediction_times:
            out["mean_prediction_time_s"] = float(np.mean(self.prediction_times))
            if self.numerical_times:
                mu, sd = get_speed_up(np.asarray(self.numerical_times),
                                      np.asarray(self.prediction_times))
                out[f"speed_up_vs_{self.solver_label}_mean"] = mu
                out[f"speed_up_vs_{self.solver_label}_std"] = sd
                if self.solver_label == "dhydro":
                    # only real solver timings produce the reference-
                    # comparable headline keys
                    out["speed_up_mean"] = mu
                    out["speed_up_std"] = sd
        return out

    # --- figures --------------------------------------------------------
    def save_reports(self, out_dir: str) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(out_dir, exist_ok=True)
        fig, axes = plt.subplots(1, len(self.thresholds), figsize=(11, 4))
        axes = np.atleast_1d(axes)
        for ax, tau in zip(axes, self.thresholds):
            curves = self.csi_curves(tau)
            t = np.arange(curves.shape[1])
            mean = np.nanmean(curves, 0)
            std = np.nanstd(curves, 0)
            ax.plot(t, mean, marker="o", lw=2)
            ax.fill_between(t, mean - std, mean + std, alpha=0.3)
            ax.set_title(f"CSI @ {tau} m")
            ax.set_xlabel("rollout step")
            ax.set_ylim(0, 1)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "csi_curves.png"), dpi=120)
        plt.close(fig)

        losses = self.rollout_losses()
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.boxplot([losses[:, 0], losses[:, 1]], tick_labels=["h [m]", "|q| [m2/s]"])
        ax.set_title("rollout MAE per simulation")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "rollout_loss_box.png"), dpi=120)
        plt.close(fig)

        # F1 curves (companion to CSI; reference SpatialAnalysis figures)
        fig, axes = plt.subplots(1, len(self.thresholds), figsize=(11, 4))
        axes = np.atleast_1d(axes)
        for ax, tau in zip(axes, self.thresholds):
            curves = self.f1_curves(tau)
            t = np.arange(curves.shape[1])
            mean, std = np.nanmean(curves, 0), np.nanstd(curves, 0)
            ax.plot(t, mean, marker="o", lw=2, color="tab:green")
            ax.fill_between(t, mean - std, mean + std, alpha=0.3,
                            color="tab:green")
            ax.set_title(f"F1 @ {tau} m")
            ax.set_xlabel("rollout step")
            ax.set_ylim(0, 1)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "f1_curves.png"), dpi=120)
        plt.close(fig)

        # DL-vs-numerical execution-time boxplots (reference SpatialAnalysis
        # :311-562 summary figures — the speed-up story at a glance)
        if self.prediction_times:
            cols = [np.asarray(self.prediction_times)]
            labels = ["surrogate"]
            if self.numerical_times and np.asarray(self.numerical_times).max() > 0:
                cols.append(np.asarray(self.numerical_times))
                labels.append("numerical solver")
            fig, ax = plt.subplots(figsize=(5, 4))
            ax.boxplot(cols, tick_labels=labels)
            ax.set_yscale("log")
            ax.set_ylabel("seconds per simulation")
            ax.set_title("execution time: surrogate vs numerical")
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, "execution_times_box.png"),
                        dpi=120)
            plt.close(fig)

        cons = self.mass_conservation_series()
        fig, ax = plt.subplots(figsize=(6, 4))
        for c in cons:
            ax.plot(np.arange(1, len(c) + 1), c, alpha=0.6)
        ax.set_title("mass conservation residual [1e6 m$^3$]")
        ax.set_xlabel("rollout step")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "mass_conservation.png"), dpi=120)
        plt.close(fig)
