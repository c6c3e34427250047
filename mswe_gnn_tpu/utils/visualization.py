"""Visualization: flood maps on unstructured meshes, rollout panels, FAT,
velocity quivers, and animation export.

Re-design of the reference plotting stack (reference utils/visualization.py:
BasePlotMap :113, TemporalPlotMap :272, QuiverPlotMap :324, DEMPlotMap :417,
PlotRollout :515 with video export :896-1079). Cell values are drawn as
scatter/tripcolor on face centers — works for both grid and triangulated
meshes without polygon patch bookkeeping.

All functions are headless (Agg backend) and write files.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import animation  # noqa: E402

from mswe_gnn_tpu.data.meshing import Mesh, MultiscaleMesh  # noqa: E402
from mswe_gnn_tpu.utils.metrics import wd_to_fat  # noqa: E402


def _cell_size(mesh: Mesh) -> float:
    return float(np.sqrt(np.median(mesh.area)))


def plot_map(mesh: Mesh, values: np.ndarray, ax=None, cmap: str = "Blues",
             title: str = "", vmin=None, vmax=None, colorbar: bool = True,
             mask_zero: bool = False):
    """One scalar field on cell centers (reference BasePlotMap semantics)."""
    ax = ax or plt.gca()
    v = np.asarray(values, dtype=float).copy()
    if mask_zero:
        v[v == 0] = np.nan
    s = max(2.0, 4e4 / max(mesh.num_faces, 1))
    sc = ax.scatter(mesh.face_xy[:, 0], mesh.face_xy[:, 1], c=v, s=s,
                    marker="s", cmap=cmap, vmin=vmin, vmax=vmax, lw=0)
    ax.set_aspect("equal")
    ax.set_title(title)
    ax.set_xticks([]), ax.set_yticks([])
    if colorbar:
        plt.colorbar(sc, ax=ax, shrink=0.8)
    return sc


def plot_dem(mesh: Mesh, ax=None, breach_xy: Optional[np.ndarray] = None,
             title: str = "DEM"):
    """Terrain map with optional breach markers (reference DEMPlotMap :417)."""
    ax = ax or plt.gca()
    sc = plot_map(mesh, mesh.dem, ax=ax, cmap="terrain", title=title)
    if breach_xy is not None:
        ax.scatter(breach_xy[:, 0], breach_xy[:, 1], marker="x", c="red", s=80)
    return sc


def plot_quiver(mesh: Mesh, vx: np.ndarray, vy: np.ndarray, ax=None,
                stride: int = 4, title: str = "velocity"):
    """Velocity field quiver (reference QuiverPlotMap :324)."""
    ax = ax or plt.gca()
    idx = np.arange(0, mesh.num_faces, stride)
    ax.quiver(mesh.face_xy[idx, 0], mesh.face_xy[idx, 1], vx[idx], vy[idx],
              np.hypot(vx[idx], vy[idx]), cmap="viridis", scale_units="xy")
    ax.set_aspect("equal")
    ax.set_title(title)
    return ax


class PlotRollout:
    """Predicted vs real vs error panels over a rollout
    (reference PlotRollout :515).

    ``pred``/``real`` are [N0, 2, T] on the finest scale of ``mesh``.
    """

    def __init__(self, mesh: MultiscaleMesh, pred: np.ndarray, real: np.ndarray,
                 temporal_res: float = 60.0, node_ptr=None):
        self.finest = mesh.meshes[0]
        self.mesh = mesh
        n0 = self.finest.num_faces
        # full multiscale arrays (for the per-scale video); finest views below.
        # ``node_ptr`` gives the per-scale block offsets of ``pred``/``real``
        # — pass the graph spec's (PADDED) pointers when the arrays come from
        # a padded FloodGraph; defaults to the raw mesh pointers.
        self.node_ptr = np.asarray(node_ptr if node_ptr is not None
                                   else mesh.node_ptr)
        self.pred_all = np.asarray(pred)
        self.real_all = np.asarray(real)
        self.pred = np.asarray(pred)[:n0]
        self.real = np.asarray(real)[:n0]
        self.temporal_res = temporal_res

    def frame(self, t: int, variable: int = 0, out_path: Optional[str] = None):
        names = ["water depth h [m]", "|q| [m$^2$/s]"]
        vmax = float(max(self.real[:, variable].max(), 1e-6))
        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        plot_map(self.finest, self.pred[:, variable, t], ax=axes[0],
                 title=f"predicted {names[variable]} (t={t})", vmin=0, vmax=vmax,
                 mask_zero=True)
        plot_map(self.finest, self.real[:, variable, t], ax=axes[1],
                 title="simulated", vmin=0, vmax=vmax, mask_zero=True)
        err = self.pred[:, variable, t] - self.real[:, variable, t]
        lim = max(abs(err).max(), 1e-6)
        plot_map(self.finest, err, ax=axes[2], cmap="RdBu_r",
                 title="difference", vmin=-lim, vmax=lim)
        fig.tight_layout()
        if out_path:
            fig.savefig(out_path, dpi=110)
            plt.close(fig)
        return fig

    def fat_comparison(self, water_threshold: float = 0.05,
                       out_path: Optional[str] = None):
        """Flood-arrival-time maps pred vs real (reference :845)."""
        import jax.numpy as jnp

        fat_p = np.asarray(wd_to_fat(jnp.asarray(self.pred[:, 0]),
                                     self.temporal_res, water_threshold))
        fat_r = np.asarray(wd_to_fat(jnp.asarray(self.real[:, 0]),
                                     self.temporal_res, water_threshold))
        vmax = float(max(fat_r.max(), 1e-6))
        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        plot_map(self.finest, fat_p, ax=axes[0], cmap="plasma",
                 title="predicted FAT [h]", vmin=0, vmax=vmax)
        plot_map(self.finest, fat_r, ax=axes[1], cmap="plasma",
                 title="simulated FAT [h]", vmin=0, vmax=vmax)
        diff = fat_p - fat_r
        lim = max(abs(diff).max(), 1e-6)
        plot_map(self.finest, diff, ax=axes[2], cmap="RdBu_r",
                 title="difference [h]", vmin=-lim, vmax=lim)
        fig.tight_layout()
        if out_path:
            fig.savefig(out_path, dpi=110)
            plt.close(fig)
        return fig

    def scales_plot(self, values_per_scale: Optional[Sequence[np.ndarray]] = None,
                    out_path: Optional[str] = None):
        """Side-by-side view of the mesh hierarchy (reference mesh_scale_plot :569)."""
        L = self.mesh.num_scales
        fig, axes = plt.subplots(1, L, figsize=(5 * L, 5))
        axes = np.atleast_1d(axes)
        for s, (m, ax) in enumerate(zip(self.mesh.meshes, axes)):
            vals = (values_per_scale[s] if values_per_scale is not None
                    else m.dem)
            plot_map(m, vals, ax=ax, cmap="terrain",
                     title=f"scale {s} ({m.num_faces} cells)")
        fig.tight_layout()
        if out_path:
            fig.savefig(out_path, dpi=110)
            plt.close(fig)
        return fig

    def csi_f1_panel(self, thresholds=(0.05, 0.3),
                     out_path: Optional[str] = None):
        """CSI and F1 over the rollout for this simulation
        (reference PlotRollout._plot_metric, visualization.py:1087-1116)."""
        import jax.numpy as jnp

        from mswe_gnn_tpu.utils.metrics import get_csi, get_f1

        p, r = jnp.asarray(self.pred), jnp.asarray(self.real)
        m = jnp.ones(p.shape[0])
        tv = np.arange(p.shape[-1]) * self.temporal_res / 60.0
        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for ax, name, fn in ((axes[0], "CSI", get_csi), (axes[1], "F1", get_f1)):
            for tau in thresholds:
                ax.plot(tv, np.asarray(fn(p, r, m, water_threshold=tau)),
                        marker="o", ms=3, label=f"{name}_{tau}")
            ax.set_xlabel("Time [h]")
            ax.set_ylabel(f"{name} score")
            ax.set_ylim(0, 1)
            ax.grid(alpha=0.4)
            ax.legend(loc=4)
        fig.tight_layout()
        if out_path:
            fig.savefig(out_path, dpi=110)
            plt.close(fig)
        return fig

    def froude_map(self, t: Optional[int] = None,
                   out_path: Optional[str] = None):
        """Froude number maps pred vs real vs difference at time ``t``
        (defaults to the wettest frame; reference compare_Froude :863,
        get_Froude misc.py:50-54; velocity recovered as |q| / h)."""
        g = 9.81

        def froude(arr_t):
            h, q = arr_t[:, 0], arr_t[:, 1]
            v = np.where(h > 1e-6, q / np.maximum(h, 1e-6), 0.0)
            fr = np.where(h > 0, v / np.sqrt(g * np.maximum(h, 1e-9)), 0.0)
            return fr

        if t is None:
            t = int(np.argmax(self.real[:, 0].sum(0)))
        fr_p, fr_r = froude(self.pred[..., t]), froude(self.real[..., t])
        vmax = float(max(fr_r.max(), fr_p.max(), 1e-6))
        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        plot_map(self.finest, fr_p, ax=axes[0], cmap="viridis",
                 title=f"predicted Froude (t={t})", vmin=0, vmax=vmax)
        plot_map(self.finest, fr_r, ax=axes[1], cmap="viridis",
                 title="simulated Froude", vmin=0, vmax=vmax)
        diff = fr_p - fr_r
        lim = max(abs(diff).max(), 1e-6)
        plot_map(self.finest, diff, ax=axes[2], cmap="RdBu_r",
                 title="difference", vmin=-lim, vmax=lim)
        fig.tight_layout()
        if out_path:
            fig.savefig(out_path, dpi=110)
            plt.close(fig)
        return fig

    def conservation_panel(self, residual_series: np.ndarray,
                           inflow_series: Optional[np.ndarray] = None,
                           out_path: Optional[str] = None):
        """Mass-conservation error over the rollout (reference
        _plot_mass_conservation :1118): per-step signed residual and, when
        the inflow volume series is given, the cumulative error normalized
        by cumulative inflow."""
        res = np.asarray(residual_series, float)         # [T-1], 1e6 m^3
        tv = (np.arange(len(res)) + 1) * self.temporal_res / 60.0
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(tv, res, marker="o", ms=3, label=r"per $\Delta$t [1e6 m$^3$]")
        if inflow_series is not None:
            inflow = np.maximum(np.asarray(inflow_series, float)[:len(res)],
                                1e-12)
            cum = np.cumsum(res) / np.cumsum(inflow)
            ax.plot(tv, cum, lw=2, label="cumulative / cumulative inflow [-]")
        ax.set_title("Mass conservation")
        ax.set_xlabel("Time [h]")
        ax.set_ylabel("Volume error")
        ax.grid(alpha=0.4)
        ax.legend()
        fig.tight_layout()
        if out_path:
            fig.savefig(out_path, dpi=110)
            plt.close(fig)
        return fig

    def create_multiscale_video(self, out_path: str, variable: int = 0,
                                fps: int = 4, predicted: bool = True):
        """Animated per-scale view of the hierarchy over the rollout
        (reference create_multiscale_video :965): one panel per scale,
        showing how the V-cycle's coarse scales see the flood."""
        arr = self.pred_all if predicted else self.real_all
        L = self.mesh.num_scales
        T = arr.shape[-1]
        nptr = self.node_ptr
        vmax = float(max(arr[: nptr[1], variable].max(), 1e-6))
        fig, axes = plt.subplots(1, L, figsize=(5 * L, 5))
        axes = np.atleast_1d(axes)
        scs = []
        for s, (m, ax) in enumerate(zip(self.mesh.meshes, axes)):
            block = arr[nptr[s]: nptr[s] + m.num_faces, variable, 0].copy()
            block[block == 0] = np.nan
            size = max(2.0, 4e4 / max(m.num_faces, 1))
            sc = ax.scatter(m.face_xy[:, 0], m.face_xy[:, 1], c=block, s=size,
                            marker="s", cmap="Blues", vmin=0, vmax=vmax, lw=0)
            ax.set_aspect("equal")
            ax.set_title(f"scale {s} ({m.num_faces} cells)")
            ax.set_xticks([]), ax.set_yticks([])
            scs.append(sc)
        ttl = fig.suptitle("t = 0")

        def update(t):
            for s, (sc, m) in enumerate(zip(scs, self.mesh.meshes)):
                block = arr[nptr[s]: nptr[s] + m.num_faces, variable, t].copy()
                block[block == 0] = np.nan
                sc.set_array(block)
            ttl.set_text(f"t = {t} ({t * self.temporal_res / 60:.0f} h)")
            return scs

        anim = animation.FuncAnimation(fig, update, frames=T, blit=False)
        if out_path.endswith(".mp4") and animation.writers.is_available("ffmpeg"):
            anim.save(out_path, writer="ffmpeg", fps=fps)
        else:
            if out_path.endswith(".mp4"):
                out_path = out_path[:-4] + ".gif"
            anim.save(out_path, writer=animation.PillowWriter(fps=fps))
        plt.close(fig)
        return out_path

    def create_video(self, out_path: str, variable: int = 0, fps: int = 4):
        """Animated rollout (reference create_video :896 / save_video :1079).

        Writes .gif (Pillow) or .mp4 when ffmpeg is present.
        """
        names = ["water depth h [m]", "|q| [m$^2$/s]"]
        T = self.pred.shape[-1]
        vmax = float(max(self.real[:, variable].max(), 1e-6))
        fig, axes = plt.subplots(1, 2, figsize=(11, 5))
        scs = []
        for ax, (data, label) in zip(axes, [(self.pred, "predicted"),
                                            (self.real, "simulated")]):
            v = data[:, variable, 0].copy()
            v[v == 0] = np.nan
            s = max(2.0, 4e4 / max(self.finest.num_faces, 1))
            sc = ax.scatter(self.finest.face_xy[:, 0], self.finest.face_xy[:, 1],
                            c=v, s=s, marker="s", cmap="Blues", vmin=0, vmax=vmax,
                            lw=0)
            ax.set_aspect("equal")
            ax.set_title(f"{label} {names[variable]}")
            ax.set_xticks([]), ax.set_yticks([])
            scs.append(sc)
        ttl = fig.suptitle("t = 0")

        def update(t):
            for sc, data in zip(scs, [self.pred, self.real]):
                v = data[:, variable, t].copy()
                v[v == 0] = np.nan
                sc.set_array(v)
            ttl.set_text(f"t = {t} ({t * self.temporal_res / 60:.0f} h)")
            return scs

        anim = animation.FuncAnimation(fig, update, frames=T, blit=False)
        if out_path.endswith(".mp4") and animation.writers.is_available("ffmpeg"):
            anim.save(out_path, writer="ffmpeg", fps=fps)
        else:
            if out_path.endswith(".mp4"):
                out_path = out_path[:-4] + ".gif"
            anim.save(out_path, writer=animation.PillowWriter(fps=fps))
        plt.close(fig)
        return out_path
