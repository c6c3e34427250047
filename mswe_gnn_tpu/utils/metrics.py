"""Evaluation metrics: CSI, F1, rollout RMSE/MAE, FAT, Froude, speed-up.

Functional port of reference utils/miscellaneous.py:44-199 with padded-node
masks. Shapes: rollouts are [N, 2, T] (single) or [B, N, 2, T] (batched);
variable 0 is water depth h, variable 1 is |q|.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _confusion(pred_roll, real_roll, node_mask, water_threshold):
    """TP/TN/FP/FN over the node axis, per time step
    (reference utils/miscellaneous.py:123-151). Padded nodes are masked out of
    every bucket (they would otherwise count as TN, harmless for CSI but wrong
    for accuracy-style stats)."""
    pred_flood = pred_roll[..., 0, :] > water_threshold     # [..., N, T] -> bool
    real_flood = real_roll[..., 0, :] > water_threshold
    m = node_mask[..., None].astype(jnp.float32)            # [..., N, 1]
    nodes_axis = -2
    tp = ((pred_flood & real_flood) * m).sum(nodes_axis)
    tn = ((~pred_flood & ~real_flood) * m).sum(nodes_axis)
    fp = ((pred_flood & ~real_flood) * m).sum(nodes_axis)
    fn = ((~pred_flood & real_flood) * m).sum(nodes_axis)
    return tp, tn, fp, fn


def get_csi(pred_roll, real_roll, node_mask, water_threshold: float = 0.0):
    """Critical Success Index per time step; NaN where the denominator is 0
    (reference utils/miscellaneous.py:153-160)."""
    tp, _, fp, fn = _confusion(pred_roll, real_roll, node_mask, water_threshold)
    denom = tp + fn + fp
    return jnp.where(denom > 0, tp / jnp.maximum(denom, 1.0), jnp.nan)


def get_f1(pred_roll, real_roll, node_mask, water_threshold: float = 0.0):
    """F1 score per time step (reference utils/miscellaneous.py:162-169)."""
    tp, _, fp, fn = _confusion(pred_roll, real_roll, node_mask, water_threshold)
    denom = tp + 0.5 * (fn + fp)
    return jnp.where(denom > 0, tp / jnp.maximum(denom, 1.0), jnp.nan)


def get_rollout_loss(pred_roll, real_roll, node_mask,
                     type_loss: str = "RMSE", only_where_water: bool = False):
    """Per-simulation, per-variable rollout error
    (reference utils/miscellaneous.py:177-199).

    only_where_water=True: error over all (node, time) entries where any
    variable differs — one pooled mean per variable.
    only_where_water=False: per-time error over nodes, then mean over time.
    Accepts [N,2,T] or [B,N,2,T]; returns [2] or [B,2].
    """
    diff = pred_roll - real_roll
    nm = node_mask.astype(diff.dtype)
    if only_where_water:
        www = jnp.any(diff != 0, axis=-2)                      # [..., N, T]
        mask = www * nm[..., None]
        cnt = jnp.maximum(mask.sum((-2, -1)), 1.0)             # [...]
        if type_loss == "RMSE":
            s = (diff ** 2 * mask[..., None, :]).sum((-3, -1)) # [..., 2]
            return jnp.sqrt(s / cnt[..., None])
        s = (jnp.abs(diff) * mask[..., None, :]).sum((-3, -1))
        return s / cnt[..., None]
    cnt = jnp.maximum(nm.sum(-1), 1.0)
    if type_loss == "RMSE":
        per_t = jnp.sqrt((diff ** 2 * nm[..., None, None]).sum(-3)
                         / cnt[..., None, None])
        return per_t.mean(-1)
    per_t = (jnp.abs(diff) * nm[..., None, None]).sum(-3) / cnt[..., None, None]
    return per_t.mean(-1)


def wd_to_fat(wd, temporal_res: float, water_threshold: float = 0.0,
              time_start: int = 0):
    """Flood-arrival-time map in hours from a [N, T] water-depth sequence
    (reference utils/miscellaneous.py:56-68)."""
    total_time = time_start + wd.shape[-1]
    flooded_time = (wd > water_threshold).sum(-1)
    return (total_time - flooded_time) * temporal_res / 60.0


def get_velocity(discharge, water_depth, epsilon: float = 0.01):
    """v = q/h with shallow-water cutoff (reference utils/miscellaneous.py:44-48)."""
    v = jnp.where(water_depth > epsilon, discharge / jnp.maximum(water_depth, epsilon), 0.0)
    return v


def get_froude(velocity, water_depth):
    """Froude number v / sqrt(g h) (reference utils/miscellaneous.py:50-54)."""
    g = 9.81
    fr = jnp.where(water_depth > 0,
                   velocity / jnp.sqrt(g * jnp.maximum(water_depth, 1e-12)), 0.0)
    return fr


def get_speed_up(numerical_times: np.ndarray, model_times: np.ndarray) -> Tuple[float, float]:
    """Speed-up of the surrogate vs the numerical solver
    (reference utils/miscellaneous.py:110-114)."""
    ratio = np.asarray(numerical_times) / np.asarray(model_times)
    return float(ratio.mean()), float(ratio.std())


def get_sufficient_k_hops(edge_index: np.ndarray, wd: np.ndarray,
                          cover_percentage: float = 0.999, max_k: int = 50) -> int:
    """Minimum K so K-hop neighborhoods cover one-step wet-front growth
    (reference utils/miscellaneous.py:266-301). Host-side diagnostic."""
    src, dst = edge_index
    num_nodes = wd.shape[0]
    water_t1 = (wd[:, 1:] > 0)
    fake = (wd[:, :-1] > 0).astype(np.float64)

    def covered(f):
        hit = (f[water_t1] > 0).sum()
        need = water_t1.sum()
        return hit >= cover_percentage * need if cover_percentage < 1 else hit == need

    k = 0
    while not covered(fake):
        spread = np.zeros_like(fake)
        np.add.at(spread, dst, fake[src])
        fake = np.clip(spread + fake, 0, 1)
        k += 1
        if k > max_k:
            break
    return k


def get_sufficient_k_hops_per_scale(edge_index: np.ndarray, wd: np.ndarray,
                                    edge_ptr, node_ptr,
                                    cover_percentage: float = 0.999):
    """Per-scale receptive-field sufficiency
    (reference utils/miscellaneous.py:303-309)."""
    out = []
    for i in range(len(node_ptr) - 1):
        ei = edge_index[:, edge_ptr[i]: edge_ptr[i + 1]] - node_ptr[i]
        out.append(get_sufficient_k_hops(ei, wd[node_ptr[i]: node_ptr[i + 1]],
                                         cover_percentage))
    return out
