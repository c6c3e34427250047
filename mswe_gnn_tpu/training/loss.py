"""Loss functions: masked RMSE/MAE, finest-scale restriction, velocity
weighting, and the mass-conservation penalty.

Functional port of reference training/loss.py with static-shape masking:
where the reference compacts rows (``diff[where_water]``), we keep all rows
and use masked sums with dynamic counts — identical values, static shapes.
Padded nodes always have diff == 0 and are additionally excluded through the
node mask.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mswe_gnn_tpu import NUM_WATER_VARS
from mswe_gnn_tpu.graph import FloodGraph


def masked_error_sums(diff: jax.Array, valid: jax.Array, type_loss: str):
    """Per-variable (sum of |diff|^p over valid rows, count of valid rows).

    Returning sums instead of means lets batched losses aggregate across
    graphs exactly like the reference's concat-then-mean
    (reference training/loss.py:68-70).
    """
    v = valid.astype(diff.dtype)[:, None]
    if type_loss == "RMSE":
        s = jnp.sum(diff * diff * v, axis=0)
    elif type_loss == "MAE":
        s = jnp.sum(jnp.abs(diff) * v, axis=0)
    else:
        raise ValueError("type_loss must be 'RMSE' or 'MAE'")
    return s, jnp.sum(v)


def finalize_error(sums: jax.Array, count: jax.Array, type_loss: str) -> jax.Array:
    mean = sums / jnp.maximum(count, 1.0)
    return jnp.sqrt(mean) if type_loss == "RMSE" else mean


def water_mask(diff: jax.Array) -> jax.Array:
    """Rows where prediction or target is nonzero
    (reference training/loss.py:25-35)."""
    return jnp.any(diff != 0, axis=-1)


def loss_variable_scaler(velocity_scaler: float) -> jax.Array:
    """[1, velocity_scaler] weighting (reference training/loss.py:37-47)."""
    s = jnp.ones(NUM_WATER_VARS)
    return s.at[1].set(velocity_scaler)


def conservation_residual(
    pred_wd: jax.Array,      # [N, 1] predicted water depth at t+1
    input_wd: jax.Array,     # [N, 1] input water depth at t
    graph: FloodGraph,
    bc_now: jax.Array,       # [Nbc] BC value at the step boundary (per ghost node)
) -> jax.Array:
    """Signed mass-conservation residual, in 1e6 m^3
    (reference training/loss.py:120-168). Finest scale only.

    For a concat-batched (disconnected-union) graph, returns the per-graph
    residuals [num_graphs] via static reshapes of the finest scale block and
    the BC arrays; a single graph returns a scalar.
    """
    b = graph.num_graphs
    delta = pred_wd - input_wd
    vol = graph.area[:, None] * delta
    fs = graph.finest_slice()
    vol_fs = (vol[fs] * graph.node_mask[fs, None]).reshape(b, -1)
    predicted_inflow = vol_fs.sum(axis=1)                         # [b]
    # theoretical inflow: sum(|q| * L_bc) * dt  (reference utils/dataset.py:577-591)
    inflow = ((bc_now * graph.bc_edge_length * graph.bc_mask).reshape(b, -1)
              .sum(axis=1)) * (60.0 * graph.temporal_res)
    ghost = ((jnp.take(vol[:, 0], graph.bc_nodes) * graph.bc_mask)
             .reshape(b, -1).sum(axis=1))
    res = (predicted_inflow - inflow - ghost) / 1e6
    return res if b > 1 else res[0]


def step_loss_sums(
    preds: jax.Array,        # [N, 2]
    target: jax.Array,       # [N, 2]
    graph: FloodGraph,
    type_loss: str = "RMSE",
    only_where_water: bool = False,
    multiscale: bool = True,
    bc_now: Optional[jax.Array] = None,
    conservation: float = 0.0,
):
    """Per-graph loss pieces for one rollout step.

    Returns (per-variable error sums [2], valid count, signed conservation
    residual). Combine across a batch with :func:`combine_batch_loss`.
    """
    diff = preds - target
    if multiscale:
        fs = graph.finest_slice()
        diff_sel = diff[fs]
        nmask = graph.node_mask[fs]
    else:
        diff_sel = diff
        nmask = graph.node_mask
    valid = nmask > 0
    if only_where_water:
        valid = valid & water_mask(diff_sel)
    sums, count = masked_error_sums(diff_sel, valid, type_loss)

    if conservation != 0.0:
        wd_idx = NUM_WATER_VARS
        input_wd = graph.x_dynamic[:, -wd_idx::wd_idx]
        pred_wd = preds[:, 0::wd_idx]
        cons = conservation_residual(pred_wd, input_wd, graph, bc_now)
    else:
        cons = jnp.zeros(())
    return sums, count, cons


def combine_batch_loss(
    sums: jax.Array,         # [B, 2]
    counts: jax.Array,       # [B]
    cons: jax.Array,         # [B]
    type_loss: str = "RMSE",
    velocity_scaler: float = 1.0,
    conservation: float = 0.0,
) -> jax.Array:
    """Aggregate vmapped per-graph pieces into the scalar training loss.

    Matches the reference exactly: errors are concat-then-mean across the
    batch (reference training/loss.py:68-70, 107-110); the conservation term
    is the |batch-mean| of signed residuals (reference training/loss.py:112-116,
    166-167).
    """
    err = finalize_error(sums.sum(0), counts.sum(), type_loss)
    scaler = loss_variable_scaler(velocity_scaler)
    loss = jnp.dot(err, scaler) / scaler.sum()
    if conservation != 0.0:
        loss = loss + conservation * jnp.abs(cons.mean())
    return loss
