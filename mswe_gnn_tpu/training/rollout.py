"""Autoregressive rollout as ``jax.lax.scan`` with a donated dynamic carry.

TPU-native replacement for the reference's Python rollout loops
(training rollout: reference training/train.py:125-145; inference rollout:
reference training/train.py:67-95). The carry is the dynamic node-feature
window; boundary-condition injection and the shift-by-prediction update
(reference utils/dataset.py:486-529) are functional updates on the carry.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mswe_gnn_tpu import NUM_WATER_VARS
from mswe_gnn_tpu.graph import FloodGraph


def bc_window(graph: FloodGraph, step: jax.Array) -> jax.Array:
    """BC values seen by the ``previous_t`` input steps at rollout ``step``.

    ``graph.bc_values`` holds the dry-bed-padded series [Nbc, previous_t + T];
    window r is columns r .. r+previous_t-1 (reference utils/dataset.py:349-356,
    430, 456).
    """
    return jax.lax.dynamic_slice_in_dim(
        graph.bc_values, step, graph.previous_t, axis=1)


def bc_midpoint(graph: FloodGraph, step: jax.Array) -> jax.Array:
    """Mean of the last two BC entries of window ``step + 1`` — the value used
    by the reference's conservation loss (reference training/train.py:138:
    ``BC[:,-2:,i+1].mean(1)``), a midpoint rule for instantaneous-sample BC
    series (D-HYDRO data)."""
    w = bc_window(graph, step + 1)
    return w[:, -2:].mean(axis=1)


def bc_step_inflow(graph: FloodGraph, step: jax.Array) -> jax.Array:
    """Inflow driving rollout step ``step``'s transition: the BC value at the
    last input frame's timestamp. With zero-order-hold series (the synthetic
    generator, data/synthetic.py) this is EXACT — the series' column t holds
    the inflow of interval (t, t+1]; with instantaneous-sample series (Zenodo
    pickles) it is the left-endpoint rule, comparable in error to the
    reference's midpoint. Used by the mass-conservation loss."""
    return bc_window(graph, step)[:, -1]


def inject_bc(x_dynamic: jax.Array, graph: FloodGraph, window: jax.Array) -> jax.Array:
    """Write BC values into the ghost-cell rows of the dynamic features
    (reference utils/dataset.py:486-497).

    ``window`` is [Nbc, previous_t]; the (bc_kind-1)-th interleaved column of
    every input step is overwritten for real (non-padded) ghost nodes.

    Implemented scatter-free (TPU: strided-column scatters before the model
    cost ~4 ms/step on a dk15-class mesh by breaking fusion): a one-hot
    selection matrix turns the update into elementwise ops + one tiny matmul.
    Padded ghost rows are excluded by the bc mask, so aliased indices are
    harmless.
    """
    n = x_dynamic.shape[0]
    p = graph.previous_t
    col = graph.bc_kind - 1
    # sel[i, b] = 1 iff node i is real ghost b
    node_ids = jax.lax.broadcasted_iota(jnp.int32, (n, graph.bc_nodes.shape[0]), 0)
    sel = ((node_ids == graph.bc_nodes[None, :]).astype(x_dynamic.dtype)
           * graph.bc_mask[None, :])
    bc_rows = sel @ window                                  # [N, previous_t]
    is_bc = jnp.minimum(sel.sum(axis=1, keepdims=True), 1.0)  # [N, 1]
    x = x_dynamic.reshape(n, p, NUM_WATER_VARS)
    new_col = jnp.where(is_bc > 0, bc_rows, x[:, :, col])
    x = x.at[:, :, col].set(new_col)  # static-index update: pure elementwise
    return x.reshape(n, p * NUM_WATER_VARS)


def with_step_forcing(graph: FloodGraph, step: jax.Array) -> FloodGraph:
    """Append the current-time exogenous forcing to the static features.

    ``graph.forcing [N, Ff, previous_t + T]`` shares the BC series' dry-bed
    column alignment, so the forcing seen at rollout ``step`` is column
    ``step + previous_t - 1`` (the reference feeds WX/WY/P at the input time,
    reference utils/adforce_dataset.py:243-260). No-op without forcing.
    """
    if graph.forcing is None:
        return graph
    cur = jax.lax.dynamic_slice_in_dim(
        graph.forcing, step + graph.previous_t - 1, 1, axis=2)[:, :, 0]
    return graph.replace(
        x_static=jnp.concatenate([graph.x_static, cur], axis=1))


def shift_prediction(x_dynamic: jax.Array, pred: jax.Array, previous_t: int) -> jax.Array:
    """Drop the oldest input step, append the prediction
    (reference utils/dataset.py:508-529)."""
    if previous_t == 1:
        return pred
    return jnp.concatenate([x_dynamic[:, NUM_WATER_VARS:], pred], axis=-1)


def rollout(
    apply_fn: Callable,
    params,
    cfg,
    graph: FloodGraph,
    steps: int,
) -> jax.Array:
    """Full autoregressive rollout -> predictions [N, 2, steps].

    Equivalent to the reference ``rollout_test`` (training/train.py:67-95) but
    compiled as one scan; the dynamic carry buffer is donated by XLA.
    """
    from mswe_gnn_tpu.models import prepare_graph

    # hoist loop-invariant tables/encodings out of the scan (models/prepare.py)
    graph = prepare_graph(params, cfg, graph)

    def step_fn(x_dyn, t):
        x_dyn = inject_bc(x_dyn, graph, bc_window(graph, t))
        gt = with_step_forcing(graph, t).replace(x_dynamic=x_dyn)
        pred = apply_fn(params, cfg, gt)
        x_next = shift_prediction(x_dyn, pred, graph.previous_t)
        return x_next, pred

    _, preds = jax.lax.scan(step_fn, graph.x_dynamic, jnp.arange(steps))
    return jnp.moveaxis(preds, 0, -1)  # [N, 2, steps]


def rollout_batch(apply_fn, params, cfg, batch: FloodGraph, steps: int) -> jax.Array:
    """Rollout a stacked batch -> [B, N, 2, steps]."""
    return jax.vmap(lambda g: rollout(apply_fn, params, cfg, g, steps))(batch)
