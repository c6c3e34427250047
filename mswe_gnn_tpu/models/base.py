"""Shared flood-model behaviors: residual connections and small-water masking.

Functional port of ``BaseFloodModel`` (reference models/models.py:7-100):
- residual modes: 'all' / True / False / None with exp or xavier init
- small-water-depth masking (h below epsilon -> 0; |q| where h == 0 -> 0)
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from mswe_gnn_tpu import NUM_WATER_VARS


def init_residual_weights(
    key,
    learned_residuals: Union[bool, str, None],
    previous_t: int,
    residuals_base: float = 2.0,
    residual_init: str = "exp",
    out_dim: int = NUM_WATER_VARS,
) -> Optional[jax.Array]:
    """Residual weight init (reference models/models.py:36-48, 93-100).

    'exp': weights proportional to base**t, normalized to sum 1 (later steps
    weigh more); 'random': xavier-normal.
    Shapes: [previous_t, 1] for True, [previous_t, out_dim] for 'all'.
    """
    if learned_residuals not in (True, "all"):
        return None
    repeat = out_dim if learned_residuals == "all" else 1
    if residual_init == "exp":
        w = jnp.asarray([residuals_base ** e for e in range(previous_t)], jnp.float32)
        w = w / w.sum()
        return jnp.tile(w[:, None], (1, repeat))
    if residual_init == "random":
        std = (2.0 / (previous_t + repeat)) ** 0.5
        return std * jax.random.normal(key, (previous_t, repeat), jnp.float32)
    raise ValueError("residual_init must be 'exp' or 'random'")


def add_residual_connection(
    x0: jax.Array,
    residual_weights: Optional[jax.Array],
    learned_residuals: Union[bool, str, None],
    previous_t: int,
    out_dim: int = NUM_WATER_VARS,
) -> jax.Array:
    """Residual from input water states to output (reference models/models.py:50-77).

    ``x0`` is the full input feature matrix [N, S + 2*previous_t] whose last
    2*previous_t columns are the interleaved (h, |q|) history.
    """
    n = x0.shape[0]
    if learned_residuals is True:
        hist = x0[:, -previous_t * NUM_WATER_VARS:].reshape(n, previous_t, NUM_WATER_VARS)
        return jnp.einsum("npv,p->nv", hist, residual_weights[:, 0])
    if learned_residuals == "all":
        hist = x0[:, -previous_t * out_dim:].reshape(n, previous_t, out_dim)
        return jnp.einsum("npv,pv->nv", hist, residual_weights)
    if learned_residuals is False:
        return x0[:, -out_dim:]
    return jnp.zeros((n, out_dim), x0.dtype)


def mask_small_wd(x: jax.Array, epsilon: float = 0.0001) -> jax.Array:
    """Zero tiny water depths; zero |q| where h == 0
    (reference models/models.py:79-91).

    Note the reference returns columns regrouped as (all h cols, all |q| cols);
    for out_dim == 2 that equals the original (h, |q|) order.
    """
    wd = x[:, 0::NUM_WATER_VARS]
    v = x[:, 1::NUM_WATER_VARS]
    wd = wd * (jnp.abs(wd) > epsilon)
    v = v * (wd != 0)
    return jnp.concatenate([wd, v], axis=-1)
