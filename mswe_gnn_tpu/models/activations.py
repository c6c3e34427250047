"""Activation functions with optional learned parameters.

Covers the option set of the reference activation factory
(reference models/models.py:149-169): relu / prelu / leakyrelu / elu / swish /
sigmoid / tanh / None. PReLU carries a single learned ``alpha`` (torch's
``PReLU(num_parameters=1)``, init 0.25), stored in the param pytree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PARAMETRIC = ("prelu",)
VALID = ("relu", "prelu", "leakyrelu", "elu", "swish", "sigmoid", "tanh", None)


def init_activation(name: str | None) -> dict:
    """Return the (possibly empty) param dict for an activation."""
    if name not in VALID:
        raise ValueError(f"unknown activation {name!r}; options: {VALID}")
    if name == "prelu":
        return {"alpha": jnp.asarray([0.25], dtype=jnp.float32)}
    return {}


def apply_activation(name: str | None, params: dict, x: jax.Array) -> jax.Array:
    if name is None:
        return x
    if name == "relu":
        return jax.nn.relu(x)
    if name == "prelu":
        alpha = params["alpha"]
        return jnp.where(x >= 0, x, alpha * x)
    if name == "leakyrelu":
        return jax.nn.leaky_relu(x, negative_slope=0.1)
    if name == "elu":
        return jax.nn.elu(x)
    if name == "swish":
        return jax.nn.silu(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "tanh":
        return jnp.tanh(x)
    raise ValueError(f"unknown activation {name!r}")
