"""Functional MLP with the reference's exact layer recipe.

Mirrors ``make_mlp`` (reference models/models.py:121-146): a stack of Linear
(optional bias) -> [LayerNorm] -> [Dropout] -> activation blocks, with the
single-hidden-size topology in -> hidden -> ... -> out and an activation after
*every* linear including the last.

Params are plain pytrees (dicts/lists of jnp arrays) so that reference torch
checkpoints can be ported directly (weights transposed to [in, out]).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mswe_gnn_tpu.models.activations import apply_activation, init_activation


def _torch_linear_init(key, fan_in: int, fan_out: int, bias: bool):
    """torch.nn.Linear default init: kaiming-uniform(a=sqrt5) for W,
    uniform(+-1/sqrt(fan_in)) for b. Weight stored as [in, out]."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in) if fan_in > 0 else 0.0
    w = jax.random.uniform(wkey, (fan_in, fan_out), minval=-bound, maxval=bound)
    p = {"w": w.astype(jnp.float32)}
    if bias:
        b = jax.random.uniform(bkey, (fan_out,), minval=-bound, maxval=bound)
        p["b"] = b.astype(jnp.float32)
    return p


def matmul(x: jax.Array, w: jax.Array, compute_dtype=None) -> jax.Array:
    """Matmul with optional reduced-precision compute (bf16 in, f32 out).

    The TPU MXU runs bf16 x bf16 -> f32 at full rate; the reference trains
    with '16-mixed' AMP (reference main.py:109) so bf16 compute is the
    matching precision policy on TPU.
    """
    if compute_dtype is None or compute_dtype == "float32":
        return x @ w
    cd = jnp.dtype(compute_dtype)
    return jnp.matmul(x.astype(cd), w.astype(cd),
                      preferred_element_type=jnp.float32)


def mlp_sizes(input_size: int, output_size: int, hidden_size: int, n_layers: int):
    """Per-linear (fan_in, fan_out) pairs matching reference models/models.py:121-141."""
    if n_layers == 1:
        return [(input_size, output_size)]
    sizes = [(input_size, hidden_size)]
    sizes += [(hidden_size, hidden_size)] * (n_layers - 2)
    sizes += [(hidden_size, output_size)]
    return sizes


def init_mlp(
    key,
    input_size: int,
    output_size: int,
    hidden_size: int = 32,
    n_layers: int = 2,
    bias: bool = False,
    activation: Optional[str] = "relu",
    layer_norm: bool = False,
) -> dict:
    sizes = mlp_sizes(input_size, output_size, hidden_size, n_layers)
    keys = jax.random.split(key, len(sizes))
    layers, acts, norms = [], [], []
    for k, (fi, fo) in zip(keys, sizes):
        layers.append(_torch_linear_init(k, fi, fo, bias))
        acts.append(init_activation(activation))
        norms.append({"scale": jnp.ones(fo), "bias": jnp.zeros(fo)} if layer_norm else {})
    return {"layers": layers, "acts": acts, "norms": norms}


def apply_mlp(
    params: dict,
    x: jax.Array,
    activation: Optional[str] = "relu",
    layer_norm: bool = False,
    dropout: float = 0.0,
    dropout_rng=None,
    deterministic: bool = True,
    compute_dtype=None,
) -> jax.Array:
    for lin, act, norm in zip(params["layers"], params["acts"], params["norms"]):
        x = matmul(x, lin["w"], compute_dtype)
        if "b" in lin:
            x = x + lin["b"]
        if layer_norm:
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5) * norm["scale"] + norm["bias"]
        if dropout > 0.0 and not deterministic:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)
        x = apply_activation(activation, act, x)
    return x


def init_linear(key, fan_in: int, fan_out: int, bias: bool = False) -> dict:
    """A bare linear layer (used for SWEGNN filter matrices H_k,
    reference models/gnn.py:381-384)."""
    return _torch_linear_init(key, fan_in, fan_out, bias)


def apply_linear(params: dict, x: jax.Array, compute_dtype=None) -> jax.Array:
    y = matmul(x, params["w"], compute_dtype)
    if "b" in params:
        y = y + params["b"]
    return y
