"""Baseline graph-convolution layers: Cheb / TAG / GAT equivalents.

TPU-native re-implementations of the PyG layers the reference uses as
baselines in its processor (reference models/gnn.py:85-100):
- ``GNN_L`` -> ChebConv (Chebyshev polynomials of the scaled Laplacian)
- ``GNN_A`` -> TAGConv (powers of the sym-normalized adjacency)
- ``GAT``   -> GATConv (single-head additive attention)

All operate on padded COO edge arrays with masks; degree terms count only real
edges so padding never changes values.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mswe_gnn_tpu.models.mlp import apply_linear, init_linear
from mswe_gnn_tpu.ops.segment import segment_sum


def _sym_norm_coeffs(src, dst, edge_mask, num_nodes, add_self_loops: bool):
    """D^-1/2 A D^-1/2 edge coefficients (masked edges get 0)."""
    ones = edge_mask
    deg = segment_sum(ones[:, None], dst, num_segments=num_nodes)[:, 0]
    if add_self_loops:
        deg = deg + 1.0
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    coeff = jnp.take(dinv, src) * jnp.take(dinv, dst) * edge_mask
    return coeff, dinv


def _adj_matvec(x, src, dst, coeff, num_nodes):
    """y = A_norm x via gather-scale-scatter."""
    return segment_sum(jnp.take(x, src, axis=0) * coeff[:, None], dst, num_segments=num_nodes)


@dataclasses.dataclass(frozen=True)
class ChebConfig:
    in_features: int
    out_features: int
    K: int


def init_cheb(key, cfg: ChebConfig) -> dict:
    keys = jax.random.split(key, cfg.K + 1)
    return {
        "lins": [init_linear(k, cfg.in_features, cfg.out_features, bias=False) for k in keys[:-1]],
        "bias": jnp.zeros(cfg.out_features),
    }


def apply_cheb(params, cfg: ChebConfig, x, src, dst, edge_mask):
    """Chebyshev conv with lambda_max=2 normalization (PyG default):
    L_hat = L_sym - I = -D^-1/2 A D^-1/2."""
    n = x.shape[0]
    coeff, _ = _sym_norm_coeffs(src, dst, edge_mask, n, add_self_loops=False)
    tx_prev = x
    out = apply_linear(params["lins"][0], tx_prev)
    if cfg.K > 1:
        tx = -_adj_matvec(x, src, dst, coeff, n)
        out = out + apply_linear(params["lins"][1], tx)
        for k in range(2, cfg.K):
            tx_next = -2.0 * _adj_matvec(tx, src, dst, coeff, n) - tx_prev
            tx_prev, tx = tx, tx_next
            out = out + apply_linear(params["lins"][k], tx)
    return out + params["bias"]


@dataclasses.dataclass(frozen=True)
class TAGConfig:
    in_features: int
    out_features: int
    K: int


def init_tag(key, cfg: TAGConfig) -> dict:
    keys = jax.random.split(key, cfg.K + 1)
    return {
        "lins": [init_linear(k, cfg.in_features, cfg.out_features, bias=False) for k in keys],
        "bias": jnp.zeros(cfg.out_features),
    }


def apply_tag(params, cfg: TAGConfig, x, src, dst, edge_mask):
    """TAGConv: sum_k W_k (A_norm^k x), sym-normalized adjacency."""
    n = x.shape[0]
    coeff, _ = _sym_norm_coeffs(src, dst, edge_mask, n, add_self_loops=False)
    out = apply_linear(params["lins"][0], x)
    h = x
    for k in range(1, cfg.K + 1):
        h = _adj_matvec(h, src, dst, coeff, n)
        out = out + apply_linear(params["lins"][k], h)
    return out + params["bias"]


@dataclasses.dataclass(frozen=True)
class GATConfig:
    in_features: int
    out_features: int
    negative_slope: float = 0.2


def init_gat(key, cfg: GATConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / jnp.sqrt(cfg.in_features)
    return {
        "lin": init_linear(k1, cfg.in_features, cfg.out_features, bias=False),
        "att_src": jax.random.uniform(k2, (cfg.out_features,), minval=-bound, maxval=bound),
        "att_dst": jax.random.uniform(k3, (cfg.out_features,), minval=-bound, maxval=bound),
        "bias": jnp.zeros(cfg.out_features),
    }


def apply_gat(params, cfg: GATConfig, x, src, dst, edge_mask):
    """Single-head GAT with masked segment softmax over incoming edges."""
    n = x.shape[0]
    h = apply_linear(params["lin"], x)
    alpha = jnp.take(h @ params["att_src"], src) + jnp.take(h @ params["att_dst"], dst)
    alpha = jax.nn.leaky_relu(alpha, negative_slope=cfg.negative_slope)
    # masked segment softmax over dst
    neg_inf = jnp.finfo(alpha.dtype).min
    alpha = jnp.where(edge_mask > 0, alpha, neg_inf)
    seg_max = jax.ops.segment_max(alpha, dst, num_segments=n)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(alpha - jnp.take(seg_max, dst)) * edge_mask
    denom = segment_sum(ex[:, None], dst, num_segments=n)[:, 0]
    w = ex / jnp.maximum(jnp.take(denom, dst), 1e-16)
    out = segment_sum(jnp.take(h, src, axis=0) * w[:, None], dst, num_segments=n)
    return out + params["bias"]
