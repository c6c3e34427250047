"""SWEGNN — the shallow-water-equations message-passing layer, TPU-first.

Re-derivation of the reference hot kernel (reference models/gnn.py:352-451):

    out_0 = H_0 x_d                         (filter matrix, optional)
    for k in 1..K:
        active_ij = [out has water at i or j]         (wet-front mask)
        s_ij  = MLP(x_s_i, x_s_j, x_d_i, x_d_j, e_ij) (learned flux)
        s_ij  = s_ij / ||s_ij||  (NaN -> 0)           (optional normalize)
        m_ij  = s_ij * (out_j - out_i)                (hydraulic gradient)
        out  += H_k * scatter_sum(m_ij -> i... dst)

TPU-native design choices (all numerics preserved exactly, see tests):

1. **Hop-invariant flux.** The edge-MLP inputs (x_s, x_d, e_ij) do not change
   across the K hops — only the wet-front mask and ``out`` do. The mask selects
   *which* edges contribute, never their values, so ``s_ij`` is computed ONCE
   per layer and reused for all K hops: a K-fold FLOP cut on the dominant cost
   vs the reference, which re-runs the MLP every hop.
2. **Decomposed first layer.** The first linear over the concatenation
   [x_s_i | x_s_j | x_d_i | x_d_j | e_ij] is computed as node-level matmuls
   (src-part and dst-part projections over N nodes) plus an edge-attr matmul,
   then gathered — fewer FLOPs than an [E, 5F] x [5F, H] matmul whenever
   E > N, and the matmuls are MXU-shaped.
3. **Masked-dense wet front.** The reference compacts active edges (dynamic
   shapes); here every edge is computed and inactive messages are multiplied
   by 0 — static shapes, identical values.
4. **Static node ranges.** For multiscale use the caller passes the scale's
   static node slice so per-hop filter matmuls and updates touch only that
   scale's rows (zero rows elsewhere are provably unaffected).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mswe_gnn_tpu.models.mlp import (
    apply_linear,
    apply_mlp,
    init_linear,
    init_mlp,
    matmul,
)
from mswe_gnn_tpu.ops.segment import segment_sum


@dataclasses.dataclass(frozen=True)
class SWEGNNConfig:
    """Static hyperparameters of one SWEGNN layer
    (mirrors reference models/gnn.py:363-384)."""
    static_node_features: int
    dynamic_node_features: int
    edge_features: int
    K: int = 2
    normalize: bool = True
    with_filter_matrix: bool = True
    with_gradient: bool = True
    upwind_mode: bool = False
    mlp_layers: int = 2          # reference `n_layers` mlp kwarg
    mlp_activation: str = "prelu"
    mlp_bias: bool = True
    compute_dtype: str = "float32"   # 'bfloat16' = MXU-rate matmuls + half-width hop traffic
    use_pallas: bool = False         # fused VMEM-resident hop kernel (ops/pallas_hop.py)

    @property
    def edge_input_size(self) -> int:
        return self.edge_features + 2 * self.static_node_features + 2 * self.dynamic_node_features

    @property
    def edge_output_size(self) -> int:
        return self.dynamic_node_features

    @property
    def edge_hidden_size(self) -> int:
        return self.edge_output_size * 2


def init_swegnn(key, cfg: SWEGNNConfig) -> dict:
    k_mlp, k_filter = jax.random.split(key)
    params = {
        "edge_mlp": init_mlp(
            k_mlp,
            cfg.edge_input_size,
            cfg.edge_output_size,
            hidden_size=cfg.edge_hidden_size,
            n_layers=cfg.mlp_layers,
            bias=cfg.mlp_bias,
            activation=cfg.mlp_activation,
        )
    }
    if cfg.with_filter_matrix:
        keys = jax.random.split(k_filter, cfg.K + 1)
        params["filters"] = [
            init_linear(k, cfg.dynamic_node_features, cfg.dynamic_node_features, bias=False)
            for k in keys
        ]
    return params


def _edge_flux(
    params: dict,
    cfg: SWEGNNConfig,
    x_s: jax.Array,
    x_d: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    edge_attr: Optional[jax.Array],
    src_range: Optional[Tuple[int, int]] = None,
    dst_range: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """Compute s_ij for every edge (hop-invariant part of the layer).

    First linear decomposed into per-node src/dst projections; remaining MLP
    layers run on the [E, H] edge matrix (MXU matmuls). ``src_range`` /
    ``dst_range`` statically restrict the node projections to the slice the
    edges actually touch (multiscale: one scale per call).
    """
    mlp = params["edge_mlp"]
    lin0 = mlp["layers"][0]
    W = lin0["w"]  # [(2s + 2d + fe), H] in concat order [xs_i, xs_j, xd_i, xd_j, e]
    s, d, fe = cfg.static_node_features, cfg.dynamic_node_features, cfg.edge_features
    W_ss, W_sd = W[:s], W[s: 2 * s]
    W_ds, W_dd = W[2 * s: 2 * s + d], W[2 * s + d: 2 * s + 2 * d]
    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype
    s_lo, s_hi = (0, x_s.shape[0]) if src_range is None else src_range
    d_lo, d_hi = (0, x_s.shape[0]) if dst_range is None else dst_range
    proj_src = (matmul(x_s[s_lo:s_hi], W_ss, cd)
                + matmul(x_d[s_lo:s_hi], W_ds, cd))            # [Ns, H]
    proj_dst = (matmul(x_s[d_lo:d_hi], W_sd, cd)
                + matmul(x_d[d_lo:d_hi], W_dd, cd))            # [Nd, H]
    h = jnp.take(proj_src, src - s_lo, axis=0) + jnp.take(proj_dst, dst - d_lo, axis=0)
    if fe > 0:
        h = h + matmul(edge_attr, W[2 * s + 2 * d:], cd)
    if "b" in lin0:
        h = h + lin0["b"]
    # remaining layers (activation after every linear incl. the first)
    from mswe_gnn_tpu.models.activations import apply_activation

    h = apply_activation(cfg.mlp_activation, mlp["acts"][0], h)
    rest = {
        "layers": mlp["layers"][1:],
        "acts": mlp["acts"][1:],
        "norms": mlp["norms"][1:],
    }
    s_ij = apply_mlp(rest, h, activation=cfg.mlp_activation, compute_dtype=cd)

    if cfg.normalize:
        norm = jnp.linalg.norm(s_ij, axis=-1, keepdims=True)
        s_ij = jnp.where(norm > 0, s_ij / jnp.where(norm > 0, norm, 1.0), 0.0)
    return s_ij


def apply_swegnn(
    params: dict,
    cfg: SWEGNNConfig,
    x_s: jax.Array,
    x_d: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    edge_attr: Optional[jax.Array] = None,
    edge_mask: Optional[jax.Array] = None,
    src_range: Optional[Tuple[int, int]] = None,
    dst_range: Optional[Tuple[int, int]] = None,
    dst_sorted: bool = True,
    agg_table: Optional[jax.Array] = None,
    agg_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """One SWEGNN layer: K hops of learned-flux message passing.

    ``src_range``/``dst_range`` are static node slices containing every edge
    source / destination (multiscale: the scale being processed; un-pooling:
    coarse sources, fine destinations). Per-hop aggregation, filter matmuls
    and updates are restricted to ``dst_range``. The initial filter H_0 is
    always applied to ALL nodes, matching the reference where each scale's
    processor transforms the full node array (reference models/gnn.py:401-404
    called from :304).

    ``agg_table``/``agg_mask`` [hi-lo, D] select the ELL aggregation path:
    per-destination incoming-edge slots (ids local to the edge block passed
    in), replacing the segment-sum scatter with gathers — the fast path on
    TPU for bounded-degree meshes.
    """
    num_nodes = x_d.shape[0]
    lo, hi = (0, num_nodes) if dst_range is None else dst_range
    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype

    if cfg.with_filter_matrix:
        out = apply_linear(params["filters"][0], x_d, compute_dtype=cd)
    else:
        out = x_d

    s_ij = _edge_flux(params, cfg, x_s, x_d, src, dst, edge_attr,
                      src_range=src_range, dst_range=dst_range)
    if edge_mask is not None:
        s_ij = s_ij * edge_mask[:, None]

    if agg_table is not None:
        # Node-major hop loop (the TPU fast path): pre-gather the
        # hop-invariant flux and the neighbor ids into ELL layout ONCE per
        # layer; each hop is then a single data-dependent gather of `out`
        # plus elementwise work and one small matmul — no per-edge
        # intermediates, no scatter.
        s_tab = jnp.take(s_ij, agg_table, axis=0) * agg_mask[..., None]  # [Nd,D,F]
        src_tab = jnp.take(src, agg_table)                               # [Nd,D]
        if cfg.use_pallas:
            from mswe_gnn_tpu.ops.pallas_hop import fused_hop, supported

            if supported(num_nodes, out.shape[1], out.dtype):
                for k in range(cfg.K):
                    agg = fused_hop(out, src_tab, s_tab, lo,
                                    with_gradient=cfg.with_gradient,
                                    upwind=cfg.upwind_mode)
                    if cfg.with_filter_matrix:
                        agg = apply_linear(params["filters"][k + 1], agg,
                                           compute_dtype=cd)
                    if dst_range is None:
                        out = out + agg
                    else:
                        out = out.at[lo:hi].add(agg)
                return out
        if cd is not None:
            # halve hop-loop HBM traffic: flux table and the hop state live
            # in bf16; the filter matmul accumulates back to f32
            s_tab = s_tab.astype(cd)
            out = out.astype(cd)
        for k in range(cfg.K):
            out_dst = out[lo:hi]
            nb = jnp.take(out, src_tab, axis=0)                          # [Nd,D,F]
            # wet-front mask from data already on hand: src activity is
            # (nb row-sum != 0) — no scalar gather (which is very slow on TPU)
            act = jnp.maximum((nb.sum(axis=-1) != 0).astype(out.dtype),
                              (out_dst.sum(axis=1) != 0).astype(out.dtype)[:, None])
            if cfg.with_gradient:
                # hydraulic gradient: out[dst] - out[src] (reference gnn.py:430)
                diff = out_dst[:, None, :] - nb
                if cfg.upwind_mode:
                    diff = jnp.maximum(diff, 0.0)
                msg = diff * s_tab
            else:
                msg = s_tab * nb
            agg = (msg * act[..., None]).sum(axis=1)
            if cfg.with_filter_matrix:
                agg = apply_linear(params["filters"][k + 1], agg, compute_dtype=cd)
            if cd is not None:
                agg = agg.astype(cd)
            if dst_range is None:
                out = out + agg
            else:
                out = out.at[lo:hi].add(agg)
        return out.astype(x_d.dtype) if cd is not None else out

    for k in range(cfg.K):
        # wet-front mask: edges with at least one "active" endpoint
        node_active = (out.sum(axis=1) != 0).astype(out.dtype)
        e_active = jnp.maximum(jnp.take(node_active, src), jnp.take(node_active, dst))

        if cfg.with_gradient:
            grad = jnp.take(out, dst, axis=0) - jnp.take(out, src, axis=0)
            if cfg.upwind_mode:
                grad = jnp.maximum(grad, 0.0)
            msg = grad * s_ij
        else:
            msg = s_ij * jnp.take(out, src, axis=0)

        msg = msg * e_active[:, None]
        agg = segment_sum(
            msg, dst - lo if lo else dst, num_segments=hi - lo,
            indices_are_sorted=dst_sorted,
        )
        if cfg.with_filter_matrix:
            agg = apply_linear(params["filters"][k + 1], agg, compute_dtype=cd)
        if dst_range is None:
            out = out + agg
        else:
            out = out.at[lo:hi].add(agg)
    return out
