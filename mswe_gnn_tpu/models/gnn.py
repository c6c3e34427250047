"""Single-scale flood GNN: encoder -> K-hop processor -> decoder.

Functional re-design of the reference ``GNN`` model
(reference models/gnn.py:13-152). Static configuration lives in ``GNNConfig``;
parameters are a plain pytree produced by ``init_gnn``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mswe_gnn_tpu import NUM_WATER_VARS
from mswe_gnn_tpu.graph import FloodGraph
from mswe_gnn_tpu.models import base as base_model
from mswe_gnn_tpu.models.activations import apply_activation, init_activation
from mswe_gnn_tpu.models.convs import (
    ChebConfig, GATConfig, TAGConfig,
    apply_cheb, apply_gat, apply_tag,
    init_cheb, init_gat, init_tag,
)
from mswe_gnn_tpu.models.mlp import apply_mlp, init_mlp
from mswe_gnn_tpu.models.swegnn import SWEGNNConfig, apply_swegnn, init_swegnn


@dataclasses.dataclass(frozen=True)
class GNNConfig:
    """Static hyperparameters (reference models/gnn.py:39-83 plus base-model
    kwargs models/models.py:21-48)."""
    num_node_features: int          # static + dynamic input columns of x
    num_edge_features: int
    hid_features: int = 32
    K: int = 2
    n_gnn_layers: int = 2
    type_gnn: str = "SWEGNN"        # 'SWEGNN' | 'GNN_L' | 'GNN_A' | 'GAT'
    mlp_layers: int = 1
    mlp_activation: str = "prelu"
    gnn_activation: Optional[str] = "prelu"
    dropout: float = 0.0
    with_WL: bool = True
    normalize: bool = True
    with_filter_matrix: bool = True
    edge_mlp: bool = True
    with_gradient: bool = True
    # base-model options
    previous_t: int = 1
    learned_residuals: object = None   # True | 'all' | False | None
    residuals_base: float = 2.0
    residual_init: str = "exp"
    compute_dtype: str = "float32"
    use_pallas: bool = False

    @property
    def out_dim(self) -> int:
        return NUM_WATER_VARS

    @property
    def dynamic_node_features(self) -> int:
        return self.previous_t * self.out_dim

    @property
    def static_node_features(self) -> int:
        # matches reference models/gnn.py:53 (WL adds one static column)
        return self.num_node_features - self.dynamic_node_features + int(self.with_WL)

    def swegnn_cfg(self) -> SWEGNNConfig:
        fe = self.hid_features if self.edge_mlp else self.num_edge_features
        return SWEGNNConfig(
            static_node_features=self.hid_features,
            dynamic_node_features=self.hid_features,
            edge_features=fe,
            K=self.K,
            normalize=self.normalize,
            with_filter_matrix=self.with_filter_matrix,
            with_gradient=self.with_gradient,
            mlp_layers=self.mlp_layers,
            mlp_activation=self.mlp_activation,
            mlp_bias=True,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
        )


def init_gnn(key, cfg: GNNConfig) -> dict:
    keys = jax.random.split(key, 6 + cfg.n_gnn_layers)
    params = {}
    h = cfg.hid_features

    if cfg.type_gnn == "SWEGNN":
        if cfg.edge_mlp:
            params["edge_encoder"] = init_mlp(
                keys[0], cfg.num_edge_features, h, h,
                n_layers=cfg.mlp_layers, bias=True, activation=cfg.mlp_activation)
        params["dynamic_node_encoder"] = init_mlp(
            keys[1], cfg.dynamic_node_features, h, h,
            n_layers=cfg.mlp_layers, bias=False, activation=cfg.mlp_activation)
        # static encoder is fixed at 2 layers in the reference (models/gnn.py:66-68)
        params["static_node_encoder"] = init_mlp(
            keys[2], cfg.static_node_features, h, h,
            n_layers=2, bias=True, activation=cfg.mlp_activation)
    else:
        params["node_encoder"] = init_mlp(
            keys[1], cfg.num_node_features + int(cfg.with_WL), h, h,
            n_layers=cfg.mlp_layers, bias=True, activation=cfg.mlp_activation)

    convs = []
    for li in range(cfg.n_gnn_layers):
        k = keys[3 + li]
        if cfg.type_gnn == "SWEGNN":
            convs.append(init_swegnn(k, cfg.swegnn_cfg()))
        elif cfg.type_gnn == "GNN_L":
            convs.append(init_cheb(k, ChebConfig(h, h, cfg.K)))
        elif cfg.type_gnn == "GNN_A":
            convs.append(init_tag(k, TAGConfig(h, h, cfg.K)))
        elif cfg.type_gnn == "GAT":
            convs.append(init_gat(k, GATConfig(h, h)))
        else:
            raise ValueError(f"unknown type_gnn {cfg.type_gnn!r}")
    params["gnn_processor"] = convs
    params["gnn_act"] = init_activation(cfg.gnn_activation)

    params["node_decoder"] = init_mlp(
        keys[3 + cfg.n_gnn_layers], h, cfg.out_dim, h,
        n_layers=cfg.mlp_layers, bias=False, activation=cfg.mlp_activation)

    rw = base_model.init_residual_weights(
        keys[4 + cfg.n_gnn_layers], cfg.learned_residuals, cfg.previous_t,
        cfg.residuals_base, cfg.residual_init, cfg.out_dim)
    if rw is not None:
        params["residual_weights"] = rw
    return params


def _split_and_encode(params, cfg, x):
    """Common encoder path: split static/dynamic, add WL, run encoders.

    Mirrors reference models/gnn.py:112-125.
    """
    n_s = cfg.static_node_features - int(cfg.with_WL)
    x_s = x[:, :n_s]
    x_d = x[:, n_s:]
    if cfg.with_WL:
        # water level = DEM (last static col) + h of the last input step
        wl = x_s[:, -1] + x_d[:, -cfg.out_dim]
        x_s = jnp.concatenate([x_s, wl[:, None]], axis=-1)
    return x_s, x_d


def apply_gnn(params: dict, cfg: GNNConfig, graph: FloodGraph) -> jax.Array:
    """Forward pass on one (unbatched) graph; batch via ``jax.vmap``.

    Returns [N, 2] predictions of (h, |q|) at the next step.
    """
    x = jnp.concatenate([graph.x_static, graph.x_dynamic], axis=-1)
    x0 = x
    src, dst = graph.src, graph.dst
    edge_attr = graph.edge_attr
    emask = graph.edge_mask

    cache = graph.ell_cache  # loop-invariant tables/encodings (models/prepare.py)
    if cfg.type_gnn == "SWEGNN" and cfg.edge_mlp and cache is None:
        edge_attr = apply_mlp(params["edge_encoder"], edge_attr,
                              activation=cfg.mlp_activation)

    x_s, x_d = _split_and_encode(params, cfg, x)

    if cfg.type_gnn == "SWEGNN":
        x_s = apply_mlp(params["static_node_encoder"], x_s, activation=cfg.mlp_activation)
        x_d = apply_mlp(params["dynamic_node_encoder"], x_d, activation=cfg.mlp_activation)
        h = x_d
    else:
        h = apply_mlp(params["node_encoder"], jnp.concatenate([x_s, x_d], -1),
                      activation=cfg.mlp_activation)

    for conv in params["gnn_processor"]:
        if cfg.type_gnn == "SWEGNN":
            if cache is not None:
                tab, tmask, srcs, easl = cache["scales"][0]
                bp = (graph.band_plan["scales"][0]
                      if graph.band_plan is not None else None)
                bw = graph.band_meta[0] if graph.band_meta is not None else None
                h = apply_swegnn(conv, cfg.swegnn_cfg(), x_s, x_d, src, dst,
                                 edge_mask=emask, agg_table=tab,
                                 agg_mask=tmask, ea_slots=list(easl),
                                 src_slot_table=srcs,
                                 band_plan=bp, band_w=bw,
                                 sub_blocks=graph.num_graphs)
            else:
                h = apply_swegnn(conv, cfg.swegnn_cfg(), x_s, x_d, src, dst,
                                 edge_attr=edge_attr, edge_mask=emask,
                                 agg_table=graph.in_edge_table,
                                 agg_mask=graph.in_edge_mask,
                                 sub_blocks=graph.num_graphs)
        elif cfg.type_gnn == "GNN_L":
            h = apply_cheb(conv, ChebConfig(cfg.hid_features, cfg.hid_features, cfg.K),
                           h, src, dst, emask)
        elif cfg.type_gnn == "GNN_A":
            h = apply_tag(conv, TAGConfig(cfg.hid_features, cfg.hid_features, cfg.K),
                          h, src, dst, emask)
        elif cfg.type_gnn == "GAT":
            h = apply_gat(conv, GATConfig(cfg.hid_features, cfg.hid_features),
                          h, src, dst, emask)
        if cfg.gnn_activation is not None:
            h = apply_activation(cfg.gnn_activation, params["gnn_act"], h)
        x_d = h

    out = apply_mlp(params["node_decoder"], h, activation=cfg.mlp_activation,
                    dropout=cfg.dropout)

    out = out + base_model.add_residual_connection(
        x0, params.get("residual_weights"), cfg.learned_residuals,
        cfg.previous_t, cfg.out_dim)
    out = jax.nn.relu(out)
    out = base_model.mask_small_wd(out, epsilon=0.0001)
    # zero padded nodes so downstream losses/metrics never see them
    return out * graph.node_mask[:, None]
