"""MSGNN — multi-scale flood GNN with a U-Net-style V-cycle over mesh scales.

Functional re-design of the reference ``MSGNN`` (reference models/gnn.py:154-350).
The reference slices edges at runtime via ``edge_ptr`` tensors; here every
scale is a *static* contiguous block of the padded scale-major layout
(``GraphSpec``), so each per-scale processor call compiles to static slices —
no host-side ptr surgery, no dynamic shapes.

V-cycle (scales ordered finest=0 ... coarsest=L-1):
  downsweep  i = 0..L-2 : SWEGNN on scale-i edges, save scale-i rows,
                          mean-pool to scale i+1 over transfer edges
  upsweep    i = 0..L-1 : SWEGNN on scale (L-1-i) edges, save those rows,
                          un-pool coarse->fine with an edge-feature-less
                          SWEGNN over transfer edges, add skip connections
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from mswe_gnn_tpu import NUM_WATER_VARS
from mswe_gnn_tpu.graph import FloodGraph, GraphSpec
from mswe_gnn_tpu.models import base as base_model
from mswe_gnn_tpu.models.activations import apply_activation, init_activation
from mswe_gnn_tpu.models.mlp import apply_mlp, init_mlp
from mswe_gnn_tpu.models.swegnn import SWEGNNConfig, apply_swegnn, init_swegnn
from mswe_gnn_tpu.ops.segment import segment_mean


@dataclasses.dataclass(frozen=True)
class MSGNNConfig:
    """Static hyperparameters (reference models/gnn.py:181-240)."""
    num_node_features: int
    num_edge_features: int
    num_scales: int
    hid_features: int = 32
    K: Union[int, Tuple[int, ...]] = 2
    mlp_layers: int = 2
    mlp_activation: str = "prelu"
    gnn_activation: Optional[str] = "tanh"
    learned_pooling: bool = False
    skip_connections: bool = True
    with_WL: bool = False
    normalize: bool = True
    with_filter_matrix: bool = True
    edge_mlp: bool = True
    with_gradient: bool = True
    # base-model options
    previous_t: int = 1
    learned_residuals: object = None
    residuals_base: float = 2.0
    residual_init: str = "exp"
    compute_dtype: str = "float32"
    use_pallas: bool = False

    @property
    def out_dim(self) -> int:
        return NUM_WATER_VARS

    @property
    def dynamic_node_features(self) -> int:
        return self.previous_t * NUM_WATER_VARS

    @property
    def static_node_features(self) -> int:
        return self.num_node_features - self.dynamic_node_features + int(self.with_WL)

    @property
    def k_schedule(self) -> Tuple[int, ...]:
        """Per-processor K hops: per-scale list mirrored for the upsweep
        (reference models/gnn.py:198-200)."""
        ks = [self.K] * self.num_scales if isinstance(self.K, int) else list(self.K)
        full = ks + ks[::-1][1:]
        assert len(full) == self.num_scales * 2 - 1
        return tuple(full)

    def processor_cfg(self, K: int) -> SWEGNNConfig:
        fe = self.hid_features if self.edge_mlp else self.num_edge_features
        return SWEGNNConfig(
            static_node_features=self.hid_features,
            dynamic_node_features=self.hid_features,
            edge_features=fe,
            K=K,
            normalize=self.normalize,
            with_filter_matrix=self.with_filter_matrix,
            with_gradient=self.with_gradient,
            mlp_layers=self.mlp_layers,
            mlp_activation=self.mlp_activation,
            mlp_bias=True,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
        )

    def intra_cfg(self) -> SWEGNNConfig:
        """Un-pooling GNN: no edge features, K=1, no filter, no gradient
        (reference models/gnn.py:216-220)."""
        return SWEGNNConfig(
            static_node_features=self.hid_features,
            dynamic_node_features=self.hid_features,
            edge_features=0,
            K=1,
            normalize=True,
            with_filter_matrix=False,
            with_gradient=False,
            mlp_layers=self.mlp_layers,
            mlp_activation=self.mlp_activation,
            mlp_bias=True,
            compute_dtype=self.compute_dtype,
            use_pallas=self.use_pallas,
        )


def init_msgnn(key, cfg: MSGNNConfig) -> dict:
    n_proc = cfg.num_scales * 2 - 1
    keys = jax.random.split(key, 7 + n_proc + cfg.num_scales)
    h = cfg.hid_features
    params = {}
    if cfg.edge_mlp:
        params["edge_encoder"] = init_mlp(
            keys[0], cfg.num_edge_features, h, h,
            n_layers=cfg.mlp_layers, bias=True, activation=cfg.mlp_activation)
    params["dynamic_node_encoder"] = init_mlp(
        keys[1], cfg.dynamic_node_features, h, h,
        n_layers=cfg.mlp_layers, bias=False, activation=cfg.mlp_activation)
    params["static_node_encoder"] = init_mlp(
        keys[2], cfg.static_node_features, h, h,
        n_layers=cfg.mlp_layers, bias=True, activation=cfg.mlp_activation)

    params["intra_scale_gnn"] = [
        init_swegnn(keys[3 + i], cfg.intra_cfg()) for i in range(cfg.num_scales - 1)
    ]
    if cfg.learned_pooling:
        params["pooling_mlp"] = init_mlp(
            keys[3 + cfg.num_scales], h * 2, h, h,
            n_layers=cfg.mlp_layers, bias=False, activation=cfg.mlp_activation)

    params["gnn_processor"] = [
        init_swegnn(keys[4 + cfg.num_scales + i], cfg.processor_cfg(K))
        for i, K in enumerate(cfg.k_schedule)
    ]
    params["gnn_act"] = init_activation(cfg.gnn_activation)
    params["node_decoder"] = init_mlp(
        keys[4 + cfg.num_scales + n_proc], h, cfg.out_dim, h,
        n_layers=cfg.mlp_layers, bias=False, activation=cfg.mlp_activation)

    rw = base_model.init_residual_weights(
        keys[5 + cfg.num_scales + n_proc], cfg.learned_residuals, cfg.previous_t,
        cfg.residuals_base, cfg.residual_init, cfg.out_dim)
    if rw is not None:
        params["residual_weights"] = rw
    return params


def _pool(params, cfg: MSGNNConfig, x, intra_src_fine, intra_dst_coarse,
          intra_mask, coarse_range, pool_table=None, pool_mask=None):
    """Mean-pool fine features onto coarse nodes over transfer edges
    (reference models/gnn.py:242-257). Output replaces x entirely: nodes that
    receive nothing become zero.

    When ``pool_table``/``pool_mask`` [n_coarse, D] are given (ids local to
    the transfer-edge block), the mean uses the gather-based ELL path."""
    n = x.shape[0]
    lo, hi = coarse_range
    if cfg.learned_pooling:
        e = jnp.concatenate(
            [jnp.take(x, intra_src_fine, axis=0), jnp.take(x, intra_dst_coarse, axis=0)], -1)
        e = apply_mlp(params["pooling_mlp"], e, activation=cfg.mlp_activation)
        src_vals = e
    else:
        src_vals = jnp.take(x, intra_src_fine, axis=0)
    if pool_table is not None:
        gathered = jnp.take(src_vals, pool_table, axis=0)        # [Nc, D, F]
        sums = (gathered * pool_mask[..., None]).sum(axis=1)
        cnt = pool_mask.sum(axis=1)
        pooled = jnp.where(cnt[:, None] > 0, sums / jnp.maximum(cnt, 1.0)[:, None], 0.0)
    else:
        pooled = segment_mean(src_vals, intra_dst_coarse - lo, num_segments=hi - lo,
                              weights=intra_mask)
    return jnp.zeros_like(x).at[lo:hi].set(pooled)


def apply_msgnn(params: dict, cfg: MSGNNConfig, graph: FloodGraph) -> jax.Array:
    """Multiscale forward pass on one (unbatched) graph -> [N, 2] predictions.

    Mirrors reference models/gnn.py:267-350 with static per-scale slices.
    """
    spec: GraphSpec = graph.spec
    L = cfg.num_scales
    assert spec.num_scales == L, f"graph has {spec.num_scales} scales, model expects {L}"
    node_ptr = spec.node_ptr

    x = jnp.concatenate([graph.x_static, graph.x_dynamic], axis=-1)
    x0 = x
    edge_attr = graph.edge_attr
    if cfg.edge_mlp:
        edge_attr = apply_mlp(params["edge_encoder"], edge_attr,
                              activation=cfg.mlp_activation)

    n_s = cfg.static_node_features - int(cfg.with_WL)
    x_s = x[:, :n_s]
    x_d = x[:, n_s:]
    if cfg.with_WL:
        wl = x_s[:, -1] + x_d[:, -cfg.out_dim]
        x_s = jnp.concatenate([x_s, wl[:, None]], axis=-1)

    x_s = apply_mlp(params["static_node_encoder"], x_s, activation=cfg.mlp_activation)
    x_d = apply_mlp(params["dynamic_node_encoder"], x_d, activation=cfg.mlp_activation)

    x_down = jnp.zeros_like(x_d)
    x_up = jnp.zeros_like(x_d)
    ks = cfg.k_schedule

    has_tables = graph.in_edge_table is not None
    edge_ptr = spec.edge_ptr
    intra_ptr = spec.intra_edge_ptr

    def scale_edges(i):
        sl = spec.edge_slice(i)
        return (graph.edge_index[0, sl], graph.edge_index[1, sl],
                edge_attr[sl], graph.edge_mask[sl])

    def scale_agg(i):
        """ELL table rows for scale i, edge ids rebased to the scale block."""
        if not has_tables:
            return None, None
        nsl = spec.node_slice(i)
        tab = jnp.maximum(graph.in_edge_table[nsl] - edge_ptr[i], 0)
        return tab, graph.in_edge_mask[nsl]

    def intra_edges(lvl):
        sl = spec.intra_edge_slice(lvl)
        # rows = (coarse, fine) as in the reference (models/gnn.py:310)
        return (graph.intra_edge_index[0, sl], graph.intra_edge_index[1, sl],
                graph.intra_edge_mask[sl])

    # --- downsweep: fine -> coarse, skipping the coarsest scale
    for i in range(L - 1):
        src, dst, ea, em = scale_edges(i)
        rng = (node_ptr[i], node_ptr[i + 1])
        tab, tmask = scale_agg(i)
        x_d = apply_swegnn(params["gnn_processor"][i], cfg.processor_cfg(ks[i]),
                           x_s, x_d, src, dst, edge_attr=ea, edge_mask=em,
                           src_range=rng, dst_range=rng,
                           agg_table=tab, agg_mask=tmask)
        # save scale-i rows before pooling overwrites them
        sl = spec.node_slice(i)
        x_down = x_down.at[sl].add(x_d[sl])
        coarse, fine, imask = intra_edges(i)
        if has_tables:
            csl = spec.node_slice(i + 1)
            ptab = jnp.maximum(graph.pool_table[csl] - intra_ptr[i], 0)
            pmask = graph.pool_mask[csl]
        else:
            ptab = pmask = None
        x_d = _pool(params, cfg, x_d, fine, coarse, imask,
                    coarse_range=(node_ptr[i + 1], node_ptr[i + 2]),
                    pool_table=ptab, pool_mask=pmask)

    x_down = x_down + x_d

    # --- upsweep: coarse -> fine
    for i in range(L):
        scale = L - 1 - i
        gnn_id = L - 1 + i
        src, dst, ea, em = scale_edges(scale)
        rng = (node_ptr[scale], node_ptr[scale + 1])
        tab, tmask = scale_agg(scale)
        x_d = apply_swegnn(params["gnn_processor"][gnn_id],
                           cfg.processor_cfg(ks[gnn_id]),
                           x_s, x_d, src, dst, edge_attr=ea, edge_mask=em,
                           src_range=rng, dst_range=rng,
                           agg_table=tab, agg_mask=tmask)
        sl = spec.node_slice(scale)
        x_up = x_up.at[sl].add(x_d[sl])

        if i < L - 1:
            lvl = scale - 1  # transfer level between scales lvl (fine) and scale
            coarse, fine, imask = intra_edges(lvl)
            if has_tables:
                fsl_ = spec.node_slice(lvl)
                utab = jnp.maximum(graph.unpool_table[fsl_] - intra_ptr[lvl], 0)
                umask = graph.unpool_mask[fsl_]
            else:
                utab = umask = None
            # messages flow coarse -> fine (src=coarse, dst=fine)
            x_d = apply_swegnn(params["intra_scale_gnn"][i], cfg.intra_cfg(),
                               x_s, x_d, coarse, fine, edge_attr=None,
                               edge_mask=imask,
                               src_range=(node_ptr[scale], node_ptr[scale + 1]),
                               dst_range=(node_ptr[lvl], node_ptr[lvl + 1]),
                               dst_sorted=False,
                               agg_table=utab, agg_mask=umask)
            if cfg.skip_connections:
                fsl = spec.node_slice(lvl)
                x_d = x_d.at[fsl].add(x_down[fsl])

    h = x_up
    if cfg.gnn_activation is not None:
        h = apply_activation(cfg.gnn_activation, params["gnn_act"], h)

    out = apply_mlp(params["node_decoder"], h, activation=cfg.mlp_activation)
    out = out + base_model.add_residual_connection(
        x0, params.get("residual_weights"), cfg.learned_residuals,
        cfg.previous_t, cfg.out_dim)
    out = jax.nn.relu(out)
    out = base_model.mask_small_wd(out, epsilon=0.0001)
    return out * graph.node_mask[:, None]
