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
from mswe_gnn_tpu.models.mlp import apply_linear
from mswe_gnn_tpu.models.swegnn import (
    SWEGNNConfig,
    apply_swegnn_block,
    init_swegnn,
)
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
    flat_hop_threshold: int = 0  # see SWEGNNConfig.flat_hop_threshold

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
            flat_hop_threshold=self.flat_hop_threshold,
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


def _pool_block(params, cfg: MSGNNConfig, x_fine, coarse_feats, fine_local,
                coarse_local, intra_mask, n_coarse,
                pool_table=None, pool_mask=None, pool_src=None):
    """Mean-pool fine-block features onto the coarse block over transfer edges
    (reference models/gnn.py:242-257). Nodes that receive nothing become zero.

    ``coarse_feats`` is only used for learned pooling: the coarse rows as the
    reference's pooling MLP sees them (post-processor, i.e. H_0-transformed).
    ``pool_table``/``pool_mask`` [n_coarse, D] (ids local to the transfer-edge
    block) select the gather-based ELL path."""
    if cfg.learned_pooling:
        e = jnp.concatenate(
            [jnp.take(x_fine, fine_local, axis=0),
             jnp.take(coarse_feats, coarse_local, axis=0)], -1)
        src_vals = apply_mlp(params["pooling_mlp"], e, activation=cfg.mlp_activation)
    elif pool_src is not None:
        # prepared path: slot source-node ids gather straight from the fine
        # block — no [E_tr, F] edge-major intermediate gather
        sums = jnp.zeros((pool_src.shape[0], x_fine.shape[1]), x_fine.dtype)
        for d in range(pool_src.shape[1]):
            sums = sums + (jnp.take(x_fine, pool_src[:, d], axis=0)
                           * pool_mask[:, d:d + 1])
        cnt = pool_mask.sum(axis=1)
        return jnp.where(cnt[:, None] > 0, sums / jnp.maximum(cnt, 1.0)[:, None], 0.0)
    else:
        src_vals = jnp.take(x_fine, fine_local, axis=0)
    if pool_table is not None:
        # per-slot gathers keep everything [Nc, F] (no [Nc, D, F] intermediate)
        sums = jnp.zeros((pool_table.shape[0], src_vals.shape[1]), src_vals.dtype)
        for d in range(pool_table.shape[1]):
            sums = sums + (jnp.take(src_vals, pool_table[:, d], axis=0)
                           * pool_mask[:, d:d + 1])
        cnt = pool_mask.sum(axis=1)
        return jnp.where(cnt[:, None] > 0, sums / jnp.maximum(cnt, 1.0)[:, None], 0.0)
    return segment_mean(src_vals, coarse_local, num_segments=n_coarse,
                        weights=intra_mask)


def apply_msgnn(params: dict, cfg: MSGNNConfig, graph: FloodGraph) -> jax.Array:
    """Multiscale forward pass on one (unbatched) graph -> [N, 2] predictions.

    Mirrors reference models/gnn.py:267-350 but carries the V-cycle state as
    *per-scale blocks*: each processor, pooling and un-pooling call touches
    only its scale's [N_scale, F] arrays — no full-graph dynamic-update-slice
    copies per hop. Equivalence with the reference's full-array semantics:
    the reference zeroes every non-coarse row at each pooling step
    (models/gnn.py:242-257 output "replaces x entirely"), the filter H_0 is
    bias-free (zero rows stay zero), and rows of already-visited scales are
    never read again — so transforming them is dead computation the block
    form simply omits (verified by the golden checkpoint tests).
    """
    spec: GraphSpec = graph.spec
    L = cfg.num_scales
    assert spec.num_scales == L, f"graph has {spec.num_scales} scales, model expects {L}"
    node_ptr = spec.node_ptr

    x = jnp.concatenate([graph.x_static, graph.x_dynamic], axis=-1)
    x0 = x
    cache = graph.ell_cache  # loop-invariant tables/encodings (models/prepare.py)
    edge_attr = graph.edge_attr
    if cfg.edge_mlp and cache is None:
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

    ks = cfg.k_schedule
    has_tables = graph.in_edge_table is not None
    edge_ptr = spec.edge_ptr
    intra_ptr = spec.intra_edge_ptr

    # per-scale blocks — the V-cycle carry
    xs_b = [x_s[spec.node_slice(i)] for i in range(L)]
    xd_b = [x_d[spec.node_slice(i)] for i in range(L)]
    zeros_b = [jnp.zeros_like(b) for b in xd_b]
    x_down_b = [None] * L
    x_up_b = [None] * L

    def scale_edges(i):
        """Edge endpoints local to scale i's node block."""
        sl = spec.edge_slice(i)
        return (graph.edge_index[0, sl] - node_ptr[i],
                graph.edge_index[1, sl] - node_ptr[i],
                edge_attr[sl], graph.edge_mask[sl])

    _agg_cache = {}

    def scale_agg(i):
        """ELL table rows for scale i (edge ids rebased to the scale block)
        plus the slot-gathered encoded edge attrs and slot source-node ids —
        read from the prepared cache (rollouts), else computed once per scale
        per forward and shared by the scale's two processor layers."""
        if not has_tables:
            return None, None, None, None
        if cache is not None:
            tab, msk, srcs, ea_slots = cache["scales"][i]
            return tab, msk, list(ea_slots), srcs
        if i not in _agg_cache:
            nsl = spec.node_slice(i)
            tab = jnp.maximum(graph.in_edge_table[nsl] - edge_ptr[i], 0)
            ea = edge_attr[spec.edge_slice(i)]
            ea_slots = [jnp.take(ea, tab[:, d], axis=0)
                        for d in range(tab.shape[1])]
            _agg_cache[i] = (tab, graph.in_edge_mask[nsl], ea_slots, None)
        return _agg_cache[i]

    def scale_band(i):
        """Banded MXU-hop plan for scale i (ops/band_hop.py), if attached."""
        if graph.band_plan is None or graph.band_meta is None:
            return None, None
        return graph.band_plan["scales"][i], graph.band_meta[i]

    def intra_edges(lvl):
        """(coarse, fine) transfer endpoints, local to their scale blocks
        (rows = (coarse, fine) as in the reference, models/gnn.py:310)."""
        sl = spec.intra_edge_slice(lvl)
        return (graph.intra_edge_index[0, sl] - node_ptr[lvl + 1],
                graph.intra_edge_index[1, sl] - node_ptr[lvl],
                graph.intra_edge_mask[sl])

    # --- downsweep: fine -> coarse, skipping the coarsest scale
    for i in range(L - 1):
        src, dst, ea, em = scale_edges(i)
        tab, tmask, easl, srcs = scale_agg(i)
        pcfg = cfg.processor_cfg(ks[i])
        proc = params["gnn_processor"][i]
        bp, bw = scale_band(i)
        xd_b[i] = apply_swegnn_block(proc, pcfg,
                                     xs_b[i], xd_b[i], xs_b[i], xd_b[i],
                                     src, dst, edge_attr=ea, edge_mask=em,
                                     same_block=True,
                                     agg_table=tab, agg_mask=tmask,
                                     ea_slots=easl, src_slot_table=srcs,
                                     band_plan=bp, band_w=bw,
                                     sub_blocks=graph.num_graphs)
        x_down_b[i] = xd_b[i]
        coarse, fine, imask = intra_edges(i)
        if cfg.learned_pooling:
            # the reference's pooling MLP reads the coarse rows *after* the
            # processor applied H_0 to the full array (models/gnn.py:304)
            coarse_feats = xd_b[i + 1]
            if pcfg.with_filter_matrix:
                coarse_feats = apply_linear(proc["filters"][0], coarse_feats)
        else:
            coarse_feats = None
        psrc = None
        if cache is not None:
            psrc, pmask = cache["pools"][i]
            ptab = None
        elif has_tables:
            csl = spec.node_slice(i + 1)
            ptab = jnp.maximum(graph.pool_table[csl] - intra_ptr[i], 0)
            pmask = graph.pool_mask[csl]
        else:
            ptab = pmask = None
        pooled = _pool_block(params, cfg, xd_b[i], coarse_feats, fine, coarse,
                             imask, n_coarse=xd_b[i + 1].shape[0],
                             pool_table=ptab, pool_mask=pmask,
                             pool_src=psrc)
        # pooling replaces the state: every non-coarse scale becomes zero
        for j in range(L):
            xd_b[j] = zeros_b[j]
        xd_b[i + 1] = pooled

    x_down_b[L - 1] = xd_b[L - 1]

    # --- upsweep: coarse -> fine
    for i in range(L):
        scale = L - 1 - i
        gnn_id = L - 1 + i
        src, dst, ea, em = scale_edges(scale)
        tab, tmask, easl, srcs = scale_agg(scale)
        bp, bw = scale_band(scale)
        xd_b[scale] = apply_swegnn_block(params["gnn_processor"][gnn_id],
                                         cfg.processor_cfg(ks[gnn_id]),
                                         xs_b[scale], xd_b[scale],
                                         xs_b[scale], xd_b[scale],
                                         src, dst, edge_attr=ea, edge_mask=em,
                                         same_block=True,
                                         agg_table=tab, agg_mask=tmask,
                                         ea_slots=easl, src_slot_table=srcs,
                                         band_plan=bp, band_w=bw,
                                         sub_blocks=graph.num_graphs)
        x_up_b[scale] = xd_b[scale]

        if i < L - 1:
            lvl = scale - 1  # transfer level between scales lvl (fine) and scale
            coarse, fine, imask = intra_edges(lvl)
            usrc = None
            if cache is not None:
                utab, umask, usrc = cache["unpools"][lvl]
            elif has_tables:
                fsl_ = spec.node_slice(lvl)
                utab = jnp.maximum(graph.unpool_table[fsl_] - intra_ptr[lvl], 0)
                umask = graph.unpool_mask[fsl_]
            else:
                utab = umask = None
            # messages flow coarse -> fine (src=coarse, dst=fine)
            xd_b[lvl] = apply_swegnn_block(params["intra_scale_gnn"][i],
                                           cfg.intra_cfg(),
                                           xs_b[scale], xd_b[scale],
                                           xs_b[lvl], xd_b[lvl],
                                           coarse, fine, edge_attr=None,
                                           edge_mask=imask, same_block=False,
                                           dst_sorted=False,
                                           agg_table=utab, agg_mask=umask,
                                           src_slot_table=usrc,
                                           sub_blocks=graph.num_graphs)
            if cfg.skip_connections:
                xd_b[lvl] = xd_b[lvl] + x_down_b[lvl]

    h = jnp.concatenate(x_up_b, axis=0)
    if cfg.gnn_activation is not None:
        h = apply_activation(cfg.gnn_activation, params["gnn_act"], h)

    out = apply_mlp(params["node_decoder"], h, activation=cfg.mlp_activation)
    out = out + base_model.add_residual_connection(
        x0, params.get("residual_weights"), cfg.learned_residuals,
        cfg.previous_t, cfg.out_dim)
    out = jax.nn.relu(out)
    out = base_model.mask_small_wd(out, epsilon=0.0001)
    return out * graph.node_mask[:, None]
