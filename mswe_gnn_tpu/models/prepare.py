"""Hoist loop-invariant graph work out of the rollout scan.

Inside a ``lax.scan`` rollout every step re-executes the whole forward —
including computations that depend only on (params, graph topology), never on
the step: the encoded edge features, the slot-gathered edge features, and the
integer slot-source tables derived from ``in_edge_table``/``edge_index``. XLA
does not hoist these out of the compiled while loop (profiled on a dk15-class
mesh: the s32 index gathers alone cost 154 us x 8 per step, ~20% of the
rollout; slot-encoded edge features a similar amount).

``prepare_graph`` computes them once and stores them on
``FloodGraph.ell_cache``; the model forwards read the cache when present.
Numerics are identical — the same operations run, once instead of T times.
"""
from __future__ import annotations

import jax.numpy as jnp

from mswe_gnn_tpu.graph import FloodGraph
from mswe_gnn_tpu.models.mlp import apply_mlp


def _slot_sources(src_local: jnp.ndarray, tab: jnp.ndarray) -> jnp.ndarray:
    """[E_local] src ids + [N, D] slot->edge table -> [N, D] slot->src-node."""
    return jnp.stack([jnp.take(src_local, tab[:, d])
                      for d in range(tab.shape[1])], axis=1)


def _msgnn_cache(params: dict, cfg, graph: FloodGraph) -> dict:
    spec = graph.spec
    L = cfg.num_scales
    edge_attr = graph.edge_attr
    if cfg.edge_mlp:
        edge_attr = apply_mlp(params["edge_encoder"], edge_attr,
                              activation=cfg.mlp_activation)
    scales = []
    for i in range(L):
        nsl = spec.node_slice(i)
        esl = spec.edge_slice(i)
        tab = jnp.maximum(graph.in_edge_table[nsl] - spec.edge_ptr[i], 0)
        src_local = graph.edge_index[0, esl] - spec.node_ptr[i]
        ea = edge_attr[esl]
        ea_slots = tuple(jnp.take(ea, tab[:, d], axis=0)
                         for d in range(tab.shape[1]))
        scales.append((tab, graph.in_edge_mask[nsl],
                       _slot_sources(src_local, tab), ea_slots))
    pools, unpools = [], []
    for lvl in range(L - 1):
        isl = spec.intra_edge_slice(lvl)
        fine_local = graph.intra_edge_index[1, isl] - spec.node_ptr[lvl]
        coarse_local = graph.intra_edge_index[0, isl] - spec.node_ptr[lvl + 1]
        csl = spec.node_slice(lvl + 1)
        ptab = jnp.maximum(graph.pool_table[csl] - spec.intra_edge_ptr[lvl], 0)
        pools.append((_slot_sources(fine_local, ptab), graph.pool_mask[csl]))
        fsl = spec.node_slice(lvl)
        utab = jnp.maximum(graph.unpool_table[fsl] - spec.intra_edge_ptr[lvl], 0)
        unpools.append((utab, graph.unpool_mask[fsl],
                        _slot_sources(coarse_local, utab)))
    return {"scales": tuple(scales), "pools": tuple(pools),
            "unpools": tuple(unpools)}


def _gnn_cache(params: dict, cfg, graph: FloodGraph) -> dict:
    edge_attr = graph.edge_attr
    if cfg.edge_mlp:
        edge_attr = apply_mlp(params["edge_encoder"], edge_attr,
                              activation=cfg.mlp_activation)
    tab = graph.in_edge_table
    ea_slots = tuple(jnp.take(edge_attr, tab[:, d], axis=0)
                     for d in range(tab.shape[1]))
    return {"scales": ((tab, graph.in_edge_mask,
                        _slot_sources(graph.edge_index[0], tab), ea_slots),)}


def prepare_graph(params: dict, cfg, graph: FloodGraph) -> FloodGraph:
    """Attach the loop-invariant ELL cache for ``cfg``'s model family.

    No-op (returns the graph unchanged) when a cache is already attached,
    the graph has no ELL tables, or the model type has no cached path.
    """
    if graph.ell_cache is not None or graph.in_edge_table is None:
        return graph
    # avoid import cycles: dispatch on the config class name
    kind = type(cfg).__name__
    if kind == "MSGNNConfig":
        return graph.replace(ell_cache=_msgnn_cache(params, cfg, graph))
    if kind == "GNNConfig" and getattr(cfg, "type_gnn", None) == "SWEGNN":
        return graph.replace(ell_cache=_gnn_cache(params, cfg, graph))
    return graph
