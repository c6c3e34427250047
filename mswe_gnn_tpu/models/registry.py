"""Model registry: name -> (config builder, init, apply).

Replacement for the reference's ``get_model`` factory
(reference utils/miscellaneous.py:15-18) plus config plumbing from
``main.py:60-84``.
"""
from __future__ import annotations


import jax

from mswe_gnn_tpu.models.gnn import GNNConfig, apply_gnn, init_gnn
from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn


def get_model(name: str):
    """Return (config_cls, init_fn, apply_fn) for a model family."""
    if name == "GNN":
        return GNNConfig, init_gnn, apply_gnn
    if name == "MSGNN":
        return MSGNNConfig, init_msgnn, apply_msgnn
    raise ValueError(f"unknown model {name!r}; options: 'GNN', 'MSGNN'")


def build_model(model_cfg: dict, num_node_features: int, num_edge_features: int,
                num_scales: int, previous_t: int, seed: int | None = None):
    """Build (cfg, params, apply) from a config.yaml-style ``models`` dict.

    Accepts the same keys as the reference config (config.yaml:42-58).
    """
    cfg_dict = dict(model_cfg)
    name = cfg_dict.pop("model_type", "MSGNN")
    seed = cfg_dict.pop("seed", seed if seed is not None else 42)
    cfg_cls, init_fn, apply_fn = get_model(name)

    common = dict(
        num_node_features=num_node_features,
        num_edge_features=num_edge_features,
        previous_t=previous_t,
    )
    if name == "MSGNN":
        common["num_scales"] = num_scales
        cfg_dict.pop("n_GNN_layers", None)
        cfg_dict.pop("type_GNN", None)
        cfg_dict.pop("dropout", None)
    else:
        cfg_dict.pop("learned_pooling", None)
        cfg_dict.pop("skip_connections", None)
        if "n_GNN_layers" in cfg_dict:
            common["n_gnn_layers"] = cfg_dict.pop("n_GNN_layers")
        if "type_GNN" in cfg_dict:
            common["type_gnn"] = cfg_dict.pop("type_GNN")

    k = cfg_dict.pop("K", None)
    if k is not None:
        common["K"] = tuple(k) if isinstance(k, (list, tuple)) else k

    cfg = cfg_cls(**common, **cfg_dict)
    params = init_fn(jax.random.PRNGKey(seed), cfg)
    return cfg, params, apply_fn


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
