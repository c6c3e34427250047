"""Ring-halo TRAINING: the distributed MSGNN forward packaged as a standard
``apply_fn`` so the whole training stack (pushforward scan, conservation
loss, Trainer, eval/rollout) runs through the hand-scheduled graph-parallel
path unchanged.

Scope: the large-single-mesh regime — every sample shares one mesh topology
(temporal windows of one simulation, e.g. the reference's dijkring fine-tune,
config_finetune.yaml ``train_size: 1``). That is exactly where graph
parallelism matters: one graph too big (or too slow) for a chip, partitioned
over the ``graph`` mesh axis with boundary-row halo exchange per hop
(parallel/dist_swegnn.py). Data parallelism over simulations composes on the
``data`` axis via the GSPMD path instead (parallel/sharding.py).

Differentiability: every op in the distributed forward is a jnp op inside
``shard_map``; ``ppermute``/``psum`` have transpose rules, and the replicated
param in-spec makes JAX psum the param cotangents across the graph axis —
so ``jax.grad`` of a loss through this apply_fn yields gradients numerically
equal to the single-device path (tests/test_dist_train.py).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from mswe_gnn_tpu.graph import FloodGraph
from mswe_gnn_tpu.parallel.dist_swegnn import (
    build_dist_msgnn_inputs, make_dist_msgnn_forward, reorder_graph_for_ring,
)


def make_dist_apply_fn(mesh: Mesh, cfg, template: FloodGraph,
                       n_parts: int, overlap: bool = False,
                       halo_width: int = 1) -> Optional[Callable]:
    """``apply_fn(params, cfg, graph) -> [N, 2]`` routed through the ring-halo
    MSGNN forward.

    The halo plans and slot tables are built once from ``template`` (host
    side); at call time only the node features are re-partitioned — static
    reshapes, free under jit. Every graph passed in MUST share the template's
    topology (same mesh, same ring ordering): temporal windows of one
    simulation do. Returns None when the template's partition violates the
    ring assumption (caller falls back to GSPMD).

    ``halo_width`` > 1 selects width-W halo plans (one boundary exchange per
    W hops — dist_swegnn.build_wide_halo_plan); mutually exclusive with
    ``overlap``.
    """
    dist0 = build_dist_msgnn_inputs(template, n_parts, overlap=overlap,
                                    halo_width=halo_width)
    if dist0 is None:
        return None
    fwd = make_dist_msgnn_forward(
        mesh, cfg, overlap=dist0.pop("overlap", None),
        overlap_pool=dist0.pop("overlap_pool", None),
        overlap_unpool=dist0.pop("overlap_unpool", None),
        wide_meta=dist0.pop("wide_meta", None))
    spec = template.spec
    node_ptr = tuple(int(p) for p in np.asarray(spec.node_ptr))
    counts = tuple(spec.node_counts)
    L = spec.num_scales

    def repart(arr, i):
        a = arr[node_ptr[i]: node_ptr[i + 1]]
        return a.reshape((n_parts, counts[i] // n_parts) + a.shape[1:])

    def apply_fn(params, _cfg, g: FloodGraph):
        dist = {**dist0,
                "x_static": [repart(g.x_static, i) for i in range(L)],
                "x_dynamic": [repart(g.x_dynamic, i) for i in range(L)],
                "node_mask": [repart(g.node_mask, i) for i in range(L)]}
        outs = fwd(params, dist)
        return jnp.concatenate(
            [o.reshape(counts[i], -1) for i, o in enumerate(outs)], axis=0)

    return apply_fn


def prepare_ring_graphs(graphs: Sequence[FloodGraph], n_parts: int
                        ) -> Tuple[List[FloodGraph], np.ndarray]:
    """Ring-reorder a list of same-topology samples (temporal windows of one
    simulation) with ONE BFS/barycentric permutation, computed on the first
    sample and applied to all. Returns (reordered graphs, node permutation)."""
    g0, perm = reorder_graph_for_ring(graphs[0], n_parts)
    out = [g0]
    for g in graphs[1:]:
        gg, p = reorder_graph_for_ring(g, n_parts)
        assert np.array_equal(p, perm), (
            "ring_halo training requires every sample to share one mesh "
            "topology (large-single-mesh regime); mixed meshes must use the "
            "GSPMD path")
        out.append(gg)
    return out, perm
