"""Device-mesh sharding for batched flood graphs (GSPMD path).

The reference has no distributed execution (SURVEY.md §2.2); this module is
the TPU-native scaling design:

- axis ``data``  — data parallelism over the batch of temporal samples
  (the reference's latent Lightning DDP, main.py:107).
- axis ``graph`` — spatial graph parallelism: node/edge arrays sharded over
  devices; XLA GSPMD inserts the gather/scatter collectives over ICI.
  This is the analog of tensor/sequence parallelism for mesh GNNs
  (BASELINE.json north star). The hand-scheduled halo-exchange path lives in
  parallel/halo.py.

Collectives ride the mesh axes; with a (data, graph) mesh on a pod slice,
lay ``graph`` on the minor (ICI-adjacent) axis.
"""
from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mswe_gnn_tpu.graph import FloodGraph


def make_mesh(n_data: int, n_graph: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_graph
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(n_data, n_graph)
    return Mesh(arr, axis_names=("data", "graph"))


def batch_sharding(mesh: Mesh, batch: FloodGraph, shard_graph: bool = True) -> FloodGraph:
    """A FloodGraph of NamedShardings for a stacked batch.

    Leading axis -> ``data``. When ``shard_graph``, the node/edge axis of each
    leaf is additionally sharded over ``graph`` (GSPMD partitions the segment
    ops; small per-graph leaves like BC arrays stay replicated on ``graph``).
    """
    def spec_for(leaf):
        ndim = leaf.ndim
        if ndim == 0:
            return NamedSharding(mesh, P())
        parts = [None] * ndim
        if leaf.shape[0] % mesh.shape["data"] == 0:
            parts[0] = "data"   # batches smaller than the axis replicate
        if shard_graph and ndim >= 2:
            # shard the big per-node/per-edge axis; leave tiny axes alone
            axis = 1 if leaf.shape[1] >= mesh.shape["graph"] * 2 else None
            if axis is not None and leaf.shape[1] % mesh.shape["graph"] == 0:
                parts[1] = "graph"
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec_for, batch)


def global_put(leaf, sharding: NamedSharding):
    """Place one array under a sharding that may span MULTIPLE PROCESSES.

    Single-process: plain device_put. Multi-process (after
    ``jax.distributed.initialize``): ``device_put`` cannot target
    non-addressable devices, so the global array is assembled with
    ``make_array_from_callback`` — every process holds the full host value
    (data builds are deterministic and identical across processes) and
    serves only its addressable shards from it."""
    if jax.process_count() == 1:
        return jax.device_put(leaf, sharding)
    x = np.asarray(leaf)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def shard_batch(batch: FloodGraph, mesh: Mesh, shard_graph: bool = True) -> FloodGraph:
    """Place a stacked batch onto the mesh."""
    shardings = batch_sharding(mesh, batch, shard_graph)
    return jax.tree_util.tree_map(global_put, batch, shardings)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / opt state) across the whole mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: global_put(x, s), tree)


def union_sharding(mesh: Mesh, batch: FloodGraph) -> FloodGraph:
    """Shardings for a concat-batched (disconnected-union) graph: the big
    node/edge axis of every leaf is sharded over ALL mesh devices (flattened
    ('data','graph') axes) — spatial parallelism over the union graph, the
    GSPMD complement of the ring-halo path in parallel/dist_swegnn.py.

    Leaves whose big axis does not divide the device count stay replicated
    (BC arrays, small masks); ``edge_index [2, E]`` shards its second axis.
    """
    n_dev = mesh.shape["data"] * mesh.shape["graph"]
    axes = ("data", "graph")

    def spec_for(leaf):
        if leaf.ndim == 0:
            return NamedSharding(mesh, P())
        # [2, E] index arrays: shard the edge axis
        if leaf.ndim == 2 and leaf.shape[0] == 2 and leaf.shape[1] % n_dev == 0 \
                and leaf.shape[1] >= 2 * n_dev:
            return NamedSharding(mesh, P(None, axes))
        if leaf.shape[0] % n_dev == 0 and leaf.shape[0] >= 2 * n_dev:
            return NamedSharding(mesh, P(axes, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, batch)


def shard_union_batch(batch: FloodGraph, mesh: Mesh) -> FloodGraph:
    """Place a concat-batched union graph onto the mesh."""
    shardings = union_sharding(mesh, batch)
    return jax.tree_util.tree_map(global_put, batch, shardings)
