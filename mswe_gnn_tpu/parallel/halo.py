"""Edge-partitioned graph parallelism with explicit collectives (shard_map).

The hand-scheduled alternative to the GSPMD path in parallel/sharding.py —
the mesh-GNN analog of sequence parallelism (SURVEY.md §5 long-context row):

- nodes are partitioned into P contiguous blocks (one per device on the
  ``graph`` mesh axis); each device owns the edges whose *destination* is
  local, so the scatter (SpMM) side never communicates.
- source gathers may touch remote nodes: the halo. v1 exchanges the full
  node-feature block via ``all_gather`` over ICI (bandwidth-heavy but always
  correct); the boundary-only ``ppermute`` exchange is the optimization step.

Use inside ``jax.shard_map`` with mesh axes ("data", "graph").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mswe_gnn_tpu.ops.segment import segment_sum

AXIS = "graph"


def gather_remote(x_local: jax.Array, src_global: jax.Array) -> jax.Array:
    """Gather rows of the (node-partitioned) array at *global* indices.

    ``x_local [N_local, F]`` is this device's node block; the full array is
    materialized with one ``all_gather`` over the graph axis, then indexed.
    """
    x_all = jax.lax.all_gather(x_local, AXIS, axis=0, tiled=True)  # [N, F]
    return jnp.take(x_all, src_global, axis=0)


def partitioned_segment_sum(
    messages: jax.Array,      # [E_local, F] messages of locally-owned edges
    dst_local: jax.Array,     # [E_local] destination ids local to this block
    n_local: int,
) -> jax.Array:
    """Dst-owned scatter: purely local, no collective."""
    return segment_sum(messages, dst_local, num_segments=n_local)


def spmd_gather_scatter(
    x_local: jax.Array,
    src_global: jax.Array,
    dst_local: jax.Array,
    edge_weight: jax.Array,
    n_local: int,
) -> jax.Array:
    """One halo-exchanged weighted aggregation hop:
    y_i = sum_{(j -> i) owned locally} w_ij * x_j, with remote x_j fetched
    over the graph axis."""
    xj = gather_remote(x_local, src_global)
    return partitioned_segment_sum(xj * edge_weight[:, None], dst_local, n_local)


def make_spmd_aggregate(mesh: Mesh):
    """Wrap :func:`spmd_gather_scatter` in shard_map on the given mesh.

    Inputs: x [N, F] sharded over nodes; src_global [P, E_loc] / dst_local /
    edge_weight sharded over the partition axis. Output sharded like x.
    """
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS, None),
    )
    def agg(x_block, src_g, dst_l, w):
        # per-edge arrays arrive as [1, E_loc] blocks of the [P, E_max] layout
        n_local = x_block.shape[0]
        return spmd_gather_scatter(x_block, src_g[0], dst_l[0], w[0], n_local)

    return agg


def partition_edges_by_dst(edge_index, edge_attr, edge_mask, n_nodes: int,
                           n_parts: int):
    """Host-side: assign each edge to the owner of its destination and pad
    per-part edge lists to a common length.

    Node ownership is contiguous: part p owns [p*n_nodes/P, (p+1)*n_nodes/P).
    Returns (src_global [P, Emax], dst_local [P, Emax], attr [P, Emax, Fe],
    mask [P, Emax]).
    """
    import numpy as np

    assert n_nodes % n_parts == 0, "pad node count to a multiple of the mesh axis"
    block = n_nodes // n_parts
    src, dst = np.asarray(edge_index[0]), np.asarray(edge_index[1])
    owner = dst // block
    counts = np.bincount(owner, minlength=n_parts)
    emax = int(counts.max()) if len(src) else 1
    emax = max(emax, 1)

    P_ = n_parts
    src_g = np.zeros((P_, emax), np.int32)
    dst_l = np.zeros((P_, emax), np.int32)
    attr = np.zeros((P_, emax) + tuple(np.asarray(edge_attr).shape[1:]), np.float32)
    mask = np.zeros((P_, emax), np.float32)
    for p in range(P_):
        sel = np.where(owner == p)[0]
        k = len(sel)
        src_g[p, :k] = src[sel]
        dst_l[p, :k] = dst[sel] - p * block
        attr[p, :k] = np.asarray(edge_attr)[sel]
        mask[p, :k] = np.asarray(edge_mask)[sel]
    return src_g, dst_l, attr, mask
