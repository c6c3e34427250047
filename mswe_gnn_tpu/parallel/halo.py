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


def build_ring_halo_plan(edge_index, n_nodes: int, n_parts: int):
    """Host-side plan for boundary-only halo exchange over a ring.

    Assumes a locality-preserving contiguous node partition (parallel/native
    BFS order): every remote source a part reads is owned by its ring
    neighbors p-1 / p+1. Returns None when that assumption fails (caller
    falls back to the all_gather path).

    Plan arrays (all [P, H] with a shared padded halo size H):
      send_next[p] : local row ids part p sends to p+1
      send_prev[p] : local row ids part p sends to p-1
      and masks. Edge sources are then remapped into the concatenated
      [local | halo_from_prev | halo_from_next] buffer by
      :func:`remap_sources_to_halo`.
    """
    import numpy as np

    assert n_nodes % n_parts == 0
    block = n_nodes // n_parts
    src = np.asarray(edge_index[0])
    dst = np.asarray(edge_index[1])
    owner_src = src // block
    owner_dst = dst // block

    send_next, send_prev = [], []
    for p in range(n_parts):
        reads = src[owner_dst == p]
        remote = np.unique(reads[owner_src[owner_dst == p] != p])
        owners = remote // block
        if not np.all((owners == (p - 1) % n_parts) | (owners == (p + 1) % n_parts)
                      | (owners == p)):
            return None  # halo spans non-adjacent parts
    for p in range(n_parts):
        # rows of part p that parts p+1 / p-1 read
        nxt = (p + 1) % n_parts
        prv = (p - 1) % n_parts
        mine = (owner_src == p)
        send_next.append(np.unique(src[mine & (owner_dst == nxt)]) - p * block)
        send_prev.append(np.unique(src[mine & (owner_dst == prv)]) - p * block)

    h = max([len(a) for a in send_next + send_prev] + [1])
    P_ = n_parts

    def pad(lists):
        tab = np.zeros((P_, h), np.int32)
        msk = np.zeros((P_, h), np.float32)
        for p, a in enumerate(lists):
            tab[p, :len(a)] = a
            msk[p, :len(a)] = 1.0
        return tab, msk

    sn, sn_m = pad(send_next)
    sp, sp_m = pad(send_prev)
    return {"send_next": sn, "send_next_mask": sn_m,
            "send_prev": sp, "send_prev_mask": sp_m,
            "halo": h, "block": block}


def remap_sources_to_halo(edge_index, plan, n_parts: int):
    """Remap each part's edge sources into its local+halo buffer.

    Buffer layout per part p: [0, block) local rows, [block, block+H) halo
    received from p-1 (= p-1's send_next rows), [block+H, block+2H) halo from
    p+1 (= p+1's send_prev rows).
    Returns src_local [P, Emax] (buffer-relative), dst_local, mask.
    """
    import numpy as np

    block, h = plan["block"], plan["halo"]
    src = np.asarray(edge_index[0])
    dst = np.asarray(edge_index[1])
    owner_dst = dst // block
    counts = np.bincount(owner_dst, minlength=n_parts)
    emax = max(int(counts.max()), 1)
    src_l = np.zeros((n_parts, emax), np.int32)
    dst_l = np.zeros((n_parts, emax), np.int32)
    mask = np.zeros((n_parts, emax), np.float32)
    for p in range(n_parts):
        sel = np.where(owner_dst == p)[0]
        prv, nxt = (p - 1) % n_parts, (p + 1) % n_parts
        # lookup: global id -> buffer slot
        lut = {}
        for slot, row in enumerate(plan["send_next"][prv]):
            if plan["send_next_mask"][prv][slot] > 0:
                lut[prv * block + int(row)] = block + slot
        for slot, row in enumerate(plan["send_prev"][nxt]):
            if plan["send_prev_mask"][nxt][slot] > 0:
                lut[nxt * block + int(row)] = block + h + slot
        for k, e in enumerate(sel):
            s = int(src[e])
            if s // block == p:
                src_l[p, k] = s - p * block
            else:
                src_l[p, k] = lut[s]
            dst_l[p, k] = int(dst[e]) - p * block
            mask[p, k] = 1.0
    return src_l, dst_l, mask


def make_ring_halo_aggregate(mesh: Mesh, halo: int):
    """shard_map weighted aggregation with boundary-only ppermute halo
    exchange: each device sends just its boundary rows to ring neighbors
    (O(boundary) bytes over ICI instead of O(N) for all_gather)."""
    axis_size = mesh.shape[AXIS]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS, None),
    )
    def agg(x_block, send_next, send_prev, src_l, dst_l, w):
        n_local = x_block.shape[0]
        # collect my boundary rows (masked slots send row 0 — receiver never
        # reads masked slots because edge sources only map to real slots)
        rows_next = jnp.take(x_block, send_next[0], axis=0)   # -> to p+1
        rows_prev = jnp.take(x_block, send_prev[0], axis=0)   # -> to p-1
        fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
        halo_from_prev = jax.lax.ppermute(rows_next, AXIS, perm=fwd)
        halo_from_next = jax.lax.ppermute(rows_prev, AXIS, perm=bwd)
        buf = jnp.concatenate([x_block, halo_from_prev, halo_from_next], axis=0)
        xj = jnp.take(buf, src_l[0], axis=0)
        return partitioned_segment_sum(xj * w[0][:, None], dst_l[0], n_local)

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
