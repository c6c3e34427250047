"""Distributed SWEGNN layer: graph-parallel K-hop message passing with
boundary-only ring halo exchange (shard_map + ppermute).

This is the hand-scheduled scale-out path for the framework's hot kernel —
the mesh-GNN analog of ring sequence parallelism (SURVEY.md §5 long-context
row). Where the GSPMD path (parallel/sharding.py) lets XLA insert whole-array
collectives, this module exchanges ONLY the partition-boundary node rows per
hop, so per-hop ICI traffic is O(boundary) instead of O(N):

- nodes are partitioned into P contiguous blocks over the ``graph`` mesh
  axis (a locality-preserving order — the native BFS partitioner — keeps
  every remote neighbor on a ring-adjacent device);
- each device owns its block's rows of the ELL slot tables (dst-owned
  edges): aggregation is purely local;
- per hop, each device sends its boundary rows to its ring neighbors with
  two ``ppermute``s and gathers neighbors from the concatenated
  [local | halo-from-prev | halo-from-next] buffer;
- the hop-invariant flux (slot-major, models/swegnn.py) needs one extra
  halo exchange of the src-side node projection per layer.

Numerics equal the single-device ``apply_swegnn_block`` exactly (same
per-row math; see tests/test_dist_swegnn.py). Falls back to None at plan
time when the partition violates the ring assumption (caller should then
use the GSPMD path).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mswe_gnn_tpu.models.mlp import apply_linear, apply_mlp, matmul
from mswe_gnn_tpu.models.swegnn import SWEGNNConfig

AXIS = "graph"


def build_dist_slot_plan(src_slots: np.ndarray, slot_mask: np.ndarray,
                         num_nodes: int, n_parts: int) -> Optional[dict]:
    """Host-side ring-halo plan for a node-partitioned ELL slot table.

    ``src_slots [N, D]`` holds, for each dst node, the (node-id) sources of
    its incoming edges; masked slots are ignored. Nodes are owned in
    contiguous blocks of ``num_nodes / n_parts``. Returns None when a remote
    source is not owned by a ring-adjacent part (fallback: GSPMD).

    Plan contents (all numpy, ready to device_put):
      src_tab   [P, B, D] — buffer-relative source ids per part: own rows at
                 [0, B), halo received from p-1 at [B, B+H), from p+1 at
                 [B+H, B+2H)
      slot_mask [P, B, D]
      send_next / send_prev [P, H] — local row ids each part ships to its
                 ring neighbors (masked tail slots ship row 0; receivers
                 never read them because src_tab only maps real slots)
      halo H, block B
    """
    assert num_nodes % n_parts == 0, "pad node count to a multiple of n_parts"
    block = num_nodes // n_parts
    src = np.asarray(src_slots)
    msk = np.asarray(slot_mask) > 0
    rows = np.arange(num_nodes)
    owner_dst = rows // block
    d_max = src.shape[1]

    # ring assumption: every real remote source is owned by p-1 or p+1
    send_next, send_prev = [], []
    for p in range(n_parts):
        mine = owner_dst == p
        reads = src[mine][msk[mine]]
        owners = reads // block
        ok = (owners == p) | (owners == (p - 1) % n_parts) \
            | (owners == (p + 1) % n_parts)
        if not np.all(ok):
            return None
    for p in range(n_parts):
        nxt, prv = (p + 1) % n_parts, (p - 1) % n_parts
        read_by = lambda q: np.unique(
            src[owner_dst == q][msk[owner_dst == q]])
        nxt_reads = read_by(nxt)
        prv_reads = read_by(prv)
        send_next.append(
            nxt_reads[nxt_reads // block == p] - p * block)
        send_prev.append(
            prv_reads[prv_reads // block == p] - p * block)

    h = max([len(a) for a in send_next + send_prev] + [1])

    def pad(lists):
        tab = np.zeros((n_parts, h), np.int32)
        for p, a in enumerate(lists):
            tab[p, :len(a)] = a
        return tab

    sn, sp = pad(send_next), pad(send_prev)

    # remap slot sources into each part's [local | from_prev | from_next] buffer
    src_tab = np.zeros((n_parts, block, d_max), np.int32)
    out_mask = np.zeros((n_parts, block, d_max), np.float32)
    for p in range(n_parts):
        nxt, prv = (p + 1) % n_parts, (p - 1) % n_parts
        lut = {}
        for slot, row in enumerate(send_next[prv]):
            lut[prv * block + int(row)] = block + slot
        for slot, row in enumerate(send_prev[nxt]):
            lut[nxt * block + int(row)] = block + h + slot
        for i in range(block):
            gi = p * block + i
            for d in range(d_max):
                if not msk[gi, d]:
                    continue
                s = int(src[gi, d])
                src_tab[p, i, d] = (s - p * block) if s // block == p else lut[s]
                out_mask[p, i, d] = 1.0
    return {"src_tab": src_tab, "slot_mask": out_mask,
            "send_next": sn, "send_prev": sp,
            "halo": h, "block": block, "n_parts": n_parts}


def _halo_concat(x_block: jax.Array, send_next: jax.Array,
                 send_prev: jax.Array, axis_size: int) -> jax.Array:
    """[B, F] local block -> [B + 2H, F] buffer via two boundary ppermutes."""
    rows_next = jnp.take(x_block, send_next, axis=0)   # what p+1 needs
    rows_prev = jnp.take(x_block, send_prev, axis=0)   # what p-1 needs
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    halo_from_prev = jax.lax.ppermute(rows_next, AXIS, perm=fwd)
    halo_from_next = jax.lax.ppermute(rows_prev, AXIS, perm=bwd)
    return jnp.concatenate([x_block, halo_from_prev, halo_from_next], axis=0)


def _dist_layer_local(params, cfg: SWEGNNConfig, x_s, x_d, src_tab, smask,
                      ea_slots, send_next, send_prev, axis_size: int):
    """Per-device body: identical math to the single-device slot path
    (models/swegnn.py apply_swegnn_block), with halo buffers in place of the
    whole-graph arrays."""
    from mswe_gnn_tpu.models.activations import apply_activation

    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype
    if cfg.with_filter_matrix:
        out = apply_linear(params["filters"][0], x_d, compute_dtype=cd)
    else:
        out = x_d

    # --- slot-major flux with one halo exchange of the src projection
    mlp = params["edge_mlp"]
    lin0 = mlp["layers"][0]
    W = lin0["w"]
    s, d, fe = cfg.static_node_features, cfg.dynamic_node_features, cfg.edge_features
    proj_src = (matmul(x_s, W[:s], cd)
                + matmul(x_d, W[2 * s: 2 * s + d], cd))
    proj_dst = (matmul(x_s, W[s: 2 * s], cd)
                + matmul(x_d, W[2 * s + d: 2 * s + 2 * d], cd))
    W_e = W[2 * s + 2 * d:]
    buf_ps = _halo_concat(proj_src, send_next, send_prev, axis_size)
    rest = {"layers": mlp["layers"][1:], "acts": mlp["acts"][1:],
            "norms": mlp["norms"][1:]}
    d_max = src_tab.shape[1]
    s_slots = []
    for k in range(d_max):
        h = jnp.take(buf_ps, src_tab[:, k], axis=0) + proj_dst
        if fe > 0:
            h = h + matmul(ea_slots[:, k], W_e, cd)
        if "b" in lin0:
            h = h + lin0["b"]
        h = apply_activation(cfg.mlp_activation, mlp["acts"][0], h)
        s_k = apply_mlp(rest, h, activation=cfg.mlp_activation, compute_dtype=cd)
        if cfg.normalize:
            norm = jnp.linalg.norm(s_k, axis=-1, keepdims=True)
            s_k = jnp.where(norm > 0, s_k / jnp.where(norm > 0, norm, 1.0), 0.0)
        s_slots.append(s_k * smask[:, k:k + 1])

    # --- K hops, one boundary exchange each
    for k in range(cfg.K):
        buf = _halo_concat(out, send_next, send_prev, axis_size)
        dst_act = (out.sum(axis=1, keepdims=True) != 0).astype(out.dtype)
        agg = jnp.zeros_like(out)
        for dd in range(d_max):
            nb = jnp.take(buf, src_tab[:, dd], axis=0)
            act = jnp.maximum(
                (nb.sum(axis=-1, keepdims=True) != 0).astype(out.dtype),
                dst_act)
            if cfg.with_gradient:
                diff = out - nb
                if cfg.upwind_mode:
                    diff = jnp.maximum(diff, 0.0)
                agg = agg + diff * s_slots[dd] * act
            else:
                agg = agg + s_slots[dd] * nb * act
        if cfg.with_filter_matrix:
            agg = apply_linear(params["filters"][k + 1], agg, compute_dtype=cd)
        out = out + agg
    return out


def make_dist_swegnn(mesh: Mesh, cfg: SWEGNNConfig):
    """shard_map-wrapped distributed SWEGNN layer on ``mesh``'s graph axis.

    Inputs (see :func:`build_dist_slot_plan` for the table layout):
      params              — replicated SWEGNN param tree
      x_s, x_d [N, F]     — node features, sharded over nodes
      src_tab  [P, B, D]  — buffer-relative slot sources (plan)
      slot_mask [P, B, D]
      ea_slots [P, B, D, Fe] or [P, B, D, 0]-like zeros when fe == 0
      send_next/send_prev [P, H]
    Output: updated node state [N, F], sharded like x_d.
    """
    axis_size = mesh.shape[AXIS]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                  P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS, None),
    )
    def layer(params, x_s, x_d, src_tab, smask, ea_slots, send_next, send_prev):
        return _dist_layer_local(
            params, cfg, x_s, x_d, src_tab[0], smask[0],
            ea_slots[0] if cfg.edge_features > 0 else None,
            send_next[0], send_prev[0], axis_size)

    return layer


def make_dist_gnn_forward(mesh: Mesh, cfg):
    """Distributed single-scale SWE-GNN forward (models/gnn.py:apply_gnn with
    ``type_gnn='SWEGNN'``) — the whole model in ONE shard_map over the graph
    axis: encoders, decoder, residuals and masking are node-row-local; only
    the SWEGNN processors exchange boundary rows (per hop + one projection
    exchange per layer).

    ``cfg`` is a ``models.gnn.GNNConfig``. Inputs mirror the plan layout of
    :func:`build_dist_slot_plan`; ``ea_slots`` holds the RAW per-edge attrs
    in dst-owned slot layout [P, B, D, Fe] (each real edge appears exactly
    once — its dst owns it — so encoding slot-wise equals encoding
    edge-wise). Returns [N, 2] predictions sharded over nodes.
    """
    from mswe_gnn_tpu.models import base as base_model
    from mswe_gnn_tpu.models.activations import apply_activation

    assert cfg.type_gnn == "SWEGNN", "distributed path covers SWEGNN"
    axis_size = mesh.shape[AXIS]
    swe_cfg = cfg.swegnn_cfg()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                  P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS, None),
    )
    def forward(params, x_static, x_dynamic, node_mask,
                src_tab, smask, ea_slots, send_next, send_prev):
        src_tab, smask, ea_slots = src_tab[0], smask[0], ea_slots[0]
        send_next, send_prev = send_next[0], send_prev[0]
        x = jnp.concatenate([x_static, x_dynamic], axis=-1)
        x0 = x
        n_s = cfg.static_node_features - int(cfg.with_WL)
        x_s = x[:, :n_s]
        x_d = x[:, n_s:]
        if cfg.with_WL:
            wl = x_s[:, -1] + x_d[:, -cfg.out_dim]
            x_s = jnp.concatenate([x_s, wl[:, None]], axis=-1)
        ea = ea_slots
        if cfg.edge_mlp:
            ea = apply_mlp(params["edge_encoder"], ea,
                           activation=cfg.mlp_activation)
        x_s = apply_mlp(params["static_node_encoder"], x_s,
                        activation=cfg.mlp_activation)
        x_d = apply_mlp(params["dynamic_node_encoder"], x_d,
                        activation=cfg.mlp_activation)
        h = x_d
        for conv in params["gnn_processor"]:
            h = _dist_layer_local(conv, swe_cfg, x_s, x_d, src_tab, smask,
                                  ea, send_next, send_prev, axis_size)
            if cfg.gnn_activation is not None:
                h = apply_activation(cfg.gnn_activation, params["gnn_act"], h)
            x_d = h
        out = apply_mlp(params["node_decoder"], h, activation=cfg.mlp_activation)
        out = out + base_model.add_residual_connection(
            x0, params.get("residual_weights"), cfg.learned_residuals,
            cfg.previous_t, cfg.out_dim)
        out = jax.nn.relu(out)
        out = base_model.mask_small_wd(out, epsilon=0.0001)
        return out * node_mask[:, None]

    return forward


def slot_ea_per_part(edge_attr: np.ndarray, in_edge_table: np.ndarray,
                     in_edge_mask: np.ndarray, n_parts: int) -> np.ndarray:
    """Gather per-edge attrs into the dst-owned per-part slot layout
    [P, B, D, Fe] (host-side, once per dataset)."""
    n, d_max = in_edge_table.shape
    block = n // n_parts
    ea = np.asarray(edge_attr)
    tab = np.asarray(in_edge_table)
    out = np.zeros((n_parts, block, d_max, ea.shape[1]), np.float32)
    for p in range(n_parts):
        rows = slice(p * block, (p + 1) * block)
        out[p] = ea[tab[rows]] * np.asarray(in_edge_mask)[rows][..., None]
    return out
