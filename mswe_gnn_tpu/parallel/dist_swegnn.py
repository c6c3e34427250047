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
                         num_nodes: int, n_parts: int,
                         num_src_nodes: Optional[int] = None,
                         pack_halo_slots: bool = False) -> Optional[dict]:
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
    num_src_nodes = num_nodes if num_src_nodes is None else num_src_nodes
    assert num_src_nodes % n_parts == 0
    dst_block = num_nodes // n_parts
    block = num_src_nodes // n_parts   # src-side (buffer) block size
    src = np.asarray(src_slots)
    msk = np.asarray(slot_mask) > 0
    rows = np.arange(num_nodes)
    owner_dst = rows // dst_block
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
    src_tab = np.zeros((n_parts, dst_block, d_max), np.int32)
    out_mask = np.zeros((n_parts, dst_block, d_max), np.float32)
    for p in range(n_parts):
        nxt, prv = (p + 1) % n_parts, (p - 1) % n_parts
        lut = {}
        for slot, row in enumerate(send_next[prv]):
            lut[prv * block + int(row)] = block + slot
        for slot, row in enumerate(send_prev[nxt]):
            lut[nxt * block + int(row)] = block + h + slot
        for i in range(dst_block):
            gi = p * dst_block + i
            for d in range(d_max):
                if not msk[gi, d]:
                    continue
                s = int(src[gi, d])
                src_tab[p, i, d] = (s - p * block) if s // block == p else lut[s]
                out_mask[p, i, d] = 1.0
    plan = {"src_tab": src_tab, "slot_mask": out_mask,
            "send_next": sn, "send_prev": sp,
            "halo": h, "block": block, "dst_block": dst_block,
            "n_parts": n_parts}
    if pack_halo_slots:
        # per node, move halo references into the trailing slots; the leading
        # ``n_interior`` slots then reference only local rows so their
        # aggregation can overlap the boundary ppermutes (see
        # _dist_layer_local). Callers must permute per-slot side tables
        # (edge attrs) with the returned ``perm``.
        is_halo = (src_tab >= block) & (out_mask > 0)
        perm = np.argsort(is_halo, axis=-1, kind="stable")     # [P, B, D]
        plan["src_tab"] = np.take_along_axis(src_tab, perm, axis=-1)
        plan["slot_mask"] = np.take_along_axis(out_mask, perm, axis=-1)
        packed_halo = np.take_along_axis(is_halo, perm, axis=-1)
        halo_per_slot = packed_halo.any(axis=(0, 1))           # [D]
        n_interior = int(np.argmax(halo_per_slot)) if halo_per_slot.any() \
            else d_max
        plan["perm"] = perm
        plan["n_interior"] = n_interior
    return plan


def build_wide_halo_plan(src_slots: np.ndarray, slot_mask: np.ndarray,
                         num_nodes: int, n_parts: int, width: int,
                         ea_slots_global: Optional[np.ndarray] = None,
                         ) -> Optional[dict]:
    """Width-``W`` ring-halo plan: ONE boundary exchange per ``W`` hops.

    The W=1 scheme (build_dist_slot_plan) ships ring-1 boundary rows before
    every hop — K collectives per K-hop layer, which is what makes the
    multi-chip model latency-dominated (results_repo/scaling_model.md: 29
    exchanges x latency = ~87% of per-step comm). Here each part receives
    the W-hop closure of its boundary (rings 1..W) once per window and
    locally re-computes the updates of rings 1..W-1 between exchanges —
    the classic deep-halo trade: ceil(K/W) collectives per layer for
    O(ring_W - ring_1) redundant rows of compute/traffic (sub-1% of a block
    on banded meshes).

    Plan contents (all numpy; per-ring segments padded to the max count over
    parts AND sides so prefix slices are static):
      src_tab    [P, B, D]   local rows' buffer-relative slot sources
      slot_mask  [P, B, D]
      send_next/send_prev [P, H] rows shipped to the ring neighbors,
                 ring-major (receiver's ring order); H = sum of ring pads
      ring_ptr   tuple [W+1] prefix lengths of ring segments (0, h1, h1+h2..)
      ext_tab    [P, 2H, D]  buffer-relative slot sources of halo rows
                 (prev-side rows then next-side rows); real only for rings
                 1..W-1 (deeper rings are never locally updated)
      ext_mask   [P, 2H, D]
      ext_ea     [P, 2H, D, Fe] raw edge attrs of halo rows' slots (when
                 ``ea_slots_global`` [N, D, Fe] is given)
      halo H, block B, width W

    Buffer layout everywhere: [local B | from_prev H | from_next H].
    Returns None when any closure row is not owned by a ring-adjacent part
    (caller falls back to W=1 or GSPMD).
    """
    assert num_nodes % n_parts == 0
    assert width >= 1
    B = num_nodes // n_parts
    src = np.asarray(src_slots)
    msk = np.asarray(slot_mask) > 0
    d_max = src.shape[1]

    def sources_of(rows):
        if len(rows) == 0:
            return np.zeros(0, np.int64)
        r = np.asarray(rows)
        return np.unique(src[r][msk[r]])

    # rings[p][r-1] = sorted global ids at hop distance r from p's block
    rings = []
    for p in range(n_parts):
        local_lo, local_hi = p * B, (p + 1) * B
        known = np.zeros(num_nodes, bool)
        known[local_lo:local_hi] = True
        frontier = np.arange(local_lo, local_hi)
        prings = []
        for _ in range(width):
            s = sources_of(frontier)
            s = s[~known[s]]
            owners = s // B
            ok = (owners == (p - 1) % n_parts) | (owners == (p + 1) % n_parts)
            if not np.all(ok):
                return None          # closure escapes the ring neighborhood
            prings.append(s)
            known[s] = True
            frontier = s
        rings.append(prings)

    # per-ring, per-side padded counts (uniform across parts and sides)
    h_r = []
    for r in range(width):
        m = 1 if r == 0 else 0
        for p in range(n_parts):
            prv, nxt = (p - 1) % n_parts, (p + 1) % n_parts
            own = rings[p][r] // B
            m = max(m, int((own == prv).sum()), int((own == nxt).sum()))
        h_r.append(m)
    ring_ptr = tuple(np.cumsum([0] + h_r).tolist())
    H = ring_ptr[-1]

    # per part: ring-major (side-split) halo row lists + buffer positions
    halo_prev = np.zeros((n_parts, H), np.int64)   # global ids (0 = pad)
    halo_next = np.zeros((n_parts, H), np.int64)
    halo_prev_real = np.zeros((n_parts, H), bool)
    halo_next_real = np.zeros((n_parts, H), bool)
    pos = [dict() for _ in range(n_parts)]         # global id -> buffer pos
    for p in range(n_parts):
        prv, nxt = (p - 1) % n_parts, (p + 1) % n_parts
        for r in range(width):
            own = rings[p][r] // B
            for side, q, arr, real in (
                    (0, prv, halo_prev, halo_prev_real),
                    (1, nxt, halo_next, halo_next_real)):
                rows = rings[p][r][own == q]
                o = ring_ptr[r]
                arr[p, o:o + len(rows)] = rows
                real[p, o:o + len(rows)] = True
                base = B + H if side else B
                for i, g in enumerate(rows):
                    pos[p][int(g)] = base + o + i

    # send tables: what p ships = its neighbor's halo rows that p owns
    send_next = np.zeros((n_parts, H), np.int32)
    send_prev = np.zeros((n_parts, H), np.int32)
    for p in range(n_parts):
        nxt, prv = (p + 1) % n_parts, (p - 1) % n_parts
        send_next[p] = halo_prev[nxt] - p * B      # p+1's prev side = p's rows
        send_next[p][~halo_prev_real[nxt]] = 0
        send_prev[p] = halo_next[prv] - p * B
        send_prev[p][~halo_next_real[prv]] = 0
        assert np.all(send_next[p] >= 0) and np.all(send_next[p] < B)
        assert np.all(send_prev[p] >= 0) and np.all(send_prev[p] < B)

    # local slot tables (buffer-relative)
    src_tab = np.zeros((n_parts, B, d_max), np.int32)
    out_mask = np.zeros((n_parts, B, d_max), np.float32)
    upd = width > 1
    ext_tab = np.zeros((n_parts, 2 * H, d_max), np.int32)
    ext_mask = np.zeros((n_parts, 2 * H, d_max), np.float32)
    fe = 0 if ea_slots_global is None else ea_slots_global.shape[-1]
    ext_ea = np.zeros((n_parts, 2 * H, d_max, fe), np.float32)
    for p in range(n_parts):
        lut = pos[p]

        def remap(g):
            return (g - p * B) if g // B == p else lut[int(g)]

        for i in range(B):
            gi = p * B + i
            for d in range(d_max):
                if msk[gi, d]:
                    src_tab[p, i, d] = remap(src[gi, d])
                    out_mask[p, i, d] = 1.0
        if not upd:
            continue
        # halo-row tables for rings 1..width-1 (the locally-updated rows)
        for side, arr, real in ((0, halo_prev, halo_prev_real),
                                (1, halo_next, halo_next_real)):
            base = side * H
            for j in range(ring_ptr[width - 1]):   # rings < width only
                if not real[p, j]:
                    continue
                gq = int(arr[p, j])
                for d in range(d_max):
                    if msk[gq, d]:
                        ext_tab[p, base + j, d] = remap(src[gq, d])
                        ext_mask[p, base + j, d] = 1.0
                if fe:
                    ext_ea[p, base + j] = (ea_slots_global[gq]
                                           * msk[gq][:, None])

    return {"src_tab": src_tab, "slot_mask": out_mask,
            "send_next": send_next, "send_prev": send_prev,
            "ring_ptr": ring_ptr, "ext_tab": ext_tab, "ext_mask": ext_mask,
            "ext_ea": ext_ea, "halo": H, "block": B, "width": width,
            "n_parts": n_parts}


def _halo_rows(x_block: jax.Array, send_next: jax.Array,
               send_prev: jax.Array, axis_size: int):
    """One bidirectional boundary exchange -> (from_prev, from_next) halo
    rows (the [B+2H] buffer minus the local block)."""
    rows_next = jnp.take(x_block, send_next, axis=0)
    rows_prev = jnp.take(x_block, send_prev, axis=0)
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    return (jax.lax.ppermute(rows_next, AXIS, perm=fwd),
            jax.lax.ppermute(rows_prev, AXIS, perm=bwd))


def _dist_layer_wide(params, cfg: SWEGNNConfig, x_s, x_d, plan: dict,
                     ea_local, ea_ext, axis_size: int):
    """Same-block processor layer on a width-W plan: ceil(K/W) boundary
    exchanges instead of K. Between exchanges the part re-computes the
    updates of halo rings 1..W-1 locally (identical per-row math, so
    numerics match the single-device layer to float tolerance — the
    redundant halo-row filter matmuls may tile differently than the owner's
    block matmul, same reassociation caveat as the packed W=1 plans).

    ``plan`` leaves are this part's slices: src_tab/smask [B, D], ext_tab/
    ext_mask [2H, D], send_next/send_prev [H]; ``ring_ptr``/``width`` are
    static. ``ea_local`` [B, D, Fe] / ``ea_ext`` [2H, D, Fe] are the
    (encoded) per-slot edge features.
    """
    from mswe_gnn_tpu.models.activations import apply_activation

    width = plan["width"]
    ring_ptr = plan["ring_ptr"]
    H = int(plan["halo"])
    src_tab, smask = plan["src_tab"], plan["smask"]
    ext_tab, ext_mask = plan["ext_tab"], plan["ext_mask"]
    send_next, send_prev = plan["send_next"], plan["send_prev"]
    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype

    if cfg.with_filter_matrix:
        out = apply_linear(params["filters"][0], x_d, compute_dtype=cd)
    else:
        out = x_d

    # --- flux (hop-invariant): one widened projection exchange per layer
    mlp = params["edge_mlp"]
    lin0 = mlp["layers"][0]
    W = lin0["w"]
    s, d, fe = cfg.static_node_features, cfg.dynamic_node_features, cfg.edge_features
    proj_src = (matmul(x_s, W[:s], cd)
                + matmul(x_d, W[2 * s: 2 * s + d], cd))
    proj_dst = (matmul(x_s, W[s: 2 * s], cd)
                + matmul(x_d, W[2 * s + d: 2 * s + 2 * d], cd))
    W_e = W[2 * s + 2 * d:]
    rest = {"layers": mlp["layers"][1:], "acts": mlp["acts"][1:],
            "norms": mlp["norms"][1:]}
    d_max = src_tab.shape[1]

    both = jnp.concatenate([proj_src, proj_dst], axis=-1)
    hp, hn = _halo_rows(both, send_next, send_prev, axis_size)
    ps_buf = jnp.concatenate([proj_src, hp[:, :proj_src.shape[1]],
                              hn[:, :proj_src.shape[1]]], axis=0)
    pd_ext = jnp.concatenate([hp[:, proj_src.shape[1]:],
                              hn[:, proj_src.shape[1]:]], axis=0)  # [2H, Hf]

    def flux(tab, mask, p_dst, ea):
        slots = []
        for k in range(d_max):
            h = jnp.take(ps_buf, tab[:, k], axis=0) + p_dst
            if fe > 0:
                h = h + matmul(ea[:, k], W_e, cd)
            if "b" in lin0:
                h = h + lin0["b"]
            h = apply_activation(cfg.mlp_activation, mlp["acts"][0], h)
            s_k = apply_mlp(rest, h, activation=cfg.mlp_activation,
                            compute_dtype=cd)
            if cfg.normalize:
                nrm = jnp.linalg.norm(s_k, axis=-1, keepdims=True)
                s_k = jnp.where(nrm > 0, s_k / jnp.where(nrm > 0, nrm, 1.0),
                                0.0)
            slots.append(s_k * mask[:, k:k + 1])
        return slots

    s_local = flux(src_tab, smask, proj_dst, ea_local)
    upd = width > 1 and ring_ptr[width - 1] > 0
    s_ext = (flux(ext_tab, ext_mask, pd_ext, ea_ext) if upd else None)

    def hop_update(rows_out, tab, mask_unused, s_slots, buf, lo=0, hi=None):
        """One hop's aggregation for ``rows_out`` (their slot tables sliced
        [lo:hi] rows) reading neighbor state from ``buf``."""
        hi = tab.shape[0] if hi is None else hi
        o = rows_out
        dst_act = (o.sum(axis=1, keepdims=True) != 0).astype(o.dtype)
        agg = jnp.zeros_like(o)
        for k in range(d_max):
            nb = jnp.take(buf, tab[lo:hi, k], axis=0)
            act = jnp.maximum(
                (nb.sum(axis=-1, keepdims=True) != 0).astype(o.dtype),
                dst_act)
            if cfg.with_gradient:
                diff = o - nb
                if cfg.upwind_mode:
                    diff = jnp.maximum(diff, 0.0)
                agg = agg + diff * s_slots[k][lo:hi] * act
            else:
                agg = agg + s_slots[k][lo:hi] * nb * act
        return agg

    if cd is not None:
        s_local = [x.astype(cd) for x in s_local]
        if s_ext is not None:
            s_ext = [x.astype(cd) for x in s_ext]
        out = out.astype(cd)

    k = 0
    while k < cfg.K:
        w = min(width, cfg.K - k)
        hp, hn = _halo_rows(out, send_next, send_prev, axis_size)
        ext_out = jnp.concatenate([hp, hn], axis=0)          # [2H, F]
        for j in range(w):
            buf = jnp.concatenate([out, ext_out], axis=0)
            agg = hop_update(out, src_tab, smask, s_local, buf)
            if cfg.with_filter_matrix:
                agg = apply_linear(params["filters"][k + j + 1], agg,
                                   compute_dtype=cd)
            if cd is not None:
                agg = agg.astype(cd)
            new_out = out + agg
            if j < w - 1 and s_ext is not None and ring_ptr[w - 1 - j] > 0:
                pfx = ring_ptr[w - 1 - j]    # rings needed by remaining hops
                parts = []
                for base in (0, H):          # prev side, next side
                    rows = ext_out[base: base + pfx]
                    agg_e = hop_update(rows, ext_tab, ext_mask, s_ext, buf,
                                       lo=base, hi=base + pfx)
                    if cfg.with_filter_matrix:
                        agg_e = apply_linear(params["filters"][k + j + 1],
                                             agg_e, compute_dtype=cd)
                    if cd is not None:
                        agg_e = agg_e.astype(cd)
                    parts.append(jnp.concatenate(
                        [rows + agg_e, ext_out[base + pfx: base + H]], axis=0))
                ext_out = jnp.concatenate(parts, axis=0)
            out = new_out
        k += w
    return out.astype(x_d.dtype) if cd is not None else out


def make_dist_swegnn_wide(mesh: Mesh, cfg: SWEGNNConfig, width: int,
                          ring_ptr, halo: int):
    """shard_map wrapper over :func:`_dist_layer_wide` (unit-test surface;
    the MSGNN forward embeds the layer body directly). ``ring_ptr``/``halo``
    are the static plan metadata (build_wide_halo_plan)."""
    axis_size = mesh.shape[AXIS]
    ring_ptr = tuple(int(x) for x in ring_ptr)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                  P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS, None),
    )
    def layer(params, x_s, x_d, src_tab, smask, ea_local, ext_tab, ext_mask,
              ea_ext, send_next, send_prev):
        plan = {"src_tab": src_tab[0], "smask": smask[0],
                "ext_tab": ext_tab[0], "ext_mask": ext_mask[0],
                "send_next": send_next[0], "send_prev": send_prev[0],
                "halo": halo, "width": width, "ring_ptr": ring_ptr}
        return _dist_layer_wide(params, cfg, x_s, x_d, plan,
                                ea_local[0], ea_ext[0], axis_size)

    return layer


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
                      ea_slots, send_next, send_prev, axis_size: int,
                      x_s_src=None, x_d_src=None,
                      n_interior: Optional[int] = None):
    """Per-device body: identical math to the single-device slot path
    (models/swegnn.py apply_swegnn_block), with halo buffers in place of the
    whole-graph arrays.

    When ``x_s_src``/``x_d_src`` are given the sources live in a DIFFERENT
    (disjoint) node block — the multiscale un-pooling case: hop updates touch
    only dst rows, so the source-side state is constant across hops and its
    halo buffer is exchanged once.

    ``n_interior`` (from a plan built with ``pack_halo_slots=True``) enables
    communication/compute overlap: slots [0, n_interior) reference only local
    rows, so their aggregation depends solely on ``out`` — XLA's scheduler can
    run it while the boundary ``ppermute``s are in flight; only the trailing
    halo slots wait on the exchange. Zero extra gather work; numerics are
    identical up to slot-order float reassociation (pack_halo_slots permutes
    each node's slot order, so the accumulation order differs from an
    unpacked plan — parity tests pass at rtol 2e-5, not bit-exact)."""
    from mswe_gnn_tpu.models.activations import apply_activation

    same_block = x_s_src is None
    if same_block:
        x_s_src, x_d_src = x_s, x_d
    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype
    if cfg.with_filter_matrix:
        out = apply_linear(params["filters"][0], x_d, compute_dtype=cd)
        out_src = out if same_block else apply_linear(
            params["filters"][0], x_d_src, compute_dtype=cd)
    else:
        out = x_d
        out_src = out if same_block else x_d_src

    # --- slot-major flux with one halo exchange of the src projection
    mlp = params["edge_mlp"]
    lin0 = mlp["layers"][0]
    W = lin0["w"]
    s, d, fe = cfg.static_node_features, cfg.dynamic_node_features, cfg.edge_features
    proj_src = (matmul(x_s_src, W[:s], cd)
                + matmul(x_d_src, W[2 * s: 2 * s + d], cd))
    proj_dst = (matmul(x_s, W[s: 2 * s], cd)
                + matmul(x_d, W[2 * s + d: 2 * s + 2 * d], cd))
    W_e = W[2 * s + 2 * d:]
    rest = {"layers": mlp["layers"][1:], "acts": mlp["acts"][1:],
            "norms": mlp["norms"][1:]}
    d_max = src_tab.shape[1]

    def flux_from(h_nb, k):
        h = h_nb + proj_dst
        if fe > 0:
            h = h + matmul(ea_slots[:, k], W_e, cd)
        if "b" in lin0:
            h = h + lin0["b"]
        h = apply_activation(cfg.mlp_activation, mlp["acts"][0], h)
        s_k = apply_mlp(rest, h, activation=cfg.mlp_activation,
                        compute_dtype=cd)
        if cfg.normalize:
            norm = jnp.linalg.norm(s_k, axis=-1, keepdims=True)
            s_k = jnp.where(norm > 0, s_k / jnp.where(norm > 0, norm, 1.0), 0.0)
        return s_k * smask[:, k:k + 1]

    # flux-projection exchange overlap (packed plans): interior slots read
    # the LOCAL projection — no dependence on the ppermutes — so XLA runs
    # their edge-MLP while the boundary rows are in flight (previously this
    # exchange was fully synchronous; VERDICT r2 task 8)
    ni = 0 if n_interior is None else n_interior
    s_slots = [flux_from(jnp.take(proj_src, src_tab[:, k], axis=0), k)
               for k in range(ni)]
    if ni < d_max:
        buf_ps = _halo_concat(proj_src, send_next, send_prev, axis_size)
        s_slots += [flux_from(jnp.take(buf_ps, src_tab[:, k], axis=0), k)
                    for k in range(ni, d_max)]

    # --- K hops, one boundary exchange each (src-side buffer is constant
    # when the blocks are disjoint: exchange once)
    buf_const = (None if same_block
                 else _halo_concat(out_src, send_next, send_prev, axis_size))

    def slot_msg(nb, dd, dst_act):
        act = jnp.maximum(
            (nb.sum(axis=-1, keepdims=True) != 0).astype(out.dtype), dst_act)
        if cfg.with_gradient:
            diff = out - nb
            if cfg.upwind_mode:
                diff = jnp.maximum(diff, 0.0)
            return diff * s_slots[dd] * act
        return s_slots[dd] * nb * act

    for k in range(cfg.K):
        dst_act = (out.sum(axis=1, keepdims=True) != 0).astype(out.dtype)
        agg = jnp.zeros_like(out)
        if same_block and n_interior is not None:
            # overlap: start the exchange, aggregate halo-free slots from the
            # local block while it is in flight, then finish with halo slots
            rows_next = jnp.take(out, send_next, axis=0)
            rows_prev = jnp.take(out, send_prev, axis=0)
            fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
            bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
            halo_from_prev = jax.lax.ppermute(rows_next, AXIS, perm=fwd)
            halo_from_next = jax.lax.ppermute(rows_prev, AXIS, perm=bwd)
            for dd in range(n_interior):            # local sources only
                agg = agg + slot_msg(jnp.take(out, src_tab[:, dd], axis=0),
                                     dd, dst_act)
            buf = jnp.concatenate([out, halo_from_prev, halo_from_next], 0)
            for dd in range(n_interior, d_max):
                agg = agg + slot_msg(jnp.take(buf, src_tab[:, dd], axis=0),
                                     dd, dst_act)
        elif not same_block and n_interior is not None:
            # disjoint-block (un-pool) overlap: interior slots read the
            # constant local src block directly, so the once-per-layer
            # src-buffer exchange stays off their critical path
            for dd in range(n_interior):
                agg = agg + slot_msg(
                    jnp.take(out_src, src_tab[:, dd], axis=0), dd, dst_act)
            for dd in range(n_interior, d_max):
                agg = agg + slot_msg(
                    jnp.take(buf_const, src_tab[:, dd], axis=0), dd, dst_act)
        else:
            buf = (_halo_concat(out, send_next, send_prev, axis_size)
                   if same_block else buf_const)
            for dd in range(d_max):
                agg = agg + slot_msg(jnp.take(buf, src_tab[:, dd], axis=0),
                                     dd, dst_act)
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


def reorder_graph_for_ring(graph, n_parts: int = 0):
    """Permute each scale's (real) nodes into BFS order so contiguous
    partitions are ring-local — ghost cells land next to their BC faces and
    grid/triangulated meshes become banded. Returns (new_graph, perm) where
    ``perm[new_global_id] = old_global_id`` (identity on padding rows).

    The spec is unchanged (same counts and ELL widths); edge blocks are
    re-sorted by destination and all slot tables rebuilt. Useful on its own
    for single-chip gather locality, required for the ring-halo plans on
    meshes whose native face order is not banded.
    """
    from mswe_gnn_tpu.graph import build_edge_slot_table

    spec = graph.spec
    L = spec.num_scales
    node_ptr = np.asarray(spec.node_ptr)
    edge_ptr = np.asarray(spec.edge_ptr)
    intra_ptr = np.asarray(spec.intra_edge_ptr)
    N = spec.num_nodes
    ei = np.asarray(graph.edge_index)
    nmask = np.asarray(graph.node_mask)

    # scale 0: BFS over real nodes (padding rows stay in place); coarser
    # scales: barycentric order — sort by the mean new position of their fine
    # children so partitions stay spatially aligned across scales (the
    # cross-scale pool/unpool plans need fine part p's parents on coarse
    # parts ring-adjacent to p)
    from collections import deque

    perm = np.arange(N, dtype=np.int64)          # new global id -> old
    scale_pos = {}                               # scale -> old local -> new local
    for i in range(L):
        lo, hi = node_ptr[i], node_ptr[i + 1]
        real = np.where(nmask[lo:hi] > 0)[0]
        n_real = len(real)
        if n_real == 0:
            scale_pos[i] = np.arange(hi - lo)
            continue
        if i == 0:
            esl = slice(edge_ptr[i], edge_ptr[i + 1])
            emask = np.asarray(graph.edge_mask)[esl] > 0
            s = ei[0, esl][emask] - lo
            d = ei[1, esl][emask] - lo
            order = []
            seen = np.zeros(hi - lo, bool)
            seen[~np.isin(np.arange(hi - lo), real)] = True  # skip padding
            nbr = {}
            for a, b in zip(s, d):
                # symmetric adjacency for ordering: ghost->interior edges
                # are directed, but the ghost must sit next to its BC face
                nbr.setdefault(int(a), []).append(int(b))
                nbr.setdefault(int(b), []).append(int(a))
            for start in real:
                if seen[start]:
                    continue
                q = deque([int(start)])
                seen[start] = True
                while q:
                    u = q.popleft()
                    order.append(u)
                    for v in sorted(nbr.get(u, [])):
                        if not seen[v]:
                            seen[v] = True
                            q.append(v)
            order = np.asarray(order, np.int64)
        else:
            isl = slice(intra_ptr[i - 1], intra_ptr[i])
            im = np.asarray(graph.intra_edge_mask)[isl] > 0
            coarse_l = (np.asarray(graph.intra_edge_index)[0, isl][im]
                        - node_ptr[i])
            fine_l = (np.asarray(graph.intra_edge_index)[1, isl][im]
                      - node_ptr[i - 1])
            fine_new = scale_pos[i - 1][fine_l].astype(np.float64)
            key = np.full(hi - lo, np.inf)
            cnt = np.bincount(coarse_l, minlength=hi - lo).astype(np.float64)
            sums = np.bincount(coarse_l, weights=fine_new, minlength=hi - lo)
            has = cnt > 0
            key[has] = sums[has] / cnt[has]
            order = real[np.argsort(key[real], kind="stable")]
        perm[lo: lo + n_real] = lo + order
        pos_local = np.arange(hi - lo)
        pos_local[order] = np.arange(n_real)
        scale_pos[i] = pos_local

    pos = np.empty(N, np.int64)                  # old global id -> new
    pos[perm] = np.arange(N)

    def permute_nodes(arr):
        return np.asarray(arr)[perm]

    # edges: remap endpoints, re-sort by dst within each scale block
    E = spec.num_edges
    ei_new = pos[ei.astype(np.int64)].astype(np.int32)
    ea_new = np.asarray(graph.edge_attr).copy()
    em_new = np.asarray(graph.edge_mask).copy()
    for i in range(L):
        esl = slice(edge_ptr[i], edge_ptr[i + 1])
        o = np.argsort(ei_new[1, esl], kind="stable")
        ei_new[:, esl] = ei_new[:, esl][:, o]
        ea_new[esl] = ea_new[esl][o]
        em_new[esl] = em_new[esl][o]

    iei = np.asarray(graph.intra_edge_index)
    if spec.num_intra_edges > 0:
        iei_new = pos[iei.astype(np.int64)].astype(np.int32)
        im_new = np.asarray(graph.intra_edge_mask).copy()
        for lvl in range(L - 1):
            isl = slice(intra_ptr[lvl], intra_ptr[lvl + 1])
            o = np.argsort(iei_new[0, isl], kind="stable")
            iei_new[:, isl] = iei_new[:, isl][:, o]
            im_new[isl] = im_new[isl][o]
    else:
        iei_new = iei
        im_new = np.asarray(graph.intra_edge_mask)

    in_tab, in_msk = build_edge_slot_table(ei_new, em_new, N,
                                           d_fixed=spec.in_degree)
    pool_tab, pool_msk = build_edge_slot_table(
        np.stack([iei_new[1], iei_new[0]]), im_new, N,
        d_fixed=spec.pool_degree)
    unpool_tab, unpool_msk = build_edge_slot_table(
        iei_new, im_new, N, d_fixed=spec.unpool_degree)

    new_graph = graph.replace(
        x_static=jnp.asarray(permute_nodes(graph.x_static)),
        x_dynamic=jnp.asarray(permute_nodes(graph.x_dynamic)),
        node_mask=jnp.asarray(permute_nodes(graph.node_mask)),
        area=jnp.asarray(permute_nodes(graph.area)),
        dem=jnp.asarray(permute_nodes(graph.dem)),
        y=jnp.asarray(permute_nodes(graph.y)) if graph.y is not None else None,
        edge_index=jnp.asarray(ei_new),
        edge_attr=jnp.asarray(ea_new),
        edge_mask=jnp.asarray(em_new),
        intra_edge_index=jnp.asarray(iei_new),
        intra_edge_mask=jnp.asarray(im_new),
        bc_nodes=jnp.asarray(pos[np.asarray(graph.bc_nodes, np.int64)]
                             .astype(np.int32)),
        in_edge_table=jnp.asarray(in_tab), in_edge_mask=jnp.asarray(in_msk),
        pool_table=jnp.asarray(pool_tab), pool_mask=jnp.asarray(pool_msk),
        unpool_table=jnp.asarray(unpool_tab),
        unpool_mask=jnp.asarray(unpool_msk),
    )
    return new_graph, perm


def build_dist_msgnn_inputs(graph, n_parts: int,
                            overlap: bool = False,
                            halo_width: int = 1) -> Optional[dict]:
    """Host-side: partition a multiscale ``FloodGraph`` for the distributed
    MSGNN forward — one ring plan per scale (processors) and per transfer
    level (pool: fine->coarse, unpool: coarse->fine). All leaves part-major
    [P, ...]. Returns None when any plan violates ring adjacency (fallback:
    the GSPMD path) or a scale's padded count is not divisible by P.

    ``overlap=True`` packs each processor plan's halo references into the
    trailing slots and adds a top-level ``"overlap"`` tuple (per-scale
    interior-slot counts). Pop it and pass to
    ``make_dist_msgnn_forward(..., overlap=...)`` — it is static metadata,
    not a shardable leaf.

    ``halo_width`` > 1 builds width-W processor plans (one boundary
    exchange per W hops, build_wide_halo_plan — K-schedule 5 drops a
    V-cycle step from 25+4 to 15+4 exchanges at W=2): the result carries a
    top-level ``"wide_meta"`` tuple (per-scale (width, ring_ptr, halo),
    width 1 = that scale fell back to the per-hop plan because its W-hop
    closure escaped ring adjacency). Pop and pass to
    ``make_dist_msgnn_forward(..., wide_meta=...)``. Mutually exclusive
    with ``overlap`` (wide plans overlap differently: the exchange itself
    amortizes over W hops)."""
    assert not (overlap and halo_width > 1), \
        "overlap packing and wide halos are mutually exclusive"
    spec = graph.spec
    L = spec.num_scales
    node_ptr = np.asarray(spec.node_ptr)
    edge_ptr = np.asarray(spec.edge_ptr)
    intra_ptr = np.asarray(spec.intra_edge_ptr)
    counts = spec.node_counts
    if any(c % n_parts for c in counts):
        return None

    def part(arr, i):
        a = np.asarray(arr)[node_ptr[i]: node_ptr[i + 1]]
        return a.reshape((n_parts, counts[i] // n_parts) + a.shape[1:])

    ei = np.asarray(graph.edge_index)
    iei = np.asarray(graph.intra_edge_index)
    out = {"x_static": [], "x_dynamic": [], "node_mask": [],
           "proc": [], "pool": [], "unpool": []}
    n_interior = []
    wide_meta = []
    for i in range(L):
        tab = np.maximum(np.asarray(graph.in_edge_table)[
            node_ptr[i]: node_ptr[i + 1]] - edge_ptr[i], 0)
        tmask = np.asarray(graph.in_edge_mask)[node_ptr[i]: node_ptr[i + 1]]
        src_local = ei[0, edge_ptr[i]: edge_ptr[i + 1]] - node_ptr[i]
        ea = np.asarray(graph.edge_attr)[edge_ptr[i]: edge_ptr[i + 1]]
        ea_slots_flat = (ea[tab] * tmask[..., None]).astype(np.float32)
        wide = None
        if halo_width > 1:
            wide = build_wide_halo_plan(
                src_local[tab], tmask, counts[i], n_parts, halo_width,
                ea_slots_global=ea_slots_flat)
        plan = build_dist_slot_plan(src_local[tab], tmask, counts[i], n_parts,
                                    pack_halo_slots=overlap) \
            if wide is None else wide
        if plan is None:
            return None
        ea_slots = ea_slots_flat.reshape(
            (n_parts, counts[i] // n_parts) + (tab.shape[1], ea.shape[1]))
        if overlap:
            ea_slots = np.take_along_axis(
                ea_slots, plan.pop("perm")[..., None], axis=2)
            n_interior.append(plan.pop("n_interior"))
        proc = {"src_tab": plan["src_tab"], "smask": plan["slot_mask"],
                "ea": ea_slots,
                "send_next": plan["send_next"], "send_prev": plan["send_prev"]}
        if wide is not None:
            proc["ext_tab"] = plan["ext_tab"]
            proc["ext_mask"] = plan["ext_mask"]
            proc["ext_ea"] = plan["ext_ea"]
            wide_meta.append((halo_width, plan["ring_ptr"],
                              int(plan["halo"])))
        elif halo_width > 1:
            # this scale's W-hop closure escaped ring adjacency: per-hop plan
            wide_meta.append((1, None, None))
        out["proc"].append(proc)
        out["x_static"].append(part(graph.x_static, i))
        out["x_dynamic"].append(part(graph.x_dynamic, i))
        out["node_mask"].append(part(graph.node_mask, i))

    # pool/unpool cross-scale plans: with ``overlap`` their halo slots are
    # packed to the tail too, so the cross-scale exchanges also overlap with
    # interior aggregation (VERDICT r2 task 8 — previously synchronous)
    overlap_pool, overlap_unpool = [], []
    for lvl in range(L - 1):
        isl = slice(intra_ptr[lvl], intra_ptr[lvl + 1])
        fine_local = iei[1, isl] - node_ptr[lvl]
        coarse_local = iei[0, isl] - node_ptr[lvl + 1]
        ptab = np.maximum(np.asarray(graph.pool_table)[
            node_ptr[lvl + 1]: node_ptr[lvl + 2]] - intra_ptr[lvl], 0)
        pmask = np.asarray(graph.pool_mask)[node_ptr[lvl + 1]: node_ptr[lvl + 2]]
        plan = build_dist_slot_plan(fine_local[ptab], pmask, counts[lvl + 1],
                                    n_parts, num_src_nodes=counts[lvl],
                                    pack_halo_slots=overlap)
        if plan is None:
            return None
        if overlap:
            plan.pop("perm")
            overlap_pool.append(plan.pop("n_interior"))
        out["pool"].append({
            "src_tab": plan["src_tab"], "smask": plan["slot_mask"],
            "send_next": plan["send_next"], "send_prev": plan["send_prev"]})
        utab = np.maximum(np.asarray(graph.unpool_table)[
            node_ptr[lvl]: node_ptr[lvl + 1]] - intra_ptr[lvl], 0)
        umask = np.asarray(graph.unpool_mask)[node_ptr[lvl]: node_ptr[lvl + 1]]
        plan = build_dist_slot_plan(coarse_local[utab], umask, counts[lvl],
                                    n_parts, num_src_nodes=counts[lvl + 1],
                                    pack_halo_slots=overlap)
        if plan is None:
            return None
        if overlap:
            plan.pop("perm")
            overlap_unpool.append(plan.pop("n_interior"))
        out["unpool"].append({
            "src_tab": plan["src_tab"], "smask": plan["slot_mask"],
            "send_next": plan["send_next"], "send_prev": plan["send_prev"]})

    def to_dev(x):
        return jnp.asarray(x)
    out = jax.tree_util.tree_map(to_dev, out)
    if overlap:
        out["overlap"] = tuple(n_interior)
        out["overlap_pool"] = tuple(overlap_pool)
        out["overlap_unpool"] = tuple(overlap_unpool)
    if halo_width > 1:
        out["wide_meta"] = tuple(wide_meta)
    return out


def make_dist_msgnn_forward(mesh: Mesh, cfg, overlap=None,
                            overlap_pool=None, overlap_unpool=None,
                            wide_meta=None):
    """Distributed multiscale MSGNN forward (models/msgnn.py:apply_msgnn)
    over the graph mesh axis: every scale's nodes are partitioned into P
    ring-ordered blocks; processors exchange boundary rows per hop, pooling /
    un-pooling exchange boundary rows across adjacent-scale partitions.

    ``cfg`` is a ``models.msgnn.MSGNNConfig`` (mean pooling only). Inputs
    are the part-major arrays of :func:`build_dist_msgnn_inputs`. Returns a
    tuple of per-scale part-major predictions [P, B_i, 2]; reshaping each to
    [C_i, 2] and concatenating recovers the scale-major node order.

    ``overlap`` is the per-scale interior-slot tuple popped from
    ``build_dist_msgnn_inputs(..., overlap=True)``'s result: processors then
    aggregate local-only slots while the boundary exchange is in flight
    (SURVEY §5 long-context row; VERDICT r1 #10). ``overlap_pool`` /
    ``overlap_unpool`` are the per-transfer-level analogs: the cross-scale
    pooling sum and the un-pool layer read interior slots from the local
    block so the cross-scale ppermutes are off the critical path
    (VERDICT r2 task 8).
    """
    from mswe_gnn_tpu.models import base as base_model
    from mswe_gnn_tpu.models.activations import apply_activation

    assert not cfg.learned_pooling, "distributed path covers mean pooling"
    axis_size = mesh.shape[AXIS]
    L = cfg.num_scales
    ks = cfg.k_schedule

    def _pool_cross(x_fine, plan, n_int=None):
        tab, msk = plan["src_tab"][0], plan["smask"][0]
        d_max = tab.shape[1]
        # unpacked plan (n_int None): every slot may reference halo rows
        n_int = 0 if n_int is None else n_int
        sums = jnp.zeros((tab.shape[0], x_fine.shape[1]), x_fine.dtype)
        # interior slots (packed plans) read the local fine block —
        # independent of the exchange, so XLA aggregates them while the
        # ppermutes fly
        for d in range(n_int):
            sums = sums + jnp.take(x_fine, tab[:, d], axis=0) * msk[:, d:d + 1]
        if n_int < d_max:
            buf = _halo_concat(x_fine, plan["send_next"][0],
                               plan["send_prev"][0], axis_size)
            for d in range(n_int, d_max):
                sums = sums + jnp.take(buf, tab[:, d], axis=0) * msk[:, d:d + 1]
        cnt = msk.sum(axis=1)
        return jnp.where(cnt[:, None] > 0,
                         sums / jnp.maximum(cnt, 1.0)[:, None], 0.0)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(AXIS)),
        out_specs=P(AXIS),
    )
    def forward(params, dist):
        xs_b, xd_b, x0_b, nm_b = [], [], [], []
        n_s = cfg.static_node_features - int(cfg.with_WL)
        for i in range(L):
            x = jnp.concatenate([dist["x_static"][i][0],
                                 dist["x_dynamic"][i][0]], axis=-1)
            x0_b.append(x)
            x_s, x_d = x[:, :n_s], x[:, n_s:]
            if cfg.with_WL:
                wl = x_s[:, -1] + x_d[:, -cfg.out_dim]
                x_s = jnp.concatenate([x_s, wl[:, None]], axis=-1)
            xs_b.append(apply_mlp(params["static_node_encoder"], x_s,
                                  activation=cfg.mlp_activation))
            xd_b.append(apply_mlp(params["dynamic_node_encoder"], x_d,
                                  activation=cfg.mlp_activation))
            nm_b.append(dist["node_mask"][i][0])

        ea_b, ea_ext_b = [], []
        for i in range(L):
            pl = dist["proc"][i]
            ea = pl["ea"][0]
            ea_ext = pl["ext_ea"][0] if "ext_ea" in pl else None
            if cfg.edge_mlp:
                ea = apply_mlp(params["edge_encoder"], ea,
                               activation=cfg.mlp_activation)
                if ea_ext is not None and ea_ext.shape[-1] > 0:
                    ea_ext = apply_mlp(params["edge_encoder"], ea_ext,
                                       activation=cfg.mlp_activation)
            ea_b.append(ea)
            ea_ext_b.append(ea_ext)

        def proc(i, gnn_id):
            pl = dist["proc"][i]
            wm = None if wide_meta is None else wide_meta[i]
            if wm is not None and wm[0] > 1:
                plan = {"src_tab": pl["src_tab"][0], "smask": pl["smask"][0],
                        "ext_tab": pl["ext_tab"][0],
                        "ext_mask": pl["ext_mask"][0],
                        "send_next": pl["send_next"][0],
                        "send_prev": pl["send_prev"][0],
                        "width": wm[0], "ring_ptr": wm[1], "halo": wm[2]}
                return _dist_layer_wide(
                    params["gnn_processor"][gnn_id],
                    cfg.processor_cfg(ks[gnn_id]),
                    xs_b[i], xd_b[i], plan, ea_b[i], ea_ext_b[i], axis_size)
            return _dist_layer_local(
                params["gnn_processor"][gnn_id], cfg.processor_cfg(ks[gnn_id]),
                xs_b[i], xd_b[i], pl["src_tab"][0], pl["smask"][0], ea_b[i],
                pl["send_next"][0], pl["send_prev"][0], axis_size,
                n_interior=None if overlap is None else overlap[i])

        zeros_b = [jnp.zeros_like(b) for b in xd_b]
        x_down_b = [None] * L
        x_up_b = [None] * L

        # --- downsweep
        for i in range(L - 1):
            xd_b[i] = proc(i, i)
            x_down_b[i] = xd_b[i]
            pooled = _pool_cross(
                xd_b[i], dist["pool"][i],
                None if overlap_pool is None else overlap_pool[i])
            for j in range(L):
                xd_b[j] = zeros_b[j]
            xd_b[i + 1] = pooled
        x_down_b[L - 1] = xd_b[L - 1]

        # --- upsweep
        for i in range(L):
            scale = L - 1 - i
            xd_b[scale] = proc(scale, L - 1 + i)
            x_up_b[scale] = xd_b[scale]
            if i < L - 1:
                lvl = scale - 1
                pl = dist["unpool"][lvl]
                xd_b[lvl] = _dist_layer_local(
                    params["intra_scale_gnn"][i], cfg.intra_cfg(),
                    xs_b[lvl], xd_b[lvl], pl["src_tab"][0], pl["smask"][0],
                    None, pl["send_next"][0], pl["send_prev"][0], axis_size,
                    x_s_src=xs_b[scale], x_d_src=xd_b[scale],
                    n_interior=(None if overlap_unpool is None
                                else overlap_unpool[lvl]))
                if cfg.skip_connections:
                    xd_b[lvl] = xd_b[lvl] + x_down_b[lvl]

        outs = []
        for i in range(L):
            h = x_up_b[i]
            if cfg.gnn_activation is not None:
                h = apply_activation(cfg.gnn_activation, params["gnn_act"], h)
            o = apply_mlp(params["node_decoder"], h,
                          activation=cfg.mlp_activation)
            o = o + base_model.add_residual_connection(
                x0_b[i], params.get("residual_weights"), cfg.learned_residuals,
                cfg.previous_t, cfg.out_dim)
            o = jax.nn.relu(o)
            o = base_model.mask_small_wd(o, epsilon=0.0001)
            outs.append(o * nm_b[i][:, None])
        return tuple(outs)

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
