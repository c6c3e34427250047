"""SWEGNN — the shallow-water-equations message-passing layer, TPU-first.

Re-derivation of the reference hot kernel (reference models/gnn.py:352-451):

    out_0 = H_0 x_d                         (filter matrix, optional)
    for k in 1..K:
        active_ij = [out has water at i or j]         (wet-front mask)
        s_ij  = MLP(x_s_i, x_s_j, x_d_i, x_d_j, e_ij) (learned flux)
        s_ij  = s_ij / ||s_ij||  (NaN -> 0)           (optional normalize)
        m_ij  = s_ij * (out_j - out_i)                (hydraulic gradient)
        out  += H_k * scatter_sum(m_ij -> i... dst)

TPU-native design choices (all numerics preserved exactly, see tests):

1. **Hop-invariant flux.** The edge-MLP inputs (x_s, x_d, e_ij) do not change
   across the K hops — only the wet-front mask and ``out`` do. The mask selects
   *which* edges contribute, never their values, so ``s_ij`` is computed ONCE
   per layer and reused for all K hops: a K-fold FLOP cut on the dominant cost
   vs the reference, which re-runs the MLP every hop.
2. **Decomposed first layer.** The first linear over the concatenation
   [x_s_i | x_s_j | x_d_i | x_d_j | e_ij] is computed as node-level matmuls
   (src-part and dst-part projections over N nodes) plus an edge-attr matmul,
   then gathered — fewer FLOPs than an [E, 5F] x [5F, H] matmul whenever
   E > N, and the matmuls are MXU-shaped.
3. **Masked-dense wet front.** The reference compacts active edges (dynamic
   shapes); here every edge is computed and inactive messages are multiplied
   by 0 — static shapes, identical values.
4. **Block-local state.** ``apply_swegnn_block`` operates on the *local*
   node blocks the edges actually touch (multiscale: one scale per call).
   The hop loop carries only [N_block, F] arrays — no full-graph
   dynamic-update-slice copies per hop (the MSGNN V-cycle calls this
   directly; ``apply_swegnn`` is the whole-graph wrapper).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mswe_gnn_tpu.models.mlp import (
    apply_linear,
    apply_mlp,
    init_linear,
    init_mlp,
    matmul,
)
from mswe_gnn_tpu.ops.segment import segment_sum


@dataclasses.dataclass(frozen=True)
class SWEGNNConfig:
    """Static hyperparameters of one SWEGNN layer
    (mirrors reference models/gnn.py:363-384)."""
    static_node_features: int
    dynamic_node_features: int
    edge_features: int
    K: int = 2
    normalize: bool = True
    with_filter_matrix: bool = True
    with_gradient: bool = True
    upwind_mode: bool = False
    mlp_layers: int = 2          # reference `n_layers` mlp kwarg
    mlp_activation: str = "prelu"
    mlp_bias: bool = True
    compute_dtype: str = "float32"   # 'bfloat16' = MXU-rate matmuls + half-width hop traffic
    use_pallas: bool = False         # fused VMEM-resident hop kernel (ops/pallas_hop.py)
    # Blocks with <= this many dst nodes run the hop as ONE flat gather into
    # an [Nd, D, F] tile instead of D per-slot gathers: coarse scales are
    # launch-bound (many <10us kernels), and the stacked intermediate is
    # small there. 0 disables. (At dk15 finest-scale size the per-slot loop
    # is 2.2x faster — the [Nd, D, F] HBM intermediate dominates — so the
    # threshold should stay well below ~20k nodes.)
    flat_hop_threshold: int = 0

    @property
    def edge_input_size(self) -> int:
        return self.edge_features + 2 * self.static_node_features + 2 * self.dynamic_node_features

    @property
    def edge_output_size(self) -> int:
        return self.dynamic_node_features

    @property
    def edge_hidden_size(self) -> int:
        return self.edge_output_size * 2


def init_swegnn(key, cfg: SWEGNNConfig) -> dict:
    k_mlp, k_filter = jax.random.split(key)
    params = {
        "edge_mlp": init_mlp(
            k_mlp,
            cfg.edge_input_size,
            cfg.edge_output_size,
            hidden_size=cfg.edge_hidden_size,
            n_layers=cfg.mlp_layers,
            bias=cfg.mlp_bias,
            activation=cfg.mlp_activation,
        )
    }
    if cfg.with_filter_matrix:
        keys = jax.random.split(k_filter, cfg.K + 1)
        params["filters"] = [
            init_linear(k, cfg.dynamic_node_features, cfg.dynamic_node_features, bias=False)
            for k in keys
        ]
    return params


def _edge_flux_block(
    params: dict,
    cfg: SWEGNNConfig,
    x_s_src: jax.Array,
    x_d_src: jax.Array,
    x_s_dst: jax.Array,
    x_d_dst: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    edge_attr: Optional[jax.Array],
) -> jax.Array:
    """Compute s_ij for every edge (hop-invariant part of the layer).

    First linear decomposed into per-node src/dst projections; remaining MLP
    layers run on the [E, H] edge matrix (MXU matmuls). All node arrays are
    block-local; ``src``/``dst`` index into them directly.
    """
    mlp = params["edge_mlp"]
    lin0 = mlp["layers"][0]
    W = lin0["w"]  # [(2s + 2d + fe), H] in concat order [xs_i, xs_j, xd_i, xd_j, e]
    s, d, fe = cfg.static_node_features, cfg.dynamic_node_features, cfg.edge_features
    W_ss, W_sd = W[:s], W[s: 2 * s]
    W_ds, W_dd = W[2 * s: 2 * s + d], W[2 * s + d: 2 * s + 2 * d]
    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype
    proj_src = (matmul(x_s_src, W_ss, cd)
                + matmul(x_d_src, W_ds, cd))            # [Ns, H]
    proj_dst = (matmul(x_s_dst, W_sd, cd)
                + matmul(x_d_dst, W_dd, cd))            # [Nd, H]
    h = jnp.take(proj_src, src, axis=0) + jnp.take(proj_dst, dst, axis=0)
    if fe > 0:
        h = h + matmul(edge_attr, W[2 * s + 2 * d:], cd)
    if "b" in lin0:
        h = h + lin0["b"]
    # remaining layers (activation after every linear incl. the first)
    from mswe_gnn_tpu.models.activations import apply_activation

    h = apply_activation(cfg.mlp_activation, mlp["acts"][0], h)
    rest = {
        "layers": mlp["layers"][1:],
        "acts": mlp["acts"][1:],
        "norms": mlp["norms"][1:],
    }
    s_ij = apply_mlp(rest, h, activation=cfg.mlp_activation, compute_dtype=cd)

    if cfg.normalize:
        norm = jnp.linalg.norm(s_ij, axis=-1, keepdims=True)
        s_ij = jnp.where(norm > 0, s_ij / jnp.where(norm > 0, norm, 1.0), 0.0)
    return s_ij


def _edge_flux_slots(
    params: dict,
    cfg: SWEGNNConfig,
    x_s_src: jax.Array,
    x_d_src: jax.Array,
    x_s_dst: jax.Array,
    x_d_dst: jax.Array,
    src_slots,
    ea_slots,
    slot_mask: jax.Array,
):
    """Compute the flux directly in ELL slot layout -> D x [Nd, F] slots.

    Slot d of dst node i is the edge (src_slots[d][i] -> i), so the dst-side
    projection needs NO gather at all (it's this node's own row) and the flux
    never exists edge-major — vs the edge-major path this removes two
    [E, H]-sized gathers per layer (dst projection + flux-to-slot regather).
    Masked slots are zeroed via ``slot_mask`` (their table entries alias edge
    0, a real edge, so the computed garbage is finite and then killed).
    """
    from mswe_gnn_tpu.models.activations import apply_activation

    mlp = params["edge_mlp"]
    lin0 = mlp["layers"][0]
    W = lin0["w"]
    s, d, fe = cfg.static_node_features, cfg.dynamic_node_features, cfg.edge_features
    W_ss, W_sd = W[:s], W[s: 2 * s]
    W_ds, W_dd = W[2 * s: 2 * s + d], W[2 * s + d: 2 * s + 2 * d]
    W_e = W[2 * s + 2 * d:]
    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype
    proj_src = (matmul(x_s_src, W_ss, cd)
                + matmul(x_d_src, W_ds, cd))            # [Ns, H]
    proj_dst = (matmul(x_s_dst, W_sd, cd)
                + matmul(x_d_dst, W_dd, cd))            # [Nd, H]
    rest = {
        "layers": mlp["layers"][1:],
        "acts": mlp["acts"][1:],
        "norms": mlp["norms"][1:],
    }
    slots = []
    for k in range(len(src_slots)):
        h = jnp.take(proj_src, src_slots[k], axis=0) + proj_dst
        if fe > 0:
            h = h + matmul(ea_slots[k], W_e, cd)
        if "b" in lin0:
            h = h + lin0["b"]
        h = apply_activation(cfg.mlp_activation, mlp["acts"][0], h)
        s_k = apply_mlp(rest, h, activation=cfg.mlp_activation, compute_dtype=cd)
        if cfg.normalize:
            norm = jnp.linalg.norm(s_k, axis=-1, keepdims=True)
            s_k = jnp.where(norm > 0, s_k / jnp.where(norm > 0, norm, 1.0), 0.0)
        slots.append(s_k * slot_mask[:, k:k + 1])
    return slots


# Gather-table chunk target for concat-batched hops. The bare-gather
# microbench says per-graph 23k-row tables gather ~29% faster than a 185k
# batch-8 union (results_repo/batch_gather_microbench.json), but in the REAL
# rollout the hop gathers fuse with the flux elementwise chain and the
# end-to-end effect inverts: measured dk15 batch curves on v5e read
# batch 4 = 0.2132 s/sim as one 92k block vs 0.2294 as two 46k chunks, and
# batch 8 = 0.2707 unchunked vs 0.2783 at two 92k chunks / 0.2664 at eight
# 23k chunks — chunking never beats the fused single-block hop at dk15
# scale (ROADMAP round 5). The default therefore only chunks unions past
# ~200k rows (= beyond the measured batch-8 regime, where VMEM staging of
# the state table is unambiguously blown); the machinery and its parity
# test stay for the larger meshes where it applies. Override with
# MSWE_HOP_CHUNK_ROWS for experiments.
HOP_CHUNK_TARGET_ROWS = int(os.environ.get("MSWE_HOP_CHUNK_ROWS", 200_000))


def _hop_chunks(n_dst: int, n_src: int, sub_blocks: int) -> int:
    """Smallest chunk count (a divisor of ``sub_blocks``, so chunks are whole
    graphs of equal padded size) that brings both the dst and src blocks of a
    concat-batched hop to at most ``HOP_CHUNK_TARGET_ROWS`` rows. Returns 1
    (single-block hop) when the block already fits or cannot be split."""
    if sub_blocks <= 1 or n_dst % sub_blocks or n_src % sub_blocks:
        return 1
    rows = max(n_dst, n_src)
    for c in range(1, sub_blocks + 1):
        if sub_blocks % c == 0 and rows // c <= HOP_CHUNK_TARGET_ROWS:
            return c
    return sub_blocks


def apply_swegnn_block(
    params: dict,
    cfg: SWEGNNConfig,
    x_s_src: jax.Array,
    x_d_src: jax.Array,
    x_s_dst: jax.Array,
    x_d_dst: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    edge_attr: Optional[jax.Array] = None,
    edge_mask: Optional[jax.Array] = None,
    same_block: bool = True,
    dst_sorted: bool = True,
    agg_table: Optional[jax.Array] = None,
    agg_mask: Optional[jax.Array] = None,
    ea_slots=None,
    src_slot_table: Optional[jax.Array] = None,
    band_plan: Optional[dict] = None,
    band_w: Optional[int] = None,
    sub_blocks: int = 1,
) -> jax.Array:
    """One SWEGNN layer on block-local arrays -> updated dst block [Nd, F].

    ``src``/``dst`` are indices local to the src/dst blocks. When
    ``same_block`` the src block IS the dst block (the multiscale processor
    case) and neighbor gathers see the evolving hop state; otherwise the
    blocks must be disjoint node sets (the un-pooling case) and sources stay
    constant across hops — exactly the reference semantics, where hop updates
    only ever touch destination rows (reference models/gnn.py:437-443).

    ``agg_table``/``agg_mask`` [Nd, D] select the ELL aggregation path:
    per-destination incoming-edge slots (ids local to the edge block passed
    in), replacing the segment-sum scatter with gathers — the fast path on
    TPU for bounded-degree meshes.

    ``sub_blocks`` > 1 declares the block a concatenation of that many
    equal-sized, mutually disconnected sub-graphs (concat batching,
    graph.py:concat_graphs: each scale block holds the b graphs' sub-blocks
    back to back). When the union block outgrows the gather unit's
    VMEM-staging sweet spot (``HOP_CHUNK_TARGET_ROWS``), the hop loop runs
    per chunk-of-graphs on static slices so every state-table gather stays
    at the peak rate — the batch-8 dk15 union table (185k rows, 23.7 MB
    bf16) gathers ~25% under peak as one block
    (results_repo/batch_gather_microbench.json). Numerics are unchanged:
    sources of a chunk's rows lie within the chunk (graphs are disjoint;
    padded slots are masked).
    """
    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype
    n_dst = x_d_dst.shape[0]

    if cfg.with_filter_matrix:
        out = apply_linear(params["filters"][0], x_d_dst, compute_dtype=cd)
        out_src = out if same_block else apply_linear(
            params["filters"][0], x_d_src, compute_dtype=cd)
    else:
        out = x_d_dst
        out_src = out if same_block else x_d_src

    if agg_table is not None:
        # Node-major fast path: the flux is computed directly in ELL slot
        # layout (see _edge_flux_slots) and each hop is D row-gathers of
        # `out` fused into a single [Nd, F] elementwise pass plus one small
        # matmul — no [Nd, D, F] or [E, H] HBM intermediates, no scatter.
        # (Measured 2.2x faster than the [Nd, D, F] take_along hop and
        # another ~15% from the slot-major flux on v5e at dk15 scale.)
        d_max = agg_table.shape[1]
        fe = cfg.edge_features
        if src_slot_table is not None:
            # loop-invariant slot sources precomputed once per rollout
            # (models/prepare.py) — a column slice, not a per-step gather
            src_slots = [src_slot_table[:, d] for d in range(d_max)]
        else:
            src_slots = [jnp.take(src, agg_table[:, d]) for d in range(d_max)]
        if ea_slots is None and fe > 0:
            ea_slots = [jnp.take(edge_attr, agg_table[:, d], axis=0)
                        for d in range(d_max)]
        s_slots = _edge_flux_slots(params, cfg, x_s_src, x_d_src,
                                   x_s_dst, x_d_dst, src_slots, ea_slots,
                                   agg_mask)
        if cfg.use_pallas and same_block:
            from mswe_gnn_tpu.ops.pallas_hop import fused_hop, supported

            if supported(n_dst, out.shape[1], out.dtype):
                s_tab = jnp.stack(s_slots, axis=1)                   # [Nd,D,F]
                src_tab = jnp.stack(src_slots, axis=1)               # [Nd,D]
                for k in range(cfg.K):
                    agg = fused_hop(out, src_tab, s_tab, 0,
                                    with_gradient=cfg.with_gradient,
                                    upwind=cfg.upwind_mode)
                    if cfg.with_filter_matrix:
                        agg = apply_linear(params["filters"][k + 1], agg,
                                           compute_dtype=cd)
                    out = out + agg
                return out
        if cd is not None:
            # halve hop-loop HBM traffic: flux table and the hop state live
            # in bf16; the filter matmul accumulates back to f32
            s_slots = [s.astype(cd) for s in s_slots]
            out = out.astype(cd)
            if not same_block:
                out_src = out_src.astype(cd)
        if band_plan is not None and band_w is not None and same_block:
            # banded MXU hop (ops/band_hop.py): the D slot gathers become
            # one-hot matmuls against a VMEM-resident state window — no
            # gather-unit traffic. Plan attached host-side (attach_band_plan).
            from mswe_gnn_tpu.ops.band_hop import band_hop, supported

            if supported(n_dst, out.shape[1], out.dtype):
                s_tab = jnp.concatenate(s_slots, axis=1)         # [Nd, D*F]
                ws, we = band_w
                for k in range(cfg.K):
                    agg = band_hop(out, s_tab, band_plan["idx_rel"],
                                   band_plan["win"], ws=ws, we=we,
                                   with_gradient=cfg.with_gradient,
                                   upwind=cfg.upwind_mode)
                    if cfg.with_filter_matrix:
                        agg = apply_linear(params["filters"][k + 1], agg,
                                           compute_dtype=cd)
                    if cd is not None:
                        agg = agg.astype(cd)
                    out = out + agg
                return out.astype(x_d_dst.dtype) if cd is not None else out
        n_src = x_d_src.shape[0]
        chunks = _hop_chunks(n_dst, n_src, sub_blocks)
        if chunks > 1:
            # concat-batch hop: static chunk slices keep every gather on a
            # state table inside the gather unit's VMEM-staging sweet spot
            # (see docstring + _hop_chunks). A chunk is a whole number of
            # graphs, so sources of chunk g are global block ids in
            # [g*ms, (g+1)*ms) — rebased once here (cheap int VPU work vs
            # the row gathers it feeds). Masked padding slots alias edge 0
            # of the whole scale block, so their rebased index is NEGATIVE
            # for g > 0: take must run with mode='clip' (the default 'fill'
            # turns them into NaN, and NaN * 0-mask = NaN); the clipped
            # garbage row is then killed by the slot mask already folded
            # into s_slots.
            md, ms = n_dst // chunks, n_src // chunks
            src_loc = [[src_slots[d][g * md:(g + 1) * md] - g * ms
                        for d in range(d_max)] for g in range(chunks)]
            s_loc = [[s_slots[d][g * md:(g + 1) * md] for d in range(d_max)]
                     for g in range(chunks)]
            outs = [out[g * md:(g + 1) * md] for g in range(chunks)]
            srcs_const = (None if same_block else
                          [out_src[g * ms:(g + 1) * ms]
                           for g in range(chunks)])
            for k in range(cfg.K):
                for g in range(chunks):
                    o = outs[g]
                    src_ref = o if same_block else srcs_const[g]
                    dst_act = (o.sum(axis=1, keepdims=True) != 0).astype(o.dtype)
                    agg = jnp.zeros_like(o)
                    for d in range(d_max):
                        nb = jnp.take(src_ref, src_loc[g][d], axis=0,
                                      mode="clip")
                        act = jnp.maximum(
                            (nb.sum(axis=-1, keepdims=True) != 0).astype(o.dtype),
                            dst_act)
                        if cfg.with_gradient:
                            diff = o - nb
                            if cfg.upwind_mode:
                                diff = jnp.maximum(diff, 0.0)
                            agg = agg + diff * s_loc[g][d] * act
                        else:
                            agg = agg + s_loc[g][d] * nb * act
                    if cfg.with_filter_matrix:
                        agg = apply_linear(params["filters"][k + 1], agg,
                                           compute_dtype=cd)
                    if cd is not None:
                        agg = agg.astype(cd)
                    outs[g] = o + agg
            out = jnp.concatenate(outs, axis=0)
            return out.astype(x_d_dst.dtype) if cd is not None else out
        if n_dst <= cfg.flat_hop_threshold and same_block:
            # launch-count path for small blocks: one flat gather + one
            # stacked elementwise reduce per hop (vs D kernels each)
            s_tab = jnp.stack(s_slots, axis=1)                    # [Nd, D, F]
            flat_src = (src_slot_table if src_slot_table is not None
                        else jnp.stack(src_slots, axis=1)).reshape(-1)  # [Nd*D]
            f = out.shape[1]
            for k in range(cfg.K):
                dst_act = (out.sum(axis=1, keepdims=True) != 0).astype(out.dtype)
                nb = jnp.take(out, flat_src, axis=0).reshape(n_dst, d_max, f)
                act = jnp.maximum(
                    (nb.sum(axis=-1, keepdims=True) != 0).astype(out.dtype),
                    dst_act[:, :, None])
                if cfg.with_gradient:
                    diff = out[:, None, :] - nb
                    if cfg.upwind_mode:
                        diff = jnp.maximum(diff, 0.0)
                    agg = (diff * s_tab * act).sum(axis=1)
                else:
                    agg = (s_tab * nb * act).sum(axis=1)
                if cfg.with_filter_matrix:
                    agg = apply_linear(params["filters"][k + 1], agg,
                                       compute_dtype=cd)
                if cd is not None:
                    agg = agg.astype(cd)
                out = out + agg
            return out.astype(x_d_dst.dtype) if cd is not None else out
        for k in range(cfg.K):
            src_ref = out if same_block else out_src
            # wet-front mask from data already on hand: src activity is
            # (nb row-sum != 0) — no scalar gather (which is very slow on TPU)
            dst_act = (out.sum(axis=1, keepdims=True) != 0).astype(out.dtype)
            agg = jnp.zeros_like(out)
            for d in range(d_max):
                nb = jnp.take(src_ref, src_slots[d], axis=0)         # [Nd,F]
                act = jnp.maximum(
                    (nb.sum(axis=-1, keepdims=True) != 0).astype(out.dtype),
                    dst_act)
                if cfg.with_gradient:
                    # hydraulic gradient: out[dst] - out[src] (reference gnn.py:430)
                    diff = out - nb
                    if cfg.upwind_mode:
                        diff = jnp.maximum(diff, 0.0)
                    agg = agg + diff * s_slots[d] * act
                else:
                    agg = agg + s_slots[d] * nb * act
            if cfg.with_filter_matrix:
                agg = apply_linear(params["filters"][k + 1], agg, compute_dtype=cd)
            if cd is not None:
                agg = agg.astype(cd)
            out = out + agg
        return out.astype(x_d_dst.dtype) if cd is not None else out

    # edge-major (segment-sum) path: flux per edge, scatter into dst
    s_ij = _edge_flux_block(params, cfg, x_s_src, x_d_src, x_s_dst, x_d_dst,
                            src, dst, edge_attr)
    if edge_mask is not None:
        s_ij = s_ij * edge_mask[:, None]

    for k in range(cfg.K):
        # wet-front mask: edges with at least one "active" endpoint
        src_ref = out if same_block else out_src
        dst_active = (out.sum(axis=1) != 0).astype(out.dtype)
        if same_block:
            src_active = dst_active
        else:
            src_active = (src_ref.sum(axis=1) != 0).astype(out.dtype)
        e_active = jnp.maximum(jnp.take(src_active, src), jnp.take(dst_active, dst))

        if cfg.with_gradient:
            grad = jnp.take(out, dst, axis=0) - jnp.take(src_ref, src, axis=0)
            if cfg.upwind_mode:
                grad = jnp.maximum(grad, 0.0)
            msg = grad * s_ij
        else:
            msg = s_ij * jnp.take(src_ref, src, axis=0)

        msg = msg * e_active[:, None]
        agg = segment_sum(msg, dst, num_segments=n_dst,
                          indices_are_sorted=dst_sorted)
        if cfg.with_filter_matrix:
            agg = apply_linear(params["filters"][k + 1], agg, compute_dtype=cd)
        out = out + agg
    return out


def apply_swegnn(
    params: dict,
    cfg: SWEGNNConfig,
    x_s: jax.Array,
    x_d: jax.Array,
    src: jax.Array,
    dst: jax.Array,
    edge_attr: Optional[jax.Array] = None,
    edge_mask: Optional[jax.Array] = None,
    src_range: Optional[Tuple[int, int]] = None,
    dst_range: Optional[Tuple[int, int]] = None,
    dst_sorted: bool = True,
    agg_table: Optional[jax.Array] = None,
    agg_mask: Optional[jax.Array] = None,
    ea_slots=None,
    src_slot_table: Optional[jax.Array] = None,
    band_plan: Optional[dict] = None,
    band_w: Optional[int] = None,
    sub_blocks: int = 1,
) -> jax.Array:
    """Whole-graph SWEGNN layer: K hops of learned-flux message passing.

    ``src_range``/``dst_range`` are static node slices containing every edge
    source / destination; they must be identical or disjoint. The hop loop
    runs block-locally (``apply_swegnn_block``); rows outside ``dst_range``
    of the returned array are H_0-transformed but otherwise untouched,
    matching the reference where each scale's processor applies its filter
    to the full node array (reference models/gnn.py:401-404 called from :304).
    """
    num_nodes = x_d.shape[0]
    lo, hi = (0, num_nodes) if dst_range is None else dst_range
    slo, shi = (0, num_nodes) if src_range is None else src_range
    same = (slo, shi) == (lo, hi)
    assert same or shi <= lo or hi <= slo, \
        "src_range and dst_range must be identical or disjoint"

    block = apply_swegnn_block(
        params, cfg,
        x_s[slo:shi], x_d[slo:shi], x_s[lo:hi], x_d[lo:hi],
        src if slo == 0 else src - slo,
        dst if lo == 0 else dst - lo,
        edge_attr=edge_attr, edge_mask=edge_mask, same_block=same,
        dst_sorted=dst_sorted, agg_table=agg_table, agg_mask=agg_mask,
        ea_slots=ea_slots, src_slot_table=src_slot_table,
        band_plan=band_plan, band_w=band_w, sub_blocks=sub_blocks)

    if dst_range is None:
        return block

    cd = None if cfg.compute_dtype == "float32" else cfg.compute_dtype
    if cfg.with_filter_matrix:
        out = apply_linear(params["filters"][0], x_d, compute_dtype=cd)
    else:
        out = x_d
    out = out.astype(block.dtype)
    return out.at[lo:hi].set(block)
