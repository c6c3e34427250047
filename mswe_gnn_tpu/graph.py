"""Static-shape graph containers — the TPU-native replacement for PyG Data.

Design (SURVEY.md §7): every mesh is padded to a fixed ``GraphSpec`` decided at
dataset-build time. Scale-major layout: nodes/edges of scale 0 (finest) come
first, then scale 1, ... so a scale is a *static* contiguous range — this
replaces the reference's runtime ptr surgery (reference training/train.py:31-65)
with compile-time slices. Batching is a leading batch axis + ``jax.vmap``
(every graph shares one spec), which is also the data-parallel sharding axis.

Padded entries:
- padded nodes have ``node_mask == 0``; their features are zero.
- padded edges point at the first node of their scale with ``edge_mask == 0``;
  messages are multiplied by the mask so they contribute exactly zero.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct



@dataclasses.dataclass(frozen=True, eq=True)
class GraphSpec:
    """Static (hashable) shape metadata for a padded multiscale graph.

    Mirrors the information the reference keeps in ``node_ptr``/``edge_ptr``/
    ``intra_edge_ptr`` (reference database/graph_creation.py:967-978) but as
    compile-time constants.

    All counts are the *padded* per-scale sizes, finest scale first.
    """
    node_counts: Tuple[int, ...]          # padded nodes per scale
    edge_counts: Tuple[int, ...]          # padded dual-graph edges per scale
    intra_edge_counts: Tuple[int, ...]    # padded transfer edges between scale i and i+1
    num_bc: int                           # padded number of ghost (BC) nodes
    # padded ELL table widths — part of the spec so graphs from differently
    # shaped meshes batch together (leaf shapes must match exactly)
    in_degree: int = 0                    # 0 = derive from this mesh alone
    pool_degree: int = 0
    unpool_degree: int = 0

    @property
    def num_scales(self) -> int:
        return len(self.node_counts)

    @property
    def num_nodes(self) -> int:
        return int(sum(self.node_counts))

    @property
    def num_edges(self) -> int:
        return int(sum(self.edge_counts))

    @property
    def num_intra_edges(self) -> int:
        return int(sum(self.intra_edge_counts))

    @property
    def node_ptr(self) -> Tuple[int, ...]:
        return tuple(np.cumsum([0, *self.node_counts]).tolist())

    @property
    def edge_ptr(self) -> Tuple[int, ...]:
        return tuple(np.cumsum([0, *self.edge_counts]).tolist())

    @property
    def intra_edge_ptr(self) -> Tuple[int, ...]:
        return tuple(np.cumsum([0, *self.intra_edge_counts]).tolist())

    def tile(self, b: int) -> "GraphSpec":
        """Spec of ``b`` same-spec graphs concatenated as one disconnected
        union, keeping the scale-major block structure (each scale block
        holds the b sub-blocks back to back)."""
        return GraphSpec(
            node_counts=tuple(b * c for c in self.node_counts),
            edge_counts=tuple(b * c for c in self.edge_counts),
            intra_edge_counts=tuple(b * c for c in self.intra_edge_counts),
            num_bc=b * self.num_bc,
            in_degree=self.in_degree, pool_degree=self.pool_degree,
            unpool_degree=self.unpool_degree)

    def node_slice(self, scale: int) -> slice:
        p = self.node_ptr
        return slice(p[scale], p[scale + 1])

    def edge_slice(self, scale: int) -> slice:
        p = self.edge_ptr
        return slice(p[scale], p[scale + 1])

    def intra_edge_slice(self, level: int) -> slice:
        p = self.intra_edge_ptr
        return slice(p[level], p[level + 1])


def _pad_to(x: np.ndarray, n: int, axis: int = 0, fill=0) -> np.ndarray:
    """Pad ``x`` with ``fill`` along ``axis`` up to length ``n``."""
    cur = x.shape[axis]
    if cur > n:
        raise ValueError(f"cannot pad axis {axis} of length {cur} down to {n}")
    if cur == n:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, n - cur)
    return np.pad(x, widths, constant_values=fill)


def round_up(n: int, multiple: int) -> int:
    return int(-(-n // multiple) * multiple)


@struct.dataclass
class FloodGraph:
    """One padded (multiscale) flood-mesh sample as a JAX pytree.

    Corresponds to one reference temporal sample (reference
    utils/dataset.py:410-471) plus the static mesh attributes. Fields ending in
    ``_mask`` are 1.0 for real entries, 0.0 for padding.

    Per-sample arrays (no batch axis; batching = leading vmap axis):
    - ``x_static [N, S]``     static node features (slopes/area/DEM selection)
    - ``x_dynamic [N, 2*previous_t]`` interleaved (h, |q|) past steps
    - ``y [N, 2, T]``         ground-truth future steps (optional)
    - ``edge_index [2, E]``   dual-graph COO, destination-sorted per scale
    - ``edge_attr [E, Fe]``   static edge features
    - ``intra_edge_index [2, EI]`` rows = (coarse idx, fine idx) as in the
       reference (models/gnn.py:310: ``col_coarse, row_fine = intra_mesh_edge_index``)
    - ``bc_nodes [Nbc]`` ghost-cell node ids; ``bc_values [Nbc, T+1]`` inflow
      per ghost node already divided by BC-edge length (reference
      utils/dataset.py:275); ``bc_kind`` static (1=depth, 2=discharge)
    - ``area [N]``, ``dem [N]`` physical fields used by losses/metrics
    """
    # --- dynamic (traced) leaves ---
    x_static: jax.Array
    x_dynamic: jax.Array
    edge_index: jax.Array
    edge_attr: jax.Array
    node_mask: jax.Array
    edge_mask: jax.Array
    intra_edge_index: jax.Array
    intra_edge_mask: jax.Array
    bc_nodes: jax.Array
    bc_mask: jax.Array
    bc_values: jax.Array
    bc_edge_length: jax.Array
    area: jax.Array
    dem: jax.Array
    y: Optional[jax.Array] = None
    # exogenous per-node forcing series [N, Ff, previous_t + T] (wind stress /
    # pressure of the reference's storm-surge extension, reference
    # utils/adforce_dataset.py:245); same dry-bed padding as ``bc_values``, so
    # the value at rollout step t is column t + previous_t - 1. Appended to
    # the static features each step (training/rollout.py:with_step_forcing).
    forcing: Optional[jax.Array] = None
    # ELL (padded neighbor-table) layout: turns the SpMM scatter into a
    # gather+sum — mesh in-degree is small and bounded, and TPU gathers are
    # far faster than scatter-adds. Entries are global edge ids; masked slots
    # point at edge 0 with weight 0.
    in_edge_table: Optional[jax.Array] = None   # [N, D_max] incoming edge ids
    in_edge_mask: Optional[jax.Array] = None    # [N, D_max]
    pool_table: Optional[jax.Array] = None      # [N, D_pool] intra-edge ids (fine children)
    pool_mask: Optional[jax.Array] = None       # [N, D_pool]
    unpool_table: Optional[jax.Array] = None    # [N, D_up] intra-edge ids (parent edges)
    unpool_mask: Optional[jax.Array] = None     # [N, D_up]
    # loop-invariant per-rollout cache (models/prepare.py): rebased slot
    # tables, slot source-node ids and slot-encoded edge features. Computed
    # ONCE outside the rollout scan — XLA does not hoist these gathers out of
    # the while loop itself, and recomputing them every step costs ~20% of a
    # dk15 rollout (profiled: s32 index gathers at 154 us x 8 per step).
    ell_cache: Optional[dict] = None
    # banded-gather plan (ops/band_hop.py): per-scale window starts and
    # window-relative slot sources for the MXU one-hot-matmul hop kernel.
    # {"scales": (None | {"win": [T], "idx_rel": [N_s, D]}, ...)}. Attached
    # host-side by ops.band_hop.attach_band_plan (needs concrete indices);
    # the static window widths live in ``band_meta``.
    band_plan: Optional[dict] = None

    # --- static (aux) fields ---
    # per-scale band window widths (None = no plan for that scale); part of
    # the jit cache key, matching ``band_plan``'s pytree structure
    band_meta: Optional[Tuple] = struct.field(pytree_node=False, default=None)
    spec: GraphSpec = struct.field(pytree_node=False, default=None)
    previous_t: int = struct.field(pytree_node=False, default=1)
    bc_kind: int = struct.field(pytree_node=False, default=2)
    temporal_res: float = struct.field(pytree_node=False, default=60.0)
    num_graphs: int = struct.field(pytree_node=False, default=1)

    @property
    def num_nodes(self) -> int:
        return self.x_static.shape[-2]

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[-1]

    @property
    def src(self) -> jax.Array:
        return self.edge_index[0]

    @property
    def dst(self) -> jax.Array:
        return self.edge_index[1]

    def finest_slice(self) -> slice:
        return self.spec.node_slice(0)

    def replace_dynamic(self, x_dynamic: jax.Array) -> "FloodGraph":
        return self.replace(x_dynamic=x_dynamic)


def build_flood_graph(
    *,
    x_static: np.ndarray,
    x_dynamic: np.ndarray,
    edge_index: np.ndarray,
    edge_attr: np.ndarray,
    spec: GraphSpec,
    raw_node_counts: Tuple[int, ...],
    raw_edge_counts: Tuple[int, ...],
    intra_edge_index: Optional[np.ndarray] = None,
    raw_intra_edge_counts: Tuple[int, ...] = (),
    bc_nodes: Optional[np.ndarray] = None,
    bc_values: Optional[np.ndarray] = None,
    bc_edge_length: Optional[np.ndarray] = None,
    bc_kind: int = 2,
    area: Optional[np.ndarray] = None,
    dem: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    forcing: Optional[np.ndarray] = None,
    previous_t: int = 1,
    temporal_res: float = 60.0,
    dtype=np.float32,
) -> FloodGraph:
    """Assemble a padded ``FloodGraph`` from raw (unpadded, scale-major) arrays.

    ``raw_*_counts`` give the true per-scale sizes before padding; node and
    edge indices in the raw arrays must already refer to the *raw* scale-major
    node numbering — they are remapped to the padded numbering here.
    """
    ns = spec.num_scales
    assert len(raw_node_counts) == ns and len(raw_edge_counts) == ns

    raw_node_ptr = np.cumsum([0, *raw_node_counts])
    pad_node_ptr = np.asarray(spec.node_ptr)

    # raw node id -> padded node id (per-scale offset shift)
    total_raw_nodes = int(raw_node_ptr[-1])
    node_remap = np.zeros(total_raw_nodes, dtype=np.int64)
    for s in range(ns):
        raw_ids = np.arange(raw_node_ptr[s], raw_node_ptr[s + 1])
        node_remap[raw_ids] = raw_ids - raw_node_ptr[s] + pad_node_ptr[s]

    N = spec.num_nodes
    node_mask = np.zeros(N, dtype=dtype)
    for s in range(ns):
        node_mask[pad_node_ptr[s]: pad_node_ptr[s] + raw_node_counts[s]] = 1.0

    def pad_nodes(arr, name):
        if arr is None:
            return None
        arr = np.asarray(arr)
        out_shape = (N,) + arr.shape[1:]
        out = np.zeros(out_shape, dtype=dtype)
        for s in range(ns):
            r0, r1 = raw_node_ptr[s], raw_node_ptr[s + 1]
            p0 = pad_node_ptr[s]
            out[p0: p0 + (r1 - r0)] = arr[r0:r1]
        return out

    x_static_p = pad_nodes(x_static, "x_static")
    x_dynamic_p = pad_nodes(x_dynamic, "x_dynamic")
    area_p = pad_nodes(area if area is not None else np.ones(total_raw_nodes), "area")
    dem_p = pad_nodes(dem if dem is not None else np.zeros(total_raw_nodes), "dem")
    y_p = pad_nodes(y, "y") if y is not None else None
    forcing_p = pad_nodes(forcing, "forcing") if forcing is not None else None

    # --- edges: per-scale pad; padded edges self-loop on the scale's first node
    raw_edge_ptr = np.cumsum([0, *raw_edge_counts])
    pad_edge_ptr = np.asarray(spec.edge_ptr)
    E = spec.num_edges
    ei = np.zeros((2, E), dtype=np.int32)
    ea = np.zeros((E,) + edge_attr.shape[1:], dtype=dtype)
    emask = np.zeros(E, dtype=dtype)
    for s in range(ns):
        r0, r1 = raw_edge_ptr[s], raw_edge_ptr[s + 1]
        p0 = pad_edge_ptr[s]
        n = r1 - r0
        block = node_remap[edge_index[:, r0:r1]]
        # destination-sort within the scale for sorted segment reductions
        order = np.argsort(block[1], kind="stable")
        ei[:, p0: p0 + n] = block[:, order]
        ea[p0: p0 + n] = edge_attr[r0:r1][order]
        emask[p0: p0 + n] = 1.0
        # padding edges: masked self-loops on the scale's last node id, which
        # keeps per-scale dst ascending (real dsts are <= last)
        ei[:, p0 + n: pad_edge_ptr[s + 1]] = pad_node_ptr[s + 1] - 1

    # --- intra (transfer) edges
    EI = spec.num_intra_edges
    if EI > 0:
        assert intra_edge_index is not None
        raw_ie_ptr = np.cumsum([0, *raw_intra_edge_counts])
        pad_ie_ptr = np.asarray(spec.intra_edge_ptr)
        iei = np.zeros((2, max(EI, 1)), dtype=np.int32)
        iemask = np.zeros(max(EI, 1), dtype=dtype)
        for lvl in range(ns - 1):
            r0, r1 = raw_ie_ptr[lvl], raw_ie_ptr[lvl + 1]
            p0 = pad_ie_ptr[lvl]
            n = r1 - r0
            block = node_remap[intra_edge_index[:, r0:r1]]
            order = np.argsort(block[0], kind="stable")  # sorted by coarse (dst)
            iei[:, p0: p0 + n] = block[:, order]
            iemask[p0: p0 + n] = 1.0
            anchor = pad_node_ptr[lvl + 2] - 1  # last node of the coarse scale
            iei[0, p0 + n: pad_ie_ptr[lvl + 1]] = anchor
            iei[1, p0 + n: pad_ie_ptr[lvl + 1]] = pad_node_ptr[lvl + 1] - 1
    else:
        iei = np.zeros((2, 1), dtype=np.int32)
        iemask = np.zeros(1, dtype=dtype)

    # --- boundary condition nodes
    nbc = spec.num_bc
    if bc_nodes is not None:
        raw_nbc = len(bc_nodes)
        bcn = np.zeros(nbc, dtype=np.int32)
        bcn[:raw_nbc] = node_remap[np.asarray(bc_nodes, dtype=np.int64)]
        bcm = np.zeros(nbc, dtype=dtype)
        bcm[:raw_nbc] = 1.0
        T1 = bc_values.shape[1]
        bcv = np.zeros((nbc, T1), dtype=dtype)
        bcv[:raw_nbc] = bc_values
        bel = np.ones(nbc, dtype=dtype)
        if bc_edge_length is not None:
            bel[:raw_nbc] = bc_edge_length
    else:
        bcn = np.zeros(nbc, dtype=np.int32)
        bcm = np.zeros(nbc, dtype=dtype)
        bcv = np.zeros((nbc, 1), dtype=dtype)
        bel = np.ones(nbc, dtype=dtype)

    # table widths rounded to 4: exact (odd) widths such as D=5 trigger
    # pathological XLA layout/compile times on TPU (>20 min vs ~3 min), and
    # the padded-slot traffic they save is smaller than that loss
    in_tab, in_msk = build_edge_slot_table(ei, emask, N, round_to=4,
                                           d_fixed=spec.in_degree)
    pool_tab, pool_msk = build_edge_slot_table(
        np.stack([iei[1], iei[0]]), iemask, N, round_to=4,
        d_fixed=spec.pool_degree)
    unpool_tab, unpool_msk = build_edge_slot_table(iei, iemask, N, round_to=4,
                                                   d_fixed=spec.unpool_degree)

    return FloodGraph(
        in_edge_table=jnp.asarray(in_tab),
        in_edge_mask=jnp.asarray(in_msk),
        pool_table=jnp.asarray(pool_tab),
        pool_mask=jnp.asarray(pool_msk),
        unpool_table=jnp.asarray(unpool_tab),
        unpool_mask=jnp.asarray(unpool_msk),
        x_static=jnp.asarray(x_static_p),
        x_dynamic=jnp.asarray(x_dynamic_p),
        edge_index=jnp.asarray(ei),
        edge_attr=jnp.asarray(ea),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(emask),
        intra_edge_index=jnp.asarray(iei),
        intra_edge_mask=jnp.asarray(iemask),
        bc_nodes=jnp.asarray(bcn),
        bc_mask=jnp.asarray(bcm),
        bc_values=jnp.asarray(bcv),
        bc_edge_length=jnp.asarray(bel),
        area=jnp.asarray(area_p),
        dem=jnp.asarray(dem_p),
        y=jnp.asarray(y_p) if y_p is not None else None,
        forcing=jnp.asarray(forcing_p) if forcing_p is not None else None,
        spec=spec,
        previous_t=previous_t,
        bc_kind=int(bc_kind),
        temporal_res=float(temporal_res),
    )


def build_edge_slot_table(edge_index: np.ndarray, edge_mask: np.ndarray,
                          num_nodes: int, round_to: int = 4,
                          d_fixed: int = 0):
    """Host-side ELL table: for each node, the ids of its incoming (real)
    edges, padded to the max in-degree rounded up to ``round_to``.

    Aggregation then becomes ``msgs[table] * mask -> sum(axis=1)`` — pure
    gathers, no scatter (the TPU-native SpMM formulation for bounded-degree
    mesh graphs).
    """
    dst = np.asarray(edge_index[1])
    from mswe_gnn_tpu import native

    if native.available() and d_fixed == 0:
        res = native.build_ell_table(dst, np.asarray(edge_mask, np.float32),
                                     num_nodes, round_to=round_to)
        if res is not None:
            return res
    real = np.asarray(edge_mask) > 0
    indeg = np.bincount(dst[real], minlength=num_nodes)
    dmax = int(indeg.max()) if len(dst) else 1
    if d_fixed:
        assert dmax <= d_fixed, (
            f"mesh in-degree {dmax} exceeds the spec's table width {d_fixed}")
        dmax = d_fixed
    else:
        dmax = max(round_up(max(dmax, 1), round_to), round_to)
    table = np.zeros((num_nodes, dmax), np.int32)
    mask = np.zeros((num_nodes, dmax), np.float32)
    fill = np.zeros(num_nodes, np.int64)
    for e in np.where(real)[0]:
        n = dst[e]
        table[n, fill[n]] = e
        mask[n, fill[n]] = 1.0
        fill[n] += 1
    return table, mask


def ell_aggregate(msgs: jax.Array, table: jax.Array, mask: jax.Array) -> jax.Array:
    """Sum per-edge messages into nodes via the ELL table (gather + sum)."""
    gathered = jnp.take(msgs, table, axis=0)          # [N, D, F]
    return (gathered * mask[..., None]).sum(axis=1)


def concat_graphs(graphs) -> FloodGraph:
    """Batch same-spec graphs as ONE disconnected-union graph (PyG-Batch
    style, but with the scale-major block structure preserved so all static
    slices keep working on the tiled spec).

    This is the TPU-preferred batching: no vmap (whose batched gathers
    compile and run poorly at scale) — just bigger blocks. Each scale block
    of the tiled spec holds the b graphs' sub-blocks back to back; index
    arrays (edge endpoints, ELL tables, BC nodes) are re-offset accordingly.

    Loss/metric semantics over the union equal the reference's
    concat-then-mean batch aggregation (reference training/loss.py:68-70);
    per-graph quantities reshape each scale block to [b, n_scale, ...].
    """
    g0 = graphs[0]
    spec = g0.spec
    b = len(graphs)
    for g in graphs[1:]:
        if g.spec != spec:
            raise ValueError("all graphs in a batch must share one GraphSpec")
        if g.previous_t != g0.previous_t or g.bc_kind != g0.bc_kind:
            raise ValueError("all graphs in a batch must share static settings")
    if b == 1:
        return g0
    tiled = spec.tile(b)
    ns = spec.num_scales
    node_ptr = np.asarray(spec.node_ptr)
    edge_ptr = np.asarray(spec.edge_ptr)
    intra_ptr = np.asarray(spec.intra_edge_ptr)
    t_node_ptr = np.asarray(tiled.node_ptr)
    t_edge_ptr = np.asarray(tiled.edge_ptr)
    t_intra_ptr = np.asarray(tiled.intra_edge_ptr)

    # id LUTs: old (per-graph) id -> new union id, one row per graph
    def make_lut(ptr, t_ptr, counts):
        total = int(ptr[-1])
        lut = np.zeros((b, total), np.int64)
        for s in range(len(counts)):
            ids = np.arange(ptr[s], ptr[s + 1])
            for g in range(b):
                lut[g, ids] = t_ptr[s] + g * counts[s] + (ids - ptr[s])
        return lut

    node_lut = make_lut(node_ptr, t_node_ptr, spec.node_counts)
    edge_lut = make_lut(edge_ptr, t_edge_ptr, spec.edge_counts)
    if spec.num_intra_edges > 0:
        intra_lut = make_lut(intra_ptr, t_intra_ptr, spec.intra_edge_counts)
    else:
        intra_lut = np.zeros((b, 1), np.int64)

    def concat_by(lut_ptr, counts, t_ptr, get):
        """Concatenate per-scale blocks of a per-element array."""
        parts = []
        for s in range(len(counts)):
            for g in range(b):
                parts.append(np.asarray(get(graphs[g]))[lut_ptr[s]: lut_ptr[s + 1]])
        return np.concatenate(parts, axis=0)

    def node_cat(get):
        return concat_by(node_ptr, spec.node_counts, t_node_ptr, get)

    def edge_cat(get):
        return concat_by(edge_ptr, spec.edge_counts, t_edge_ptr, get)

    def intra_cat(get):
        if spec.num_intra_edges == 0:
            return np.asarray(get(graphs[0]))
        return concat_by(intra_ptr, spec.intra_edge_counts, t_intra_ptr, get)

    # edge endpoints: concat per scale with per-graph node remap
    ei_parts = []
    iei_parts = []
    for s in range(ns):
        for g in range(b):
            blk = np.asarray(graphs[g].edge_index)[:, edge_ptr[s]: edge_ptr[s + 1]]
            ei_parts.append(node_lut[g][blk])
    for lvl in range(ns - 1):
        for g in range(b):
            blk = np.asarray(graphs[g].intra_edge_index)[:, intra_ptr[lvl]: intra_ptr[lvl + 1]]
            iei_parts.append(node_lut[g][blk])
    ei = np.concatenate(ei_parts, axis=1).astype(np.int32)
    iei = (np.concatenate(iei_parts, axis=1).astype(np.int32)
           if iei_parts else np.zeros((2, 1), np.int32))

    # ELL tables: rows follow node order; entries remapped through edge/intra luts
    def table_cat(get_tab, lut):
        parts = []
        for s in range(ns):
            for g in range(b):
                rows = np.asarray(get_tab(graphs[g]))[node_ptr[s]: node_ptr[s + 1]]
                parts.append(lut[g][rows])
        return np.concatenate(parts, axis=0).astype(np.int32)

    in_tab = table_cat(lambda g: g.in_edge_table, edge_lut)
    pool_tab = table_cat(lambda g: g.pool_table, intra_lut)
    unpool_tab = table_cat(lambda g: g.unpool_table, intra_lut)

    bc_nodes = np.concatenate(
        [node_lut[g][np.asarray(graphs[g].bc_nodes, np.int64)] for g in range(b)]
    ).astype(np.int32)

    def bc_cat(get):
        return np.concatenate([np.asarray(get(graphs[g])) for g in range(b)], 0)

    return FloodGraph(
        x_static=jnp.asarray(node_cat(lambda g: g.x_static)),
        x_dynamic=jnp.asarray(node_cat(lambda g: g.x_dynamic)),
        edge_index=jnp.asarray(ei),
        edge_attr=jnp.asarray(edge_cat(lambda g: g.edge_attr)),
        node_mask=jnp.asarray(node_cat(lambda g: g.node_mask)),
        edge_mask=jnp.asarray(edge_cat(lambda g: g.edge_mask)),
        intra_edge_index=jnp.asarray(iei),
        intra_edge_mask=jnp.asarray(intra_cat(lambda g: g.intra_edge_mask)),
        bc_nodes=jnp.asarray(bc_nodes),
        bc_mask=jnp.asarray(bc_cat(lambda g: g.bc_mask)),
        bc_values=jnp.asarray(bc_cat(lambda g: g.bc_values)),
        bc_edge_length=jnp.asarray(bc_cat(lambda g: g.bc_edge_length)),
        area=jnp.asarray(node_cat(lambda g: g.area)),
        dem=jnp.asarray(node_cat(lambda g: g.dem)),
        y=(jnp.asarray(node_cat(lambda g: g.y))
           if g0.y is not None else None),
        forcing=(jnp.asarray(node_cat(lambda g: g.forcing))
                 if g0.forcing is not None else None),
        in_edge_table=jnp.asarray(in_tab),
        in_edge_mask=jnp.asarray(node_cat(lambda g: g.in_edge_mask)),
        pool_table=jnp.asarray(pool_tab),
        pool_mask=jnp.asarray(node_cat(lambda g: g.pool_mask)),
        unpool_table=jnp.asarray(unpool_tab),
        unpool_mask=jnp.asarray(node_cat(lambda g: g.unpool_mask)),
        spec=tiled,
        previous_t=g0.previous_t,
        bc_kind=g0.bc_kind,
        temporal_res=g0.temporal_res,
        num_graphs=b,
    )


def stack_graphs(graphs) -> FloodGraph:
    """Stack same-spec graphs along a new leading batch axis (vmap batching).

    The TPU replacement for PyG ``Batch`` + the reference's multiscale ptr
    surgery (reference training/train.py:14-65): identical static specs mean
    batching is a pure ``tree_map(stack)``.
    """
    g0 = graphs[0]
    for g in graphs[1:]:
        if g.spec != g0.spec:
            raise ValueError("all graphs in a batch must share one GraphSpec")
        if g.previous_t != g0.previous_t or g.bc_kind != g0.bc_kind:
            raise ValueError("all graphs in a batch must share static settings")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *graphs)


class DeviceConcatPlan:
    """On-device batch assembly: ``plan(stacked, idx) == concat_graphs(
    [graphs[i] for i in idx])`` with zero per-batch host->device transfers
    beyond the ``[b]`` index vector.

    Motivation (TPU-native data path): the whole (same-spec) sample set is
    transferred ONCE as a ``stack_graphs`` pytree resident in HBM; each batch
    is then a pure gather + index-remap jitted on device. Besides dispatch
    efficiency, this works around the axon PJRT client leaking host memory
    proportional to every transferred byte (see examples/train_supervised.sh)
    — per-epoch traffic drops from ~1 GB to a few KB of indices and scalars.

    The union layout is identical to :func:`concat_graphs`: scale-major
    blocks, each holding the ``b`` graphs' sub-blocks back to back, with all
    index arrays (edge endpoints, ELL tables, BC nodes) re-based. Index
    remapping uses the closed form of ``make_lut``:
    ``new_id = (id - ptr[s]) + tiled_ptr[s] + slot * counts[s]`` where ``s``
    is the scale owning ``id`` (recovered with a searchsorted over the tiny
    ptr array).
    """

    def __init__(self, spec: GraphSpec, b: int):
        self.spec = spec
        self.b = b
        self.tiled = spec.tile(b)
        ns = spec.num_scales

        def perm(ptr, counts):
            g_of, r_of = [], []
            for s in range(len(counts)):
                for g in range(b):
                    g_of.append(np.full(counts[s], g, np.int32))
                    r_of.append(np.arange(ptr[s], ptr[s + 1], dtype=np.int32))
            return (jnp.asarray(np.concatenate(g_of)),
                    jnp.asarray(np.concatenate(r_of)))

        node_ptr = np.asarray(spec.node_ptr)
        edge_ptr = np.asarray(spec.edge_ptr)
        intra_ptr = np.asarray(spec.intra_edge_ptr)
        self._node_perm = perm(node_ptr, spec.node_counts)
        self._edge_perm = perm(edge_ptr, spec.edge_counts)
        self._intra_perm = (perm(intra_ptr, spec.intra_edge_counts)
                            if spec.num_intra_edges > 0 else None)
        nbc = spec.num_bc
        self._bc_perm = (jnp.asarray(np.repeat(np.arange(b, dtype=np.int32), nbc)),
                         jnp.asarray(np.tile(np.arange(nbc, dtype=np.int32), b)))

        def remap_tables(ptr, counts):
            t_ptr = np.cumsum([0, *[b * c for c in counts]])
            return (jnp.asarray(ptr, jnp.int32),
                    jnp.asarray(t_ptr[:-1], jnp.int32),
                    jnp.asarray(counts, jnp.int32))

        self._node_remap = remap_tables(node_ptr[:-1], spec.node_counts)
        self._edge_remap = remap_tables(edge_ptr[:-1], spec.edge_counts)
        self._intra_remap = (remap_tables(intra_ptr[:-1], spec.intra_edge_counts)
                             if spec.num_intra_edges > 0 else None)
        self._jit_build = jax.jit(self._build)

    @staticmethod
    def _remap(ids, slot, tables):
        """Closed-form make_lut: per-value scale lookup + affine rebase."""
        ptr, t_ptr, counts = tables
        s = jnp.clip(jnp.searchsorted(ptr, ids, side="right") - 1,
                     0, len(ptr) - 1)
        return ((ids - ptr[s]) + t_ptr[s]
                + slot.astype(jnp.int32) * counts[s]).astype(jnp.int32)

    def _gather(self, stacked_field, idx, perm):
        g_of, r_of = perm
        n = stacked_field.shape[1]
        flat = stacked_field.reshape((-1,) + stacked_field.shape[2:])
        return flat[idx[g_of] * n + r_of]

    def _build(self, stacked: FloodGraph, idx: jax.Array) -> FloodGraph:
        spec, b = self.spec, self.b
        node_p, edge_p = self._node_perm, self._edge_perm

        # edge endpoints: gather columns then value-remap node ids
        eg, ec = edge_p
        ei_cols = stacked.edge_index.transpose(0, 2, 1)  # [S, E, 2]
        ei = self._gather(ei_cols, idx, (eg, ec))        # [Eu, 2]
        ei = self._remap(ei, eg[:, None], self._node_remap).T

        if self._intra_perm is not None:
            ig, ic = self._intra_perm
            iei_cols = stacked.intra_edge_index.transpose(0, 2, 1)
            iei = self._gather(iei_cols, idx, (ig, ic))
            iei = self._remap(iei, ig[:, None], self._node_remap).T
            intra_mask = self._gather(stacked.intra_edge_mask, idx,
                                      self._intra_perm)
        else:
            iei = stacked.intra_edge_index[idx[0]]
            intra_mask = stacked.intra_edge_mask[idx[0]]

        ng = node_p[0]
        in_tab = self._remap(
            self._gather(stacked.in_edge_table, idx, node_p),
            ng[:, None], self._edge_remap)
        if self._intra_remap is not None:
            pool_tab = self._remap(
                self._gather(stacked.pool_table, idx, node_p),
                ng[:, None], self._intra_remap)
            unpool_tab = self._remap(
                self._gather(stacked.unpool_table, idx, node_p),
                ng[:, None], self._intra_remap)
        else:
            pool_tab = self._gather(stacked.pool_table, idx, node_p)
            unpool_tab = self._gather(stacked.unpool_table, idx, node_p)

        bcg, bcc = self._bc_perm
        bc_nodes = self._remap(
            self._gather(stacked.bc_nodes, idx, self._bc_perm),
            bcg, self._node_remap)

        nodes = lambda f: self._gather(f, idx, node_p)
        edges = lambda f: self._gather(f, idx, edge_p)
        bcs = lambda f: self._gather(f, idx, self._bc_perm)
        return FloodGraph(
            x_static=nodes(stacked.x_static),
            x_dynamic=nodes(stacked.x_dynamic),
            edge_index=ei,
            edge_attr=edges(stacked.edge_attr),
            node_mask=nodes(stacked.node_mask),
            edge_mask=edges(stacked.edge_mask),
            intra_edge_index=iei,
            intra_edge_mask=intra_mask,
            bc_nodes=bc_nodes,
            bc_mask=bcs(stacked.bc_mask),
            bc_values=bcs(stacked.bc_values),
            bc_edge_length=bcs(stacked.bc_edge_length),
            area=nodes(stacked.area),
            dem=nodes(stacked.dem),
            y=nodes(stacked.y) if stacked.y is not None else None,
            forcing=(nodes(stacked.forcing)
                     if stacked.forcing is not None else None),
            in_edge_table=in_tab,
            in_edge_mask=nodes(stacked.in_edge_mask),
            pool_table=pool_tab,
            pool_mask=nodes(stacked.pool_mask),
            unpool_table=unpool_tab,
            unpool_mask=nodes(stacked.unpool_mask),
            spec=self.tiled,
            previous_t=stacked.previous_t,
            bc_kind=stacked.bc_kind,
            temporal_res=stacked.temporal_res,
            num_graphs=b,
        )

    def __call__(self, stacked: FloodGraph, idx) -> FloodGraph:
        idx = jnp.asarray(idx, jnp.int32)
        assert idx.shape == (self.b,), (idx.shape, self.b)
        return self._jit_build(stacked, idx)
