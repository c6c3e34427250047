"""Segment (gather/scatter) primitives on padded COO edge arrays.

These are the TPU-native replacement for the torch_scatter CUDA kernels the
reference relies on (reference models/gnn.py:437, graph_creation.py:1156-1164).
Everything here assumes *static shapes*: edge arrays are padded to a fixed
length and carry a mask; padded entries point at a valid node index but are
multiplied by zero before aggregation so they contribute nothing.

The scatter side lowers to ``jax.ops.segment_sum`` which XLA compiles to an
efficient sorted-segment reduction on TPU; ``indices_are_sorted=True`` is
passed when the caller guarantees destination-sorted (CSR-like) edge order.
The optimized hot-loop path is the slot-major ELL layout in
models/swegnn.py plus the banded MXU hop kernel (ops/band_hop.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of ``x`` at indices ``idx`` (``x[idx]``)."""
    return jnp.take(x, idx, axis=0)


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Sum ``data`` rows into ``num_segments`` buckets given by ``segment_ids``.

    Equivalent to torch_geometric ``scatter(..., reduce='sum')`` with
    ``dim_size=num_segments`` (reference models/gnn.py:437-438).
    """
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    weights: jax.Array | None = None,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Mean-reduce ``data`` rows per segment; empty segments yield 0.

    Matches torch_geometric ``scatter(..., reduce='mean')`` semantics used by
    the multiscale pooling (reference models/gnn.py:242-257): segments that
    receive no contributions are exactly zero.

    ``weights`` (per-row, e.g. an edge mask) lets padded rows be excluded from
    both numerator and denominator.
    """
    if weights is not None:
        data = data * weights[:, None]
        counts = jax.ops.segment_sum(
            weights, segment_ids, num_segments=num_segments,
            indices_are_sorted=indices_are_sorted,
        )
    else:
        counts = jax.ops.segment_sum(
            jnp.ones(data.shape[0], dtype=data.dtype), segment_ids,
            num_segments=num_segments, indices_are_sorted=indices_are_sorted,
        )
    sums = jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], 0.0)


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jax.Array:
    """Max-reduce per segment; empty segments yield 0 (PyG convention)."""
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    counts = jax.ops.segment_sum(
        jnp.ones(data.shape[0], dtype=jnp.int32), segment_ids,
        num_segments=num_segments, indices_are_sorted=indices_are_sorted,
    )
    return jnp.where(counts[:, None] > 0, out, 0.0)


def sort_edges_by_dst(edge_index: np.ndarray, *extras: np.ndarray):
    """Host-side: reorder a COO edge list so destinations are ascending.

    Done once at dataset build so device-side segment reductions can use
    ``indices_are_sorted=True``. Returns the permuted ``edge_index`` plus any
    per-edge ``extras`` arrays permuted the same way.
    """
    order = np.argsort(edge_index[1], kind="stable")
    out = edge_index[:, order]
    permuted = tuple(e[order] for e in extras)
    return (out, *permuted, order) if extras else (out, order)


def coalesce_edges(edge_index: np.ndarray) -> np.ndarray:
    """Host-side: remove duplicate directed edges (keep first occurrence)."""
    key = edge_index[0].astype(np.int64) * (edge_index.max() + 1) + edge_index[1]
    _, keep = np.unique(key, return_index=True)
    return edge_index[:, np.sort(keep)]
