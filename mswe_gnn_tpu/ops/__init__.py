from mswe_gnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    gather,
    coalesce_edges,
    sort_edges_by_dst,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "gather",
    "coalesce_edges",
    "sort_edges_by_dst",
]
