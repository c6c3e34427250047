from mswe_gnn_tpu.models.prepare import prepare_graph
from mswe_gnn_tpu.models.registry import get_model, build_model

__all__ = ["get_model", "build_model", "prepare_graph"]
