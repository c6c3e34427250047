"""Reference-pickle ingestion without torch_geometric installed.

Forges a pickle stream whose classes live in a fake ``torch_geometric``
module laid out like PyG 2.x (``Data`` holding ``_store._mapping``), removes
the module, and loads it through the stub unpickler — the path a user takes
with the Zenodo archives (reference utils/load.py:19-38) on this image.
"""
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mswe_gnn_tpu.data.dataset import SimulationRecord
from mswe_gnn_tpu.data.torch_compat import load_reference_pickle


def _fake_pyg_modules():
    """Install fake torch_geometric modules mimicking PyG 2.x pickling."""
    tg = types.ModuleType("torch_geometric")
    tg_data = types.ModuleType("torch_geometric.data")
    tg_data_data = types.ModuleType("torch_geometric.data.data")
    tg_storage = types.ModuleType("torch_geometric.data.storage")

    class GlobalStorage:
        def __init__(self, mapping):
            self._mapping = mapping

        def __getstate__(self):
            return {"_mapping": self._mapping}

        def __setstate__(self, state):
            self.__dict__.update(state)

    class Data:
        def __init__(self, **kwargs):
            self._store = GlobalStorage(dict(kwargs))

        def __getstate__(self):
            return {"_store": self._store}

        def __setstate__(self, state):
            self.__dict__.update(state)

    tg_data_data.Data = Data
    tg_storage.GlobalStorage = GlobalStorage
    tg_data.Data = Data
    Data.__module__ = "torch_geometric.data.data"
    Data.__qualname__ = "Data"
    GlobalStorage.__module__ = "torch_geometric.data.storage"
    GlobalStorage.__qualname__ = "GlobalStorage"
    mods = {"torch_geometric": tg, "torch_geometric.data": tg_data,
            "torch_geometric.data.data": tg_data_data,
            "torch_geometric.data.storage": tg_storage}
    sys.modules.update(mods)
    return mods, Data


def _reference_shaped_data(Data, n0=12, n1=6, t=5):
    n = n0 + n1
    ei0 = np.stack([np.arange(n0 - 1), np.arange(1, n0)])
    ei0 = np.concatenate([ei0, ei0[::-1]], axis=1)
    ei1 = np.stack([np.arange(n1 - 1), np.arange(1, n1)]) + n0
    ei1 = np.concatenate([ei1, ei1[::-1]], axis=1)
    ei = np.concatenate([ei0, ei1], axis=1)
    e = ei.shape[1]
    fine = np.arange(n0)
    intra = np.stack([n0 + fine // 2, fine])
    tt = torch.tensor
    return Data(
        WD=tt(np.abs(np.random.randn(n, t)).astype(np.float32)),
        VX=tt(np.random.randn(n, t).astype(np.float32)),
        VY=tt(np.random.randn(n, t).astype(np.float32)),
        DEM=tt(np.random.randn(n).astype(np.float32)),
        area=tt(np.abs(np.random.randn(n).astype(np.float32)) + 1),
        edge_index=tt(ei),
        face_distance=tt(np.ones(e, np.float32)),
        face_relative_distance=tt(np.random.randn(e, 2).astype(np.float32)),
        edge_slope=tt(np.zeros(e, np.float32)),
        node_ptr=tt(np.asarray([0, n0, n])),
        edge_ptr=tt(np.asarray([0, ei0.shape[1], e])),
        intra_edge_ptr=tt(np.asarray([0, intra.shape[1]])),
        intra_mesh_edge_index=tt(intra),
        node_BC=tt(np.asarray([0])),
        edge_BC_length=tt(np.asarray([2.0], np.float32)),
        BC=tt(np.abs(np.random.randn(1, 2, t)).astype(np.float32)),
        type_BC=tt(np.asarray([2])),
    )


def test_stub_unpickler_loads_without_pyg(tmp_path):
    mods, Data = _fake_pyg_modules()
    try:
        ds = [_reference_shaped_data(Data) for _ in range(3)]
        p = tmp_path / "ds.pkl"
        with open(p, "wb") as f:
            pickle.dump(ds, f)
    finally:
        for m in mods:
            sys.modules.pop(m, None)

    # module gone: only the stub path can load this
    records = load_reference_pickle(str(p), seed=0)
    assert len(records) == 3
    r = records[0]
    assert isinstance(r, SimulationRecord)
    assert r.mesh.num_scales == 2
    assert r.wd.shape == (18, 5)
    assert r.mesh.num_nodes == 18
    assert len(r.mesh.ghosts.ghost_nodes) == 1
    # BC series normalized by the BC edge length (reference dataset.py:275)
    assert r.bc_per_length.shape == (1, 5)
