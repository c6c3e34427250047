"""Byte-faithful Zenodo-pickle fixture factory (VERDICT r3 missing #1).

The reference publishes its datasets as ``pickle.dump(list_of_Data)``
(reference database/graph_creation.py:1681-1703 ``save_database``), where
each element is a torch_geometric 2.x ``Data``. A real PyG 2.x pickle stream
has this exact shape:

- GLOBAL ``torch_geometric.data.data Data``; the instance's state is its
  plain ``__dict__`` = ``{'_store': <GlobalStorage>}`` (Data defines no
  ``__getstate__``).
- GLOBAL ``torch_geometric.data.storage GlobalStorage``; its
  ``__getstate__`` copies ``__dict__`` and DEREFERENCES the ``_parent``
  weakref, so the pickled state is
  ``{'_parent': <the Data object — a memo cycle>, '_mapping': {attr: tensor}}``
  and ``__setstate__`` re-wraps ``_parent`` in a weakref.
- ``data.mesh`` holds the reference's own ``database.graph_creation``
  ``MultiscaleMesh`` instance (plain ``__dict__`` of numpy arrays).

This module installs fake modules that replicate those pickling semantics
bit-for-bit at the opcode level (same GLOBAL names, same state structure,
same ``_mapping`` insertion order as ``convert_mesh_to_pyg``, reference
database/graph_creation.py:1483-1582), emits datasets from
:class:`SimulationRecord` objects, and removes the modules again — leaving a
pickle only the production stub unpickler (or a real PyG install) can load.
"""
from __future__ import annotations

import pickle
import sys
import types
import weakref

import numpy as np
import torch


def install_fake_pyg():
    """Install fake ``torch_geometric`` + reference ``database`` modules whose
    pickling matches PyG 2.x / the reference classes. Returns
    ``(mods, Data, MultiscaleMesh)``; pop ``mods`` from ``sys.modules`` after
    dumping."""

    class BaseStorage:
        # PyG 2.x torch_geometric/data/storage.py: _mapping in __dict__,
        # public attrs routed into _mapping, _parent held as a weakref
        def __init__(self, _mapping=None, **kwargs):
            object.__setattr__(self, "_mapping", {})
            for key, value in kwargs.items():
                setattr(self, key, value)
            if _mapping:
                self._mapping.update(_mapping)

        def __setattr__(self, key, value):
            if key == "_parent":
                self.__dict__[key] = weakref.ref(value)
            elif key[:1] == "_":
                self.__dict__[key] = value
            else:
                self._mapping[key] = value

        def __getattr__(self, key):
            if key == "_mapping":
                raise AttributeError(key)
            try:
                return self.__dict__["_mapping"][key]
            except KeyError:
                raise AttributeError(key) from None

        def __getstate__(self):
            out = self.__dict__.copy()
            _parent = out.get("_parent", None)
            if _parent is not None:
                out["_parent"] = _parent()   # deref: pickled state holds the
            return out                       # Data object itself (memo cycle)

        def __setstate__(self, mapping):
            for key, value in mapping.items():
                self.__dict__[key] = value
            _parent = self.__dict__.get("_parent", None)
            if _parent is not None:
                self.__dict__["_parent"] = weakref.ref(_parent)

    class GlobalStorage(BaseStorage):
        pass

    class Data:
        # PyG 2.x torch_geometric/data/data.py: all attribute traffic goes
        # through _store; no __getstate__/__setstate__ (plain __dict__ state)
        def __init__(self, **kwargs):
            self.__dict__["_store"] = GlobalStorage(_parent=self)
            for key, value in kwargs.items():
                setattr(self, key, value)

        def __setattr__(self, key, value):
            setattr(self._store, key, value)

        def __getattr__(self, key):
            if key == "_store":
                raise AttributeError(key)
            return getattr(self.__dict__["_store"], key)

    class Mesh:
        pass

    class MultiscaleMesh(Mesh):
        pass

    tg = types.ModuleType("torch_geometric")
    tg_data = types.ModuleType("torch_geometric.data")
    tg_data_data = types.ModuleType("torch_geometric.data.data")
    tg_storage = types.ModuleType("torch_geometric.data.storage")
    db = types.ModuleType("database")
    db_gc = types.ModuleType("database.graph_creation")
    for cls, mod in ((Data, "torch_geometric.data.data"),
                     (BaseStorage, "torch_geometric.data.storage"),
                     (GlobalStorage, "torch_geometric.data.storage"),
                     (Mesh, "database.graph_creation"),
                     (MultiscaleMesh, "database.graph_creation")):
        cls.__module__ = mod
        cls.__qualname__ = cls.__name__
    tg_data_data.Data = tg_data.Data = tg.Data = Data
    tg_storage.BaseStorage = BaseStorage
    tg_storage.GlobalStorage = GlobalStorage
    tg.data = tg_data
    tg_data.data = tg_data_data
    tg_data.storage = tg_storage
    db_gc.Mesh = Mesh
    db_gc.MultiscaleMesh = MultiscaleMesh
    db.graph_creation = db_gc
    mods = {"torch_geometric": tg, "torch_geometric.data": tg_data,
            "torch_geometric.data.data": tg_data_data,
            "torch_geometric.data.storage": tg_storage,
            "database": db, "database.graph_creation": db_gc}
    sys.modules.update(mods)
    return mods, Data, MultiscaleMesh


def record_to_reference_data(rec, Data, MultiscaleMesh):
    """SimulationRecord -> reference ``Data`` with the exact attribute set,
    insertion order, and dtypes of ``convert_mesh_to_pyg`` with
    ``with_multiscale=True`` (reference database/graph_creation.py:1483-1582).
    """
    ms = rec.mesh
    data = Data()
    # multiscale pointers first (reference :1543-1546)
    data.node_ptr = torch.LongTensor(np.asarray(ms.node_ptr))
    data.edge_ptr = torch.LongTensor(np.asarray(ms.edge_ptr))
    data.intra_edge_ptr = torch.LongTensor(np.asarray(ms.intra_edge_ptr))
    data.intra_mesh_edge_index = torch.LongTensor(np.asarray(ms.intra_edge_index))
    # fields (reference :1558-1561)
    dem = np.concatenate([m.dem for m in ms.meshes])
    data.DEM = torch.FloatTensor(dem)
    data.WD = torch.FloatTensor(rec.wd)
    data.VX = torch.FloatTensor(rec.vx)
    data.VY = torch.FloatTensor(rec.vy)
    # graph attributes (reference :1566-1573)
    ei = np.concatenate(
        [m.dual_edge_index + ms.node_ptr[s] for s, m in enumerate(ms.meshes)],
        axis=1)
    data.edge_index = torch.LongTensor(ei)
    dist = np.concatenate([m.face_distance for m in ms.meshes])
    data.face_distance = torch.FloatTensor(dist)
    data.face_relative_distance = torch.FloatTensor(
        np.concatenate([m.face_relative_distance for m in ms.meshes]))
    data.edge_slope = ((data.DEM[data.edge_index][0]
                        - data.DEM[data.edge_index][1]) / data.face_distance)
    data.num_nodes = int(ms.num_nodes)
    data.area = torch.FloatTensor(np.concatenate([m.area for m in ms.meshes]))
    # the reference embeds its own mesh object (reference :1575)
    mesh_obj = MultiscaleMesh()
    mesh_obj.face_ptr = np.asarray(ms.node_ptr)
    mesh_obj.dual_edge_ptr = np.asarray(ms.edge_ptr)
    mesh_obj.intra_edge_ptr = np.asarray(ms.intra_edge_ptr)
    mesh_obj.face_x = np.concatenate([m.face_xy[:, 0] for m in ms.meshes])
    mesh_obj.face_y = np.concatenate([m.face_xy[:, 1] for m in ms.meshes])
    data.mesh = mesh_obj
    # boundary conditions (reference :1577-1582)
    g = ms.ghosts
    data.node_BC = torch.IntTensor(np.asarray(g.ghost_nodes, np.int32))
    data.edge_BC_length = torch.FloatTensor(np.asarray(g.edge_bc_length,
                                                       np.float32))
    series = rec.bc_per_length * np.asarray(g.edge_bc_length)[:, None]
    bc = np.stack([np.arange(series.shape[1], dtype=np.float32)[None, :]
                   .repeat(series.shape[0], 0), series], axis=1)
    data.BC = torch.FloatTensor(bc)          # [n_BC, 2, T]: (time, discharge)
    data.type_BC = torch.tensor(int(g.type_bc), dtype=torch.int)
    return data


def write_reference_dataset(path, records):
    """``save_database`` twin (reference database/graph_creation.py:1681-1703):
    installs the fake modules, dumps the list, removes the modules."""
    mods, Data, MultiscaleMesh = install_fake_pyg()
    try:
        dataset = [record_to_reference_data(r, Data, MultiscaleMesh)
                   for r in records]
        with open(path, "wb") as f:
            pickle.dump(dataset, f)
    finally:
        for m in mods:
            sys.modules.pop(m, None)
