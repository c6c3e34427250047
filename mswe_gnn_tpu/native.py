"""ctypes bindings for the native mesh/graph core (native/meshcore.cpp).

Compiles the shared library on first use (cached next to the source) and
falls back to the pure-numpy implementations when no C++ toolchain is
available. All entry points mirror a numpy function elsewhere in the package
and are verified against it in tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmeshcore.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            warnings.warn(f"native meshcore build failed ({e}); using numpy fallbacks")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        warnings.warn(f"native meshcore load failed ({e}); using numpy fallbacks")
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.dual_graph_from_triangles.restype = ctypes.c_int64
    lib.dual_graph_from_triangles.argtypes = [
        i64p, ctypes.c_int64, i64p, i64p, i64p, i64p, u8p]
    lib.build_ell_table.restype = ctypes.c_int64
    lib.build_ell_table.argtypes = [
        i64p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.bfs_partition.restype = None
    lib.bfs_partition.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def dual_graph_from_triangles(cells: np.ndarray):
    """Triangle soup -> (edge_index [2, E], wall vertex pairs [E, 2],
    boundary_face flags [F]). Native when possible."""
    lib = _load()
    cells = np.ascontiguousarray(cells, dtype=np.int64)
    n = len(cells)
    if lib is None:
        return None
    cap = 6 * max(n, 1)
    src = np.empty(cap, np.int64)
    dst = np.empty(cap, np.int64)
    wa = np.empty(cap, np.int64)
    wb = np.empty(cap, np.int64)
    bnd = np.zeros(max(n, 1), np.uint8)
    e = lib.dual_graph_from_triangles(cells, n, src, dst, wa, wb, bnd)
    return (np.stack([src[:e], dst[:e]]), np.stack([wa[:e], wb[:e]], 1),
            bnd[:n].astype(bool))


def build_ell_table(dst: np.ndarray, edge_mask: np.ndarray, num_nodes: int,
                    round_to: int = 4) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native ELL table; returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    mask = np.ascontiguousarray(edge_mask, dtype=np.float32)
    max_deg = lib.build_ell_table(dst, mask, len(dst), num_nodes, 0, None, None)
    d = max(int(-(-max(max_deg, 1) // round_to) * round_to), round_to)
    table = np.zeros((num_nodes, d), np.int32)
    out_mask = np.zeros((num_nodes, d), np.float32)
    r = lib.build_ell_table(dst, mask, len(dst), num_nodes, d,
                            table.ctypes.data_as(ctypes.c_void_p),
                            out_mask.ctypes.data_as(ctypes.c_void_p))
    assert r >= 0
    return table, out_mask


def bfs_partition(edge_index: np.ndarray, num_nodes: int, n_parts: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Locality-preserving node partition; numpy BFS fallback."""
    lib = _load()
    src = np.ascontiguousarray(edge_index[0], dtype=np.int64)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int64)
    if lib is not None:
        owner = np.empty(num_nodes, np.int32)
        order = np.empty(num_nodes, np.int32)
        lib.bfs_partition(src, dst, len(src), num_nodes, n_parts, owner, order)
        return owner, order
    # numpy fallback: BFS order then contiguous blocks
    from collections import deque

    adj = [[] for _ in range(num_nodes)]
    for s, d in zip(src, dst):
        adj[s].append(d)
    order = np.full(num_nodes, -1, np.int32)
    nxt = 0
    for seed in range(num_nodes):
        if order[seed] != -1:
            continue
        order[seed] = nxt; nxt += 1
        q = deque([seed])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if order[v] == -1:
                    order[v] = nxt; nxt += 1
                    q.append(v)
    block = -(-num_nodes // n_parts)
    return (order // block).astype(np.int32), order
