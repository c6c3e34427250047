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
    # Always invoke make: the Makefile dependency on the .cpp sources makes it
    # a cheap no-op when current, and it rebuilds a stale pre-upgrade .so whose
    # symbol set may no longer match the bindings below.
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception as e:
        if not os.path.exists(_LIB_PATH):
            warnings.warn(f"native meshcore build failed ({e}); "
                          "using numpy fallbacks")
            return None
        warnings.warn(f"native meshcore rebuild failed ({e}); "
                      "trying the existing library")
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        _bind(lib)
    except (OSError, AttributeError) as e:
        # AttributeError = missing symbol (stale .so that survived a failed
        # rebuild): fall back to numpy rather than crash available().
        warnings.warn(f"native meshcore load failed ({e}); using numpy fallbacks")
        return None
    _lib = lib
    return _lib


def _bind(lib: ctypes.CDLL) -> None:
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
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.cdt_triangulate.restype = ctypes.c_int64
    lib.cdt_triangulate.argtypes = [
        f64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p, ctypes.c_int64]
    lib.laplacian_smooth.restype = None
    lib.laplacian_smooth.argtypes = [
        f64p, ctypes.c_int64, i64p, ctypes.c_int64, u8p, ctypes.c_int64]
    lib.refine_midpoint.restype = ctypes.c_int64
    lib.refine_midpoint.argtypes = [
        f64p, ctypes.c_int64, i64p, ctypes.c_int64, f64p, i64p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]


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


def cdt_triangulate(points: np.ndarray,
                    segments: Optional[np.ndarray] = None
                    ) -> Optional[np.ndarray]:
    """Constrained Delaunay triangulation (native/delaunay.cpp): the
    MeshKernel/Triangle replacement (reference graph_creation.py:456-528).
    Returns CCW triangles [n_tris, 3], or None when the native library is
    unavailable or the triangulation fails (callers fall back to Qhull)."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = len(pts)
    segs = (np.ascontiguousarray(segments, dtype=np.int64)
            if segments is not None and len(segments)
            else np.empty((0, 2), np.int64))
    cap = 4 * max(n, 4)
    tris = np.empty((cap, 3), np.int64)
    m = lib.cdt_triangulate(pts, n, segs.reshape(-1), len(segs),
                            tris.reshape(-1), cap)
    if m < 0:
        warnings.warn(f"cdt_triangulate failed (code {m}); using Qhull fallback")
        return None
    return tris[:m].copy()


def laplacian_smooth(points: np.ndarray, triangles: np.ndarray,
                     fixed: np.ndarray, iters: int = 3) -> np.ndarray:
    """Fixed-boundary Laplacian smoothing (MeshKernel orthogonalization
    analog). Returns smoothed points; numpy fallback when no native lib."""
    pts = np.array(points, dtype=np.float64, order="C")
    tris = np.ascontiguousarray(triangles, dtype=np.int64)
    fx = np.ascontiguousarray(fixed, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        lib.laplacian_smooth(pts, len(pts), tris.reshape(-1), len(tris),
                             fx, int(iters))
        return pts
    # numpy fallback: deduplicated neighbor means
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e = np.unique(np.sort(e, axis=1), axis=0)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    deg = np.bincount(src, minlength=len(pts)).astype(np.float64)
    free = (fx == 0) & (deg > 0)
    for _ in range(int(iters)):
        acc = np.zeros_like(pts)
        np.add.at(acc, src, pts[dst])
        mean = acc / np.maximum(deg, 1)[:, None]
        pts[free] = mean[free]
    return pts


def refine_midpoint(points: np.ndarray, triangles: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Red (4-way) midpoint refinement with deduplicated edge midpoints.
    Returns (new_points, new_triangles); numpy fallback when no native lib."""
    pts = np.ascontiguousarray(points, dtype=np.float64)
    tris = np.ascontiguousarray(triangles, dtype=np.int64)
    n, nt = len(pts), len(tris)
    lib = _load()
    if lib is not None:
        pts_out = np.empty((n + 3 * nt, 2), np.float64)
        tris_out = np.empty((4 * nt, 3), np.int64)
        np_out = np.zeros(1, np.int64)
        m = lib.refine_midpoint(pts, n, tris.reshape(-1), nt, pts_out,
                                tris_out.reshape(-1), np_out)
        return pts_out[:int(np_out[0])].copy(), tris_out[:m].copy()
    # numpy fallback
    e = np.sort(np.concatenate(
        [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]), axis=1)
    uniq, inv = np.unique(e, axis=0, return_inverse=True)
    mid_id = n + np.arange(len(uniq))
    new_pts = np.concatenate([pts, pts[uniq].mean(1)], 0)
    ab, bc, ca = (mid_id[inv[:nt]], mid_id[inv[nt:2 * nt]],
                  mid_id[inv[2 * nt:]])
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    new_tris = np.concatenate([
        np.stack([a, ab, ca], 1), np.stack([ab, b, bc], 1),
        np.stack([ca, bc, c], 1), np.stack([ab, bc, ca], 1)], 0)
    return new_pts, new_tris
