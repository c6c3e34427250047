"""Native meshcore vs numpy reference implementations."""
import numpy as np
import pytest

from mswe_gnn_tpu import native
from mswe_gnn_tpu.graph import build_edge_slot_table

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain for native meshcore")


def test_dual_graph_matches_python(rng):
    from mswe_gnn_tpu.data.triangulate import (
        generate_polygon, mesh_from_triangulation, triangulate_polygon)
    from scipy.spatial import Delaunay

    pts = rng.random((60, 2)) * 100
    tri = Delaunay(pts)
    cells = tri.simplices.astype(np.int64)

    ei, walls, boundary = native.dual_graph_from_triangles(cells)
    mesh = mesh_from_triangulation(pts, cells, lambda x, y: np.zeros_like(x))

    want = set(map(tuple, mesh.dual_edge_index.T.tolist()))
    got = set(map(tuple, ei.T.tolist()))
    assert got == want
    assert set(np.where(boundary)[0]) == set(mesh.boundary_faces.tolist())
    # wall lengths match
    lens = {}
    for (s, d), (a, b) in zip(ei.T, walls):
        lens[(s, d)] = np.linalg.norm(pts[a] - pts[b])
    for (s, d), w in zip(mesh.dual_edge_index.T, mesh.shared_length):
        np.testing.assert_allclose(lens[(s, d)], w, rtol=1e-9)


def test_ell_table_matches_python(rng):
    n, e = 50, 200
    dst = rng.integers(0, n, e)
    src = rng.integers(0, n, e)
    mask = (rng.random(e) > 0.2).astype(np.float32)
    ei = np.stack([src, dst])
    t_py, m_py = build_edge_slot_table(ei, mask, n, round_to=4)
    t_c, m_c = native.build_ell_table(dst, mask, n, round_to=4)
    assert t_c.shape == t_py.shape
    np.testing.assert_array_equal(m_c, m_py)
    np.testing.assert_array_equal(t_c, t_py)


def test_bfs_partition_locality(rng):
    # 1D chain: contiguous partition must have exactly P-1 cut edges
    n, p = 64, 4
    src = np.concatenate([np.arange(n - 1), np.arange(1, n)])
    dst = np.concatenate([np.arange(1, n), np.arange(n - 1)])
    owner, order = native.bfs_partition(np.stack([src, dst]), n, p)
    assert owner.min() == 0 and owner.max() == p - 1
    np.testing.assert_array_equal(np.bincount(owner), [n // p] * p)
    cut = (owner[src] != owner[dst]).sum()
    assert cut == 2 * (p - 1)  # both directions of each cut wall
