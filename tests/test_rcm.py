"""RCM mesh reordering (data/meshing.py): band profile + attribute integrity."""
import numpy as np

from mswe_gnn_tpu.data.meshing import (grid_mesh, rcm_permutation,
                                       reorder_mesh)


def _bandwidth(num_faces, edge_index):
    return int(np.abs(edge_index[0] - edge_index[1]).max())


def test_rcm_is_a_permutation_and_cuts_bandwidth():
    rng = np.random.default_rng(0)
    # scrambled grid: worst-case ordering of a planar mesh
    mesh = grid_mesh(24, 24, 100.0, lambda x, y: 0 * x)
    scramble = rng.permutation(mesh.num_faces)
    scrambled = reorder_mesh(mesh, order=scramble)
    assert _bandwidth(mesh.num_faces, scrambled.dual_edge_index) > 200

    order = rcm_permutation(scrambled.num_faces, scrambled.dual_edge_index)
    assert sorted(order.tolist()) == list(range(scrambled.num_faces))
    fixed = reorder_mesh(scrambled)
    # RCM bandwidth of an nx x ny grid is O(min(nx, ny))
    assert _bandwidth(fixed.num_faces, fixed.dual_edge_index) <= 2 * 24 + 2


def test_reorder_mesh_preserves_edge_attributes():
    mesh = grid_mesh(10, 8, 50.0, lambda x, y: x * 0.01 + y * 0.02)
    out = reorder_mesh(mesh)
    # same multiset of directed edges identified by endpoint coordinates
    def edge_keys(m):
        a = m.face_xy[m.dual_edge_index[0]]
        b = m.face_xy[m.dual_edge_index[1]]
        return {(tuple(x), tuple(y)) for x, y in zip(a.tolist(), b.tolist())}

    assert edge_keys(mesh) == edge_keys(out)
    # destination-sorted invariant
    assert (np.diff(out.dual_edge_index[1]) >= 0).all()
    # per-edge derived attrs still consistent with the permuted coordinates
    rel = out.face_xy[out.dual_edge_index[1]] - out.face_xy[out.dual_edge_index[0]]
    np.testing.assert_allclose(out.face_relative_distance, rel, atol=1e-9)
    np.testing.assert_allclose(out.face_distance,
                               np.linalg.norm(rel, axis=1), atol=1e-9)
    d = out.dem[out.dual_edge_index[0]] - out.dem[out.dual_edge_index[1]]
    np.testing.assert_allclose(out.edge_slope, d / out.face_distance, atol=1e-9)
    # node attrs follow the permutation
    np.testing.assert_allclose(sorted(out.area), sorted(mesh.area))
    assert set(map(tuple, out.face_xy[out.boundary_faces].tolist())) == \
        set(map(tuple, mesh.face_xy[mesh.boundary_faces].tolist()))


def test_triangulated_hierarchy_is_band_plannable():
    """CDT insertion order is unbanded; after the built-in RCM pass the
    banded MXU hop kernel must be able to plan every scale."""
    from mswe_gnn_tpu.data.triangulate import triangulated_hierarchy
    from mswe_gnn_tpu.ops.band_hop import plan_band, TILE

    rng = np.random.default_rng(3)
    meshes = triangulated_hierarchy(rng, lambda x, y: 0 * x, num_scales=2,
                                    avg_radius=1500.0, target_edge=60.0)
    mesh = meshes[0]
    assert mesh.num_faces > 1500, "need a non-trivial mesh for this test"
    # emulate the ELL slot layout: per-node incoming sources, dst-sorted
    n_pad = -(-mesh.num_faces // TILE) * TILE
    d_max = 4
    src_ids = np.tile(np.arange(n_pad)[:, None], (1, d_max))
    mask = np.zeros((n_pad, d_max), np.float32)
    slot = np.zeros(mesh.num_faces, np.int64)
    for s, t in mesh.dual_edge_index.T:
        if slot[t] < d_max:
            src_ids[t, slot[t]] = s
            mask[t, slot[t]] = 1.0
            slot[t] += 1
    plan = plan_band(src_ids, mask, n_pad)
    assert plan is not None, "RCM-ordered triangulation must be band-limited"
    assert max(plan.ws) <= 1024
