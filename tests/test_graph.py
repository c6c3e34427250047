"""FloodGraph container: padding, remapping, batching invariants."""
import jax
import jax.numpy as jnp
import numpy as np

from mswe_gnn_tpu.graph import FloodGraph, GraphSpec, build_flood_graph, stack_graphs


def tiny_graph(pad=8, n0=5, n1=3, e0=8, e1=4, ei0=5):
    spec = GraphSpec(node_counts=(pad, pad), edge_counts=(pad, pad),
                     intra_edge_counts=(pad,), num_bc=pad)
    rng = np.random.default_rng(1)
    x_s = rng.normal(size=(n0 + n1, 2)).astype(np.float32)
    x_d = rng.normal(size=(n0 + n1, 4)).astype(np.float32)
    ei = np.asarray([[0, 1, 2, 3, 4, 0, 1, 2, 5, 6, 7, 5],
                     [1, 2, 3, 4, 0, 2, 3, 4, 6, 7, 5, 7]])
    ea = rng.normal(size=(12, 1)).astype(np.float32)
    intra = np.asarray([[5, 5, 6, 6, 7], [0, 1, 2, 3, 4]])
    bc = np.asarray([0, 1])
    bcv = rng.random((2, 6)).astype(np.float32)
    return build_flood_graph(
        x_static=x_s, x_dynamic=x_d, edge_index=ei, edge_attr=ea, spec=spec,
        raw_node_counts=(n0, n1), raw_edge_counts=(e0, e1),
        intra_edge_index=intra, raw_intra_edge_counts=(ei0,),
        bc_nodes=bc, bc_values=bcv, bc_edge_length=np.ones(2),
        area=np.ones(n0 + n1), dem=np.zeros(n0 + n1),
        y=rng.normal(size=(n0 + n1, 2, 3)).astype(np.float32),
        previous_t=2, temporal_res=60.0)


def test_build_flood_graph_shapes_and_masks():
    g = tiny_graph()
    assert g.x_static.shape == (16, 2)
    assert g.edge_index.shape == (2, 16)
    assert float(g.node_mask.sum()) == 8  # 5 + 3 real nodes
    assert float(g.edge_mask.sum()) == 12
    assert float(g.intra_edge_mask.sum()) == 5
    assert float(g.bc_mask.sum()) == 2
    # scale-1 nodes remapped by padded offset: raw id 5 -> 8
    sl = g.spec.edge_slice(1)
    real = np.asarray(g.edge_index[:, sl])[:, :4]
    assert real.min() >= 8
    # per-scale dst sorted
    for s in range(2):
        dst = np.asarray(g.edge_index[1, g.spec.edge_slice(s)])
        assert np.all(np.diff(dst) >= 0)


def test_padded_node_features_zero():
    g = tiny_graph()
    xs = np.asarray(g.x_static)
    assert np.all(xs[5:8] == 0) and np.all(xs[11:] == 0)


def test_stack_graphs():
    g1, g2 = tiny_graph(), tiny_graph()
    b = stack_graphs([g1, g2])
    assert b.x_static.shape == (2, 16, 2)
    assert b.spec == g1.spec
    assert b.previous_t == 2
