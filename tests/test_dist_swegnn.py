"""Distributed (ring-halo) SWEGNN layer vs the single-device block layer.

The shard_map layer exchanges only boundary rows per hop; its per-row math is
identical to ``apply_swegnn_block``'s slot path, so outputs must match to
float tolerance on the virtual CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mswe_gnn_tpu.graph import build_edge_slot_table
from mswe_gnn_tpu.models.swegnn import (
    SWEGNNConfig, apply_swegnn_block, init_swegnn)
from mswe_gnn_tpu.parallel.dist_swegnn import (
    build_dist_slot_plan, make_dist_swegnn, slot_ea_per_part)
from mswe_gnn_tpu.parallel.sharding import make_mesh


def banded_graph(n, reach=2):
    """Locality graph: edges within +-reach — the shape a BFS-ordered mesh
    partition produces (remote neighbors only on ring-adjacent parts)."""
    src, dst = [], []
    for i in range(n):
        for d in range(1, reach + 1):
            if i + d < n:
                src += [i, i + d]
                dst += [i + d, i]
    ei = np.asarray([src, dst], np.int32)
    order = np.argsort(ei[1], kind="stable")
    return ei[:, order]


@pytest.mark.parametrize("with_grad,fe", [(True, 3), (False, 0)])
def test_dist_swegnn_matches_block(rng, with_grad, fe):
    n, f, parts = 64, 8, 4
    ei = banded_graph(n)
    e = ei.shape[1]
    emask = np.ones(e, np.float32)
    tab, tmask = build_edge_slot_table(ei, emask, n)

    cfg = SWEGNNConfig(static_node_features=f, dynamic_node_features=f,
                       edge_features=fe, K=3, normalize=True,
                       with_filter_matrix=True, with_gradient=with_grad,
                       mlp_layers=2, mlp_activation="prelu")
    params = init_swegnn(jax.random.PRNGKey(0), cfg)
    x_s = rng.normal(size=(n, f)).astype(np.float32)
    x_d = rng.normal(size=(n, f)).astype(np.float32)
    x_d[rng.random(n) > 0.6] = 0.0  # dry nodes: exercise the wet-front mask
    ea = rng.normal(size=(e, fe)).astype(np.float32) if fe else None

    src, dst = jnp.asarray(ei[0]), jnp.asarray(ei[1])
    want = np.asarray(apply_swegnn_block(
        params, cfg, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(x_s), jnp.asarray(x_d), src, dst,
        edge_attr=jnp.asarray(ea) if fe else None,
        agg_table=jnp.asarray(tab), agg_mask=jnp.asarray(tmask)))

    # node-id slot table (src per slot) for the distributed plan
    src_slots = np.asarray(jnp.take(src, tab))
    plan = build_dist_slot_plan(src_slots, tmask, n, parts)
    assert plan is not None
    if fe:
        ea_parts = slot_ea_per_part(ea, tab, tmask, parts)
    else:
        ea_parts = np.zeros((parts, n // parts, tab.shape[1], 0), np.float32)

    mesh = make_mesh(2, parts)
    layer = make_dist_swegnn(mesh, cfg)
    got = np.asarray(layer(
        params, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(plan["src_tab"]), jnp.asarray(plan["slot_mask"]),
        jnp.asarray(ea_parts), jnp.asarray(plan["send_next"]),
        jnp.asarray(plan["send_prev"])))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_dist_gnn_forward_matches_apply_gnn(rng):
    """Full distributed single-scale model vs the single-device forward."""
    from mswe_gnn_tpu.graph import GraphSpec, build_flood_graph
    from mswe_gnn_tpu.models.gnn import GNNConfig, apply_gnn, init_gnn
    from mswe_gnn_tpu.parallel.dist_swegnn import make_dist_gnn_forward

    n, parts, prev_t = 64, 4, 2
    ei = banded_graph(n)
    e = ei.shape[1]
    spec = GraphSpec(node_counts=(n,), edge_counts=(e,),
                     intra_edge_counts=(), num_bc=1)
    x_static = rng.normal(size=(n, 2)).astype(np.float32)
    x_dynamic = np.abs(rng.normal(size=(n, 2 * prev_t))).astype(np.float32)
    x_dynamic[rng.random(n) > 0.6] = 0.0
    ea = rng.normal(size=(e, 3)).astype(np.float32)
    graph = build_flood_graph(
        x_static=x_static, x_dynamic=x_dynamic, edge_index=ei, edge_attr=ea,
        spec=spec, raw_node_counts=(n,), raw_edge_counts=(e,),
        previous_t=prev_t)

    cfg = GNNConfig(num_node_features=2 + 2 * prev_t, num_edge_features=3,
                    hid_features=8, K=3, n_gnn_layers=2, mlp_layers=2,
                    with_WL=True, learned_residuals=True, previous_t=prev_t)
    params = init_gnn(jax.random.PRNGKey(1), cfg)
    want = np.asarray(apply_gnn(params, cfg, graph))

    src_slots = np.asarray(jnp.take(graph.src, graph.in_edge_table))
    plan = build_dist_slot_plan(src_slots, np.asarray(graph.in_edge_mask),
                                n, parts)
    assert plan is not None
    ea_parts = slot_ea_per_part(np.asarray(graph.edge_attr),
                                np.asarray(graph.in_edge_table),
                                np.asarray(graph.in_edge_mask), parts)
    mesh = make_mesh(2, parts)
    fwd = make_dist_gnn_forward(mesh, cfg)
    got = np.asarray(fwd(
        params, graph.x_static, graph.x_dynamic, graph.node_mask,
        jnp.asarray(plan["src_tab"]), jnp.asarray(plan["slot_mask"]),
        jnp.asarray(ea_parts), jnp.asarray(plan["send_next"]),
        jnp.asarray(plan["send_prev"])))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_plan_rejects_nonlocal(rng):
    n, parts = 64, 4
    src_slots = rng.integers(0, n, size=(n, 4)).astype(np.int32)
    mask = np.ones((n, 4), np.float32)
    assert build_dist_slot_plan(src_slots, mask, n, parts) is None
