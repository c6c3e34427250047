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


@pytest.mark.parametrize("width,with_grad,fe", [(2, True, 3), (3, True, 3),
                                                (2, False, 0)])
def test_wide_halo_matches_block(rng, width, with_grad, fe):
    """Width-W halo layer (one exchange per W hops, rings 1..W-1 re-computed
    locally) vs the single-device block layer — exact same per-row math."""
    from mswe_gnn_tpu.parallel.dist_swegnn import (
        build_wide_halo_plan, make_dist_swegnn_wide)

    n, f, parts = 64, 8, 4
    ei = banded_graph(n)
    e = ei.shape[1]
    emask = np.ones(e, np.float32)
    tab, tmask = build_edge_slot_table(ei, emask, n)

    cfg = SWEGNNConfig(static_node_features=f, dynamic_node_features=f,
                       edge_features=fe, K=5, normalize=True,
                       with_filter_matrix=True, with_gradient=with_grad,
                       mlp_layers=2, mlp_activation="prelu")
    params = init_swegnn(jax.random.PRNGKey(0), cfg)
    x_s = rng.normal(size=(n, f)).astype(np.float32)
    x_d = rng.normal(size=(n, f)).astype(np.float32)
    x_d[rng.random(n) > 0.6] = 0.0
    ea = rng.normal(size=(e, fe)).astype(np.float32) if fe else None

    src, dst = jnp.asarray(ei[0]), jnp.asarray(ei[1])
    want = np.asarray(apply_swegnn_block(
        params, cfg, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(x_s), jnp.asarray(x_d), src, dst,
        edge_attr=jnp.asarray(ea) if fe else None,
        agg_table=jnp.asarray(tab), agg_mask=jnp.asarray(tmask)))

    src_slots = np.asarray(jnp.take(src, tab))
    ea_slots_global = (ea[tab] * tmask[..., None]).astype(np.float32) \
        if fe else None
    plan = build_wide_halo_plan(src_slots, tmask, n, parts, width,
                                ea_slots_global=ea_slots_global)
    assert plan is not None
    B, H = plan["block"], plan["halo"]
    d_max = tab.shape[1]
    ea_local = (slot_ea_per_part(ea, tab, tmask, parts) if fe
                else np.zeros((parts, B, d_max, 0), np.float32))
    ea_ext = (plan["ext_ea"] if fe
              else np.zeros((parts, 2 * H, d_max, 0), np.float32))

    mesh = make_mesh(2, parts)
    layer = make_dist_swegnn_wide(mesh, cfg, width, plan["ring_ptr"], H)
    got = np.asarray(layer(
        params, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(plan["src_tab"]), jnp.asarray(plan["slot_mask"]),
        jnp.asarray(ea_local), jnp.asarray(plan["ext_tab"]),
        jnp.asarray(plan["ext_mask"]), jnp.asarray(ea_ext),
        jnp.asarray(plan["send_next"]), jnp.asarray(plan["send_prev"])))
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


@pytest.mark.parametrize("overlap,halo_width", [(False, 1), (True, 1),
                                                (False, 2)])
def test_dist_msgnn_forward_matches_apply_msgnn(rng, overlap, halo_width):
    """Distributed multiscale V-cycle (per-scale ring partitions, cross-scale
    pool/unpool halo plans) vs the single-device apply_msgnn. ``overlap=True``
    additionally packs halo references into trailing slots and aggregates
    interior slots while the exchange is in flight — identical numerics."""
    from mswe_gnn_tpu.graph import GraphSpec, build_flood_graph
    from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn
    from mswe_gnn_tpu.parallel.dist_swegnn import (
        build_dist_msgnn_inputs, make_dist_msgnn_forward)

    n0, n1, parts, prev_t = 64, 32, 4, 2
    ei0 = banded_graph(n0)
    ei1 = banded_graph(n1) + n0       # raw scale-major numbering
    ei = np.concatenate([ei0, ei1], axis=1)
    e0, e1 = ei0.shape[1], ei1.shape[1]
    # transfer edges: fine i -> coarse n0 + i//2, rows = (coarse, fine)
    fine = np.arange(n0)
    iei = np.stack([n0 + fine // 2, fine]).astype(np.int32)

    spec = GraphSpec(node_counts=(n0, n1), edge_counts=(e0, e1),
                     intra_edge_counts=(n0,), num_bc=1)
    x_static = rng.normal(size=(n0 + n1, 2)).astype(np.float32)
    x_dynamic = np.abs(rng.normal(size=(n0 + n1, 2 * prev_t))).astype(np.float32)
    x_dynamic[rng.random(n0 + n1) > 0.6] = 0.0
    ea = rng.normal(size=(e0 + e1, 3)).astype(np.float32)
    graph = build_flood_graph(
        x_static=x_static, x_dynamic=x_dynamic, edge_index=ei, edge_attr=ea,
        spec=spec, raw_node_counts=(n0, n1), raw_edge_counts=(e0, e1),
        intra_edge_index=iei, raw_intra_edge_counts=(n0,),
        previous_t=prev_t)

    cfg = MSGNNConfig(num_node_features=2 + 2 * prev_t, num_edge_features=3,
                      num_scales=2, hid_features=8, K=2, mlp_layers=2,
                      with_WL=True, learned_residuals=True, previous_t=prev_t,
                      skip_connections=True)
    params = init_msgnn(jax.random.PRNGKey(2), cfg)
    want = np.asarray(apply_msgnn(params, cfg, graph))

    dist = build_dist_msgnn_inputs(graph, parts, overlap=overlap,
                                   halo_width=halo_width)
    assert dist is not None
    n_int = dist.pop("overlap", None)
    n_int_pool = dist.pop("overlap_pool", None)
    n_int_unpool = dist.pop("overlap_unpool", None)
    wide_meta = dist.pop("wide_meta", None)
    if overlap:
        # the banded test graph has real halo references on every part, so
        # packing must leave at least one interior slot and one halo slot
        assert n_int is not None and 0 < n_int[0] < graph.in_edge_table.shape[1]
        assert n_int_pool is not None and n_int_unpool is not None
    if halo_width > 1:
        # the banded test graph's 2-hop closure stays ring-adjacent, so no
        # scale may silently fall back to per-hop exchanges
        assert wide_meta is not None and all(m[0] == halo_width
                                             for m in wide_meta)
    mesh = make_mesh(2, parts)
    fwd = make_dist_msgnn_forward(mesh, cfg, overlap=n_int,
                                  overlap_pool=n_int_pool,
                                  overlap_unpool=n_int_unpool,
                                  wide_meta=wide_meta)
    outs = fwd(params, dist)
    got = np.concatenate([np.asarray(o).reshape(-1, 2) for o in outs], axis=0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_reorder_and_dist_on_synthetic_mesh(rng):
    """BFS/barycentric reordering of a real synthetic multiscale mesh makes
    ring plans succeed; model output is permutation-consistent and the
    distributed forward matches the single-device one."""
    from mswe_gnn_tpu.data.dataset import (
        fit_dataset_scalers, make_spec, process_record, to_temporal_samples)
    from mswe_gnn_tpu.data.synthetic import generate_simulation_record
    from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn
    from mswe_gnn_tpu.parallel.dist_swegnn import (
        build_dist_msgnn_inputs, make_dist_msgnn_forward,
        reorder_graph_for_ring)

    parts = 4
    rec = generate_simulation_record(0, nx=16, ny=16, num_scales=2,
                                     total_hours=6, substeps=2)
    scalers = fit_dataset_scalers([rec], {"area_scaler": "standard",
                                          "edge_length_scaler": "standard"})
    proc = process_record(rec, scalers)
    spec = make_spec(rec.mesh, len(rec.mesh.ghosts.ghost_nodes),
                     pad_multiple=parts)
    g = to_temporal_samples(proc, spec, previous_t=2, rollout_steps=1)[0]

    cfg = MSGNNConfig(num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
                      num_edge_features=g.edge_attr.shape[1], num_scales=2,
                      hid_features=8, K=2, mlp_layers=2, with_WL=True,
                      learned_residuals=True, previous_t=2)
    params = init_msgnn(jax.random.PRNGKey(3), cfg)
    base = np.asarray(apply_msgnn(params, cfg, g))

    g2, perm = reorder_graph_for_ring(g, parts)
    re = np.asarray(apply_msgnn(params, cfg, g2))
    # permutation consistency: row perm[k] of the original = row k reordered
    np.testing.assert_allclose(re, base[perm], rtol=2e-5, atol=2e-6)

    dist = build_dist_msgnn_inputs(g2, parts)
    assert dist is not None, "ring plan must succeed after reordering"
    mesh = make_mesh(2, parts)
    fwd = make_dist_msgnn_forward(mesh, cfg)
    outs = fwd(params, dist)
    got = np.concatenate([np.asarray(o).reshape(-1, 2) for o in outs], axis=0)
    np.testing.assert_allclose(got, re, rtol=2e-5, atol=2e-6)


def test_plan_rejects_nonlocal(rng):
    n, parts = 64, 4
    src_slots = rng.integers(0, n, size=(n, 4)).astype(np.int32)
    mask = np.ones((n, 4), np.float32)
    assert build_dist_slot_plan(src_slots, mask, n, parts) is None
