"""Concat (disconnected-union) batching: structural invariants and exact
equivalence of model outputs and losses with per-graph computation."""
import jax
import jax.numpy as jnp
import numpy as np

from mswe_gnn_tpu.graph import concat_graphs, stack_graphs
from mswe_gnn_tpu.models.msgnn import apply_msgnn
from mswe_gnn_tpu.training.train import (
    Trainer, TrainerOptions, eval_step, make_optimizer, pushforward_loss,
    train_step,
)
from tests.test_models import make_samples
from tests.test_rollout import make_model


def test_concat_structure():
    samples, _ = make_samples(rollout=2)
    b = concat_graphs(samples[:3])
    s0 = samples[0].spec
    assert b.num_graphs == 3
    assert b.spec.node_counts == tuple(3 * c for c in s0.node_counts)
    assert b.x_static.shape[0] == 3 * samples[0].num_nodes
    # per-scale blocks hold the 3 graphs' sub-blocks back to back
    for s in range(s0.num_scales):
        tsl = b.spec.node_slice(s)
        n_s = s0.node_counts[s]
        for g in range(3):
            lo = tsl.start + g * n_s
            np.testing.assert_allclose(
                np.asarray(b.x_static[lo: lo + n_s]),
                np.asarray(samples[g].x_static[s0.node_slice(s)]))
    # per-scale dst stays sorted in the union
    for s in range(s0.num_scales):
        dst = np.asarray(b.edge_index[1, b.spec.edge_slice(s)])
        assert np.all(np.diff(dst) >= 0)


def test_concat_forward_equals_per_graph():
    samples, _ = make_samples(rollout=2)
    g_list = samples[:3]
    cfg, params = make_model(g_list[0], K=2, hid=16)
    union = concat_graphs(g_list)
    out_union = np.asarray(apply_msgnn(params, cfg, union))
    s0 = g_list[0].spec
    for gi, g in enumerate(g_list):
        out_single = np.asarray(apply_msgnn(params, cfg, g))
        for s in range(s0.num_scales):
            n_s = s0.node_counts[s]
            lo = union.spec.node_ptr[s] + gi * n_s
            np.testing.assert_allclose(
                out_union[lo: lo + n_s],
                out_single[s0.node_slice(s)], rtol=2e-4, atol=2e-5,
                err_msg=f"graph {gi} scale {s}")


def test_concat_forward_equals_per_graph_chunked_hop():
    """Force the chunked hop path (models/swegnn.py:_hop_chunks): production
    meshes trip it past ~120k union rows, far above test shapes, so the
    chunk target is lowered to make every scale block split. Covers the
    rebased-slot clip semantics (padding slots alias edge 0 and rebase
    negative for chunks > 0 — must clip, not NaN-fill)."""
    from mswe_gnn_tpu.models import swegnn as swegnn_mod

    samples, _ = make_samples(rollout=2)
    g_list = samples[:3]
    cfg, params = make_model(g_list[0], K=2, hid=16)
    union = concat_graphs(g_list)
    old = swegnn_mod.HOP_CHUNK_TARGET_ROWS
    swegnn_mod.HOP_CHUNK_TARGET_ROWS = 1   # every block splits per graph
    try:
        out_union = np.asarray(apply_msgnn(params, cfg, union))
    finally:
        swegnn_mod.HOP_CHUNK_TARGET_ROWS = old
    assert np.isfinite(out_union).all()
    s0 = g_list[0].spec
    for gi, g in enumerate(g_list):
        out_single = np.asarray(apply_msgnn(params, cfg, g))
        for s in range(s0.num_scales):
            n_s = s0.node_counts[s]
            lo = union.spec.node_ptr[s] + gi * n_s
            np.testing.assert_allclose(
                out_union[lo: lo + n_s],
                out_single[s0.node_slice(s)], rtol=2e-4, atol=2e-5,
                err_msg=f"graph {gi} scale {s} (chunked hop)")


def test_chunked_hop_gradients_match():
    """Gradients through the chunked hop (mode='clip' gathers) must equal
    the single-block path's: clipped padding-slot gathers backprop zeros
    (their flux mask kills the upstream cotangent)."""
    import jax

    from mswe_gnn_tpu.models import swegnn as swegnn_mod

    samples, _ = make_samples(rollout=2)
    g_list = samples[:3]
    cfg, params = make_model(g_list[0], K=2, hid=8)
    union = concat_graphs(g_list)
    opts = TrainerOptions(batch_size=3)

    def loss_fn(p):
        return pushforward_loss(apply_msgnn, p, cfg, union, 2, opts, True)

    g_ref = jax.grad(loss_fn)(params)
    old = swegnn_mod.HOP_CHUNK_TARGET_ROWS
    swegnn_mod.HOP_CHUNK_TARGET_ROWS = 1
    try:
        g_chunk = jax.grad(loss_fn)(params)
    finally:
        swegnn_mod.HOP_CHUNK_TARGET_ROWS = old
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_c = jax.tree_util.tree_leaves(g_chunk)
    for a, b in zip(flat_r, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_concat_loss_equals_vmap_loss():
    samples, _ = make_samples(rollout=2)
    g_list = samples[:4]
    cfg, params = make_model(g_list[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=4, conservation=0.01, velocity_scaler=3.0)
    l_vmap = float(pushforward_loss(apply_msgnn, params, cfg,
                                    stack_graphs(g_list), 2, opts, True))
    l_cat = float(pushforward_loss(apply_msgnn, params, cfg,
                                   concat_graphs(g_list), 2, opts, True))
    assert abs(l_vmap - l_cat) < 5e-4 * max(abs(l_vmap), 1.0), (l_vmap, l_cat)


def test_concat_train_and_eval_steps_run():
    samples, _ = make_samples(rollout=2)
    union = concat_graphs(samples[:4])
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=4, learning_rate=1e-2)
    optimizer = make_optimizer(opts, 1)
    opt_state = optimizer.init(params)
    params, opt_state, loss = train_step(params, opt_state, union,
                                         apply_fn=apply_msgnn, cfg=cfg,
                                         rollout_steps=2, opts=opts,
                                         multiscale=True, optimizer=optimizer)
    assert np.isfinite(float(loss))
    m = eval_step(params, union, apply_fn=apply_msgnn, cfg=cfg, steps=2,
                  opts=opts, multiscale=True)
    assert np.isfinite(float(m["val_loss"]))


def test_trainer_concat_layout():
    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_epochs=2, curriculum_epoch=1,
                          max_rollout_steps=2)
    tr = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:2],
                 batch_layout="concat")
    hist = tr.fit(max_epochs=2)
    assert np.isfinite(hist[-1]["train_loss"])
    assert "val_loss" in hist[-1]
