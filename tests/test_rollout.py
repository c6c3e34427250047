"""Rollout mechanics: BC injection, prediction shift, scan rollout vs a
step-by-step Python loop (reference training/train.py:67-95 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn
from mswe_gnn_tpu.training.rollout import (
    bc_midpoint, bc_window, inject_bc, rollout, shift_prediction,
)
from tests.test_models import make_samples


def make_model(g, K=2, hid=8):
    cfg = MSGNNConfig(num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
                      num_edge_features=g.edge_attr.shape[1], num_scales=3,
                      hid_features=hid, K=K, previous_t=g.previous_t,
                      learned_residuals=True, with_WL=True)
    return cfg, init_msgnn(jax.random.PRNGKey(0), cfg)


def test_inject_bc_only_touches_real_ghost_rows():
    samples, _ = make_samples()
    g = samples[0]
    x = g.x_dynamic
    window = jnp.ones((g.bc_nodes.shape[0], g.previous_t)) * 7.5
    out = np.asarray(inject_bc(x, g, window))
    bc = np.asarray(g.bc_nodes)
    mask = np.asarray(g.bc_mask)
    col = g.bc_kind - 1
    for i, node in enumerate(bc):
        if mask[i] > 0:
            assert np.all(out[node, col::2] == 7.5)
    # all non-ghost rows unchanged
    others = np.setdiff1d(np.arange(out.shape[0]), bc[mask > 0])
    np.testing.assert_array_equal(out[others], np.asarray(x)[others])


def test_shift_prediction():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(2, 6))
    pred = jnp.asarray([[100.0, 101.0], [200.0, 201.0]])
    out = np.asarray(shift_prediction(x, pred, previous_t=3))
    np.testing.assert_array_equal(out[:, :4], np.asarray(x)[:, 2:])
    np.testing.assert_array_equal(out[:, 4:], np.asarray(pred))
    out1 = np.asarray(shift_prediction(x[:, :2], pred, previous_t=1))
    np.testing.assert_array_equal(out1, np.asarray(pred))


def test_bc_window_and_midpoint():
    samples, _ = make_samples(rollout=4, previous_t=3)
    g = samples[0]
    bcv = np.asarray(g.bc_values)
    w0 = np.asarray(bc_window(g, jnp.asarray(0)))
    np.testing.assert_array_equal(w0, bcv[:, 0:3])
    mid = np.asarray(bc_midpoint(g, jnp.asarray(1)))
    np.testing.assert_allclose(mid, bcv[:, 2:4 + 1][:, 1:3].mean(1), rtol=1e-6)


def test_scan_rollout_matches_python_loop():
    samples, _ = make_samples(rollout=4)
    g = samples[0]
    cfg, params = make_model(g)
    got = np.asarray(rollout(apply_msgnn, params, cfg, g, steps=4))

    x = g.x_dynamic
    preds = []
    for t in range(4):
        x = inject_bc(x, g, bc_window(g, jnp.asarray(t)))
        p = apply_msgnn(params, cfg, g.replace(x_dynamic=x))
        x = shift_prediction(x, p, g.previous_t)
        preds.append(np.asarray(p))
    want = np.stack(preds, axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
