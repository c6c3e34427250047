"""Golden parity: reference .h5 checkpoints imported and run through the JAX
MSGNN must match the independent numpy oracle of the reference math
(SURVEY.md §4 parity gate, BASELINE.json validation contract)."""
import os

import jax
import numpy as np
import pytest

from mswe_gnn_tpu.compat.torch_import import (
    import_msgnn_params, infer_msgnn_shape, load_msgnn_checkpoint,
    load_state_dict, msgnn_config_from_checkpoint,
)
from mswe_gnn_tpu.data.dataset import (
    fit_dataset_scalers, make_spec, process_record, to_temporal_samples,
)
from mswe_gnn_tpu.data.synthetic import generate_simulation_record
from mswe_gnn_tpu.models.msgnn import apply_msgnn
from mswe_gnn_tpu.models.registry import count_params
from tests.oracle_msgnn import oracle_msgnn_forward

CKPT_DIR = "/root/reference/results/Pareto_front/models"
CKPT = os.path.join(CKPT_DIR, "K2_F16.h5")

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference checkpoints not mounted")


def test_infer_shape_from_checkpoint():
    sd = load_state_dict(CKPT)
    shape = infer_msgnn_shape(sd)
    assert shape["hid_features"] == 16
    assert shape["K"] == 2
    assert shape["num_scales"] == 4
    assert shape["previous_t"] == 3
    assert shape["mlp_layers"] == 3
    assert shape["learned_residuals"] is True


def test_import_param_count_matches_state_dict():
    cfg, sd = msgnn_config_from_checkpoint(CKPT)
    params = import_msgnn_params(sd, cfg)
    want = sum(v.size for v in sd.values())
    assert count_params(params) == want


@pytest.mark.parametrize("name", ["K2_F16.h5", "K4_F32.h5"])
def test_checkpoint_forward_matches_oracle(name):
    """Run imported reference weights through both the JAX model (padded) and
    the numpy reference-semantics oracle (unpadded) on a synthetic 4-scale
    mesh; outputs on real nodes must agree."""
    cfg, params = load_msgnn_checkpoint(os.path.join(CKPT_DIR, name))
    rec = generate_simulation_record(3, nx=16, ny=16, num_scales=cfg.num_scales,
                                     total_hours=6, substeps=4)
    scalers = fit_dataset_scalers([rec], {"area_scaler": "standard",
                                          "edge_length_scaler": "standard"})
    proc = process_record(rec, scalers)
    spec = make_spec(rec.mesh, len(rec.mesh.ghosts.ghost_nodes), pad_multiple=8)
    g = to_temporal_samples(proc, spec, previous_t=cfg.previous_t,
                            rollout_steps=2)[3]

    got_padded = np.asarray(apply_msgnn(params, cfg, g))

    # oracle on raw (unpadded) arrays
    mesh = rec.mesh
    t = 3  # sample index == init_time here
    p = cfg.previous_t
    wd = np.concatenate([np.zeros((proc.wd.shape[0], p - 1), np.float32), proc.wd], 1)
    q = np.concatenate([np.zeros((proc.q.shape[0], p - 1), np.float32), proc.q], 1)
    hist = np.empty((wd.shape[0], 2 * p), np.float32)
    hist[:, 0::2] = wd[:, t: t + p]
    hist[:, 1::2] = q[:, t: t + p]
    x_raw = np.concatenate([proc.x_static, hist], 1)
    want_raw = oracle_msgnn_forward(
        params, cfg, x_raw, mesh.edge_index, proc.edge_attr,
        mesh.node_ptr, mesh.edge_ptr, mesh.intra_edge_index, mesh.intra_edge_ptr)

    for s in range(cfg.num_scales):
        lo_p = g.spec.node_ptr[s]
        lo_r = mesh.node_ptr[s]
        n = mesh.meshes[s].num_faces
        np.testing.assert_allclose(
            got_padded[lo_p: lo_p + n], want_raw[lo_r: lo_r + n],
            rtol=5e-4, atol=5e-5,
            err_msg=f"scale {s} mismatch for {name}")
