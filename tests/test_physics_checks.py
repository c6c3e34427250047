"""Physics diagnostics the reference uses as implicit tests (SURVEY.md §4):
rotation invariance, receptive-field sufficiency, conservation bookkeeping."""
import jax
import numpy as np

from mswe_gnn_tpu.data.augment import rotate_record
from mswe_gnn_tpu.data.dataset import (
    fit_dataset_scalers, make_spec, process_record, to_temporal_samples,
)
from mswe_gnn_tpu.data.synthetic import generate_simulation_record
from mswe_gnn_tpu.models.msgnn import apply_msgnn
from mswe_gnn_tpu.utils.metrics import (
    get_sufficient_k_hops, get_sufficient_k_hops_per_scale,
)
from tests.test_rollout import make_model

SCALERS = {"area_scaler": "standard", "edge_length_scaler": "standard"}


def test_rotation_invariance_of_predictions():
    """With rotation-invariant features (area/DEM/edge_length), predictions
    on a rotated domain must be identical (reference main.ipynb invariance
    check, utils/dataset.py:640-668)."""
    rec = generate_simulation_record(5, nx=10, ny=10, num_scales=3,
                                     total_hours=5, substeps=2)
    rec_rot = rotate_record(rec, 37.0)
    scalers = fit_dataset_scalers([rec], SCALERS)
    outs = []
    for r in (rec, rec_rot):
        proc = process_record(r, scalers)
        spec = make_spec(r.mesh, len(r.mesh.ghosts.ghost_nodes), pad_multiple=8)
        g = to_temporal_samples(proc, spec, previous_t=2, rollout_steps=1)[2]
        cfg, params = make_model(g, K=2, hid=16)
        outs.append(np.asarray(apply_msgnn(params, cfg, g)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_sufficient_k_hops():
    rec = generate_simulation_record(1, nx=10, ny=10, num_scales=2,
                                     total_hours=8, substeps=4)
    mesh = rec.mesh
    # start from the first wet frame: the diagnostic assumes new wet cells
    # neighbor wet cells, which fails for the inflow's very first appearance
    t0 = int(np.argmax(rec.wd.max(0) > 0))
    wd = rec.wd[:, t0:]
    k = get_sufficient_k_hops(mesh.meshes[0].dual_edge_index,
                              wd[: mesh.meshes[0].num_faces])
    assert 0 <= k <= 50
    ks = get_sufficient_k_hops_per_scale(mesh.edge_index, wd,
                                         mesh.edge_ptr, mesh.node_ptr)
    assert len(ks) == 2
    # coarser scale needs fewer or equal hops (larger cells)
    assert ks[1] <= max(ks[0], 1) + 1


def test_synthetic_solver_mass_balance():
    """The synthetic ground truth itself approximately conserves mass:
    total stored volume ~= cumulative inflow."""
    rec = generate_simulation_record(4, nx=12, ny=12, num_scales=1,
                                     total_hours=12, substeps=30)
    mesh = rec.mesh.meshes[0]
    gh = rec.mesh.ghosts
    n_phys = mesh.num_faces - len(gh.ghost_nodes)
    area = mesh.area[:n_phys]
    stored = (rec.wd[:n_phys] * area[:, None]).sum(0)  # [T]
    inflow_rate = (rec.bc_per_length * gh.edge_bc_length[:, None]).sum(0)  # [T]
    dt = rec.temporal_res * 60.0
    cum_inflow = np.cumsum(inflow_rate) * dt
    # within 15% at the end (explicit solver + sampling)
    assert stored[-1] > 0
    np.testing.assert_allclose(stored[-1], cum_inflow[-1], rtol=0.15)


def test_bc_alignment_ground_truth_conserves_mass():
    """Regression for the zero-order-hold BC alignment (GENERATOR_VERSION 2,
    data/synthetic.py): on ground-truth transitions the conservation residual
    computed with ``bc_step_inflow`` must vanish at EVERY rollout step —
    including step 0, where a one-step-stale BC series makes the first wet
    frame structurally unpredictable (round 1 measured CSI(step 0) == 0 and a
    lagging wet front throughout the rollout)."""
    import jax.numpy as jnp

    from mswe_gnn_tpu.training.loss import conservation_residual
    from mswe_gnn_tpu.training.rollout import (
        bc_step_inflow, bc_window, inject_bc, shift_prediction,
    )

    rec = generate_simulation_record(7, nx=12, ny=12, num_scales=2,
                                     total_hours=10, substeps=40)
    scalers = fit_dataset_scalers([rec], SCALERS)
    proc = process_record(rec, scalers)
    spec = make_spec(rec.mesh, len(rec.mesh.ghosts.ghost_nodes), pad_multiple=8)
    g = to_temporal_samples(proc, spec, previous_t=2, rollout_steps=-1)[0]
    steps = int(g.y.shape[-1])
    x_dyn = g.x_dynamic
    worst, biggest_inflow = 0.0, 0.0
    for t in range(steps):
        x_inj = inject_bc(x_dyn, g, bc_window(g, jnp.asarray(t)))
        input_wd = x_inj[:, -2::2]                       # last h column [N,1]
        target = g.y[..., t]
        res = float(conservation_residual(
            target[:, :1], input_wd, g, bc_step_inflow(g, jnp.asarray(t))))
        inflow_1e6 = float(
            (bc_step_inflow(g, jnp.asarray(t)) * g.bc_edge_length
             * g.bc_mask).sum()) * 60.0 * float(g.temporal_res) / 1e6
        worst = max(worst, abs(res))
        biggest_inflow = max(biggest_inflow, inflow_1e6)
        # teacher-forced shift, exactly like pushforward training
        x_dyn = shift_prediction(x_inj, target, g.previous_t)
    assert biggest_inflow > 0.01, "degenerate hydrograph"
    # solver flux clipping loses a little mass; residual must be orders of
    # magnitude below the step inflow (a one-step-stale series gives ~100%)
    assert worst <= 0.02 * biggest_inflow, (worst, biggest_inflow)
